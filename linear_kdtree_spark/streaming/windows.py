"""Structured-Streaming windowed aggregation over the events stream —
the engine's late-data-tolerant ingest metrics path (tile-level point
arrival rates feed the salting decisions in operators/spatial_join.py).

The reference has no streaming beyond the batch pipeline (SURVEY.md §2.4);
this is the idiomatic Spark expression of the same batch-of-batches
capability plus watermarked event-time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked sliding-window counts per group, plus a sum when
    ``value_col`` names a numeric column (None for count-only frames —
    the column was previously hardcoded, failing any schema without one
    literally named 'value'). Works on both a streaming DataFrame
    (readStream) and a static one (same plan)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    # testdata timestamps are TIMESTAMP_NTZ; watermarks require TIMESTAMP
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return src.groupBy(w.alias("win"), group_col).agg(*aggs)


def run_stream_once(
    spark,
    source_dir: str,
    schema,
    query_name: str = "windowed_events",
    **kwargs,
) -> DataFrame:
    """Drive a parquet-directory stream to completion synchronously
    (availableNow + memory sink) and return the materialized result."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream, **kwargs)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
