"""Streaming windowed aggregation ≡ static windowed aggregation over the
same events parquet (the streaming plan is the same logical plan)."""

import shutil

from pyspark.sql import functions as F

from linear_kdtree_spark.streaming.windows import (
    run_stream_once,
    windowed_event_counts,
)


def test_windowed_stream_equals_static(spark, tmp_path):
    src = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)
    schema = events.schema

    streamed = run_stream_once(
        spark, src, schema, query_name="win_test", window="10 minutes"
    )
    static = windowed_event_counts(
        spark.read.parquet(src), window="10 minutes"
    )
    s = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in streamed.collect()
    }
    t = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in static.collect()
    }
    assert s == t
    assert len(s) > 10
