"""Custom stateful streaming operator: cross-micro-batch exact
deduplication via ``applyInPandasWithState`` — the streaming twin of
``operators/dedup.exact_dedup`` for a training-data ingest pipeline
(documents arrive continuously; a duplicate must be flagged even when its
canonical copy arrived in an earlier micro-batch, which a per-batch
``foreachBatch`` dedup cannot do without re-reading the sink).

State per content-hash group: the canonical (first-seen minimum) doc id.
Arrow-batched per group — no per-row Python. At web scale the state store
holds one tiny row per distinct document hash; Spark's HDFS-backed state
store shards it by the group key across executors, and watermark-less
NoTimeout keeps hashes forever (bound it with a timeout if the stream is
unbounded in distinct content).

The reference has no streaming at all (SURVEY.md §2.4) — this is part of
the engine's beyond-reference pipeline surface (driver mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "doc_id long, content_hash string, canonical_id long, is_duplicate boolean"
)
STATE_SCHEMA = "canonical_id long"


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, content_hash, canonical_id, is_duplicate) per input row;
    canonical = FIRST-SEEN-WINS: the smallest id within the group's first
    micro-batch, kept for every later batch. A smaller id arriving later is
    flagged as a duplicate of the established canonical — append-mode
    output cannot retroactively rewrite rows already emitted, so lowering
    the stored canonical would only make later batches disagree with
    earlier ones (review r5). This is the one semantics a streaming dedup
    can keep consistent; batch ``exact_dedup`` over the full corpus yields
    the global-min canonical instead, and the two agree whenever each
    group's minimum id arrives in its first batch (how the differential
    test drives it). Same hash expression as exact_dedup (md5)."""
    import pandas as pd

    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )

    def update(key, pdfs, state):
        canonical = state.get[0] if state.exists else None
        # Drain every Arrow chunk BEFORE fixing the canonical: a group whose
        # first micro-batch spans multiple chunks must still get the
        # batch-wide min id (first-seen-wins applies across micro-batches,
        # not across Arrow chunks within one).
        chunks = [
            pdf["doc_id"].astype("int64") for pdf in pdfs if len(pdf) > 0
        ]
        if canonical is None and chunks:
            canonical = int(min(ids.min() for ids in chunks))
        frames = [
            pd.DataFrame(
                {
                    "doc_id": ids,
                    "content_hash": key[0],
                    "canonical_id": canonical,
                    "is_duplicate": ids != canonical,
                }
            )
            for ids in chunks
        ]
        if canonical is not None:
            state.update((canonical,))
        yield from frames

    return hashed.groupBy("content_hash").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout"
    )


def run_dedup_stream_once(
    spark,
    source_dir: str,
    schema,
    query_name: str = "stateful_dedup",
    max_files_per_trigger: int = 1,
    **kwargs,
) -> DataFrame:
    """Drive a parquet-directory stream to completion (one file per
    micro-batch so cross-batch state is actually exercised) and return the
    materialized result."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    out = streaming_exact_dedup(stream, **kwargs)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
