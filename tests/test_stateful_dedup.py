"""Cross-micro-batch stateful streaming dedup (applyInPandasWithState)
must equal the static exact_dedup when canonical copies arrive in the
earliest batch, and must flag duplicates whose canonical arrived in a
PREVIOUS micro-batch (the case per-batch dedup cannot catch)."""

import time

from pyspark.sql import functions as F

from linear_kdtree_spark.operators.dedup import exact_dedup
from linear_kdtree_spark.streaming.stateful_dedup import run_dedup_stream_once


def test_streaming_dedup_cross_batch(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select("doc_id", "text").limit(200).cache()
    dups = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    src = str(tmp_path / "stream_src")
    # batch 0: originals; batch 1 (later mtime): duplicates — one file per
    # micro-batch, so every duplicate's canonical lives in an EARLIER batch
    base.coalesce(1).write.parquet(src + "/b0")
    time.sleep(1.1)
    dups.coalesce(1).write.parquet(src + "/b1")
    import glob, shutil, os

    os.makedirs(src + "/in", exist_ok=True)
    for i, part in enumerate(
        sorted(glob.glob(src + "/b0/part-*.parquet"))
        + sorted(glob.glob(src + "/b1/part-*.parquet"))
    ):
        shutil.copy(part, src + f"/in/{i:02d}.parquet")
        os.utime(src + f"/in/{i:02d}.parquet", (time.time() + i, time.time() + i))

    schema = base.schema
    got = run_dedup_stream_once(spark, src + "/in", schema,
                                query_name="dedup_x").collect()
    got_map = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"]) for r in got}

    static = exact_dedup(base.unionByName(dups)).collect()
    want_map = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"]) for r in static}

    assert len(got_map) == len(want_map)
    assert got_map == want_map
    # the cross-batch property specifically: every +1M copy is a duplicate
    # of a doc from the earlier batch
    assert all(got_map[d][1] for d in got_map if d >= 1000000)
    assert any(d >= 1000000 for d in got_map)
