"""The driver-planned shuffle rests on an exact Python replica of Spark's
hash partitioning (functions/murmur.py) — these tests pin the hash to the
JVM and the token search to real partition placement."""

from pyspark.sql import functions as F

from linear_kdtree_spark.functions.murmur import (
    murmur3_hash_long,
    partition_tokens,
    verify_tokens,
)


def test_hash_long_matches_spark(spark):
    vals = [0, 1, 2, 42, -1, -42, 2**31, -(2**31), 2**62, -(2**62),
            123456789012345, -987654321098765]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    for r in rows:
        assert murmur3_hash_long(r["v"]) == r["h"], r["v"]


def test_partition_tokens_cover_all_slots():
    for n in (1, 2, 7, 32, 64):
        toks = partition_tokens(n)
        assert sorted(murmur3_hash_long(t) % n for t in toks) == list(range(n))


def test_verify_tokens_end_to_end(spark):
    assert verify_tokens(spark, partition_tokens(16))
