"""Exact k-nearest-neighbour lookup over an :class:`LktIndex`
(SURVEY.md §2.3-Q2 — the reference builds the index for exactly this kind
of workload but ships no query side; semantics follow from the split
invariant every node establishes: left subtree < value on its axis,
right ≥ value — reference nocuda.cpp:91-93).

Single-scan exact algorithm, all pruning expressed as ``sort_key`` range
predicates (Parquet/Iceberg min-max pruning + partition pruning apply):

  Bound (driver-side, no data scan): each query descends the broadcast
  tree to its leaf, walks up to the smallest ancestor holding ≥ k points
  (the seed node), and takes the far corner of the seed's exact data bbox
  — recorded by the build's own stats shuffle — as an upper bound r_q on
  the k-th distance: the ≥ k seed points all lie inside that bbox.

  Cover (the only data pass): every leaf region intersecting
  circle(q, r_q) is collected into merged sort_key intervals; one pruned
  scan + exact distance + per-query top-k window gives the exact answer.

This replaces the round-1 two-scan design (phase A ran a full candidate
scan + window just to measure the k-th distance, with a driver collect
between phases) with pure driver arithmetic + ONE scan.

Ties at equal distance break by ascending key (FIXTURES.md F5).

The query side is assumed small relative to the data (broadcastable);
the scan is a single broadcast range join against the point table —
no shuffle of the big side beyond the final per-query top-k aggregation,
which AQE handles. For huge query batches, split into chunks or use the
tile-join path (operators/spatial_join.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linear_kdtree_spark.functions.geometry import dist2
from linear_kdtree_spark.operators.build import LktIndex


def _candidates(points: DataFrame, ranges: list[tuple], schema: str,
                max_depth: int) -> DataFrame:
    """Bucketed equi interval join (operators/interval_join.py) of points ×
    query intervals on sort_key ∈ [lo, hi)."""
    from linear_kdtree_spark.operators.interval_join import interval_join

    return interval_join(points, ranges, schema, max_depth=max_depth)


def knn(
    index: LktIndex,
    queries: list[tuple[int, float, float]] | DataFrame,
    k: int,
) -> DataFrame:
    """queries: [(query_id, qx, qy), ...] or a DataFrame with those columns.
    Returns (query_id, key, dist2, rank) with rank 1..k."""
    spark = index.points.sparkSession
    if isinstance(queries, DataFrame):
        qrows = [
            (int(r["query_id"]), float(r["qx"]), float(r["qy"]))
            for r in queries.collect()
        ]
    else:
        qrows = [(int(q), float(x), float(y)) for q, x, y in queries]
    tree = index.tree
    total = tree.total_points
    if total == 0 or not qrows:
        return spark.createDataFrame(
            [], "query_id long, key long, dist2 double, rank int"
        )
    k_eff = min(k, total)
    pts = index.points.select("key", "x", "y", "sort_key")
    w = Window.partitionBy("query_id").orderBy("d2", "key")

    # ---- bound (driver-only): r_q² = far corner of the seed node's data
    # bbox; cover circle(q, r_q) with merged leaf intervals. Trees without
    # recorded bounds (reloaded bare splits) degrade to a full-range scan —
    # still exact, still one pass.
    full_range = (0, 1 << tree.max_depth)
    cover = []
    for qid, qx, qy in qrows:
        node = tree.knn_seed_node(qx, qy, k_eff)
        r2_q = tree.knn_r2_bound(qx, qy, node)
        ranges = (
            [full_range]
            if math.isinf(r2_q)
            else tree.ranges_for_circle(qx, qy, math.sqrt(r2_q))
        )
        for lo, hi in ranges:
            cover.append((qid, qx, qy, r2_q, lo, hi))
    cover_schema = "query_id long, qx double, qy double, r2 double, lo long, hi long"
    out = (
        _candidates(pts, cover, cover_schema, tree.max_depth)
        .withColumn("d2", dist2(F.col("x"), F.col("y"), F.col("qx"), F.col("qy")))
        .filter(F.col("d2") <= F.col("r2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_eff)
        .select(
            "query_id",
            "key",
            F.col("d2").alias("dist2"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
    return out
