"""Distributed linear kd-tree build — the Spark re-expression of the
reference's recursive in-place build (``lkt_create_mimd_codeless`` +
``lkt_sort_mimd``, nocuda.cpp:70-138).

Architecture (SURVEY.md §2.1-B4): instead of the reference's fork-join
recursion over an in-place array (``tbb::parallel_invoke`` +
``parallel_quicksort_partition``, nocuda.cpp:102-107 / quicksort.hh:480-534),
the build is **level-synchronous**: one aggregation shuffle per tree level
computes *all* of that level's split values at once, a broadcast join
reassigns every point to its child node as pure JVM column expressions
(whole-stage codegen, no Python in the loop), and the physical kd order is
realized exactly once at the end by ``repartitionByRange('sort_key') +
sortWithinPartitions`` — the distributed generalization of the reference's
parallel block-partition machinery (sample → range bounds → shuffle →
local sort), which it fully subsumes.

Scale design (100 TB / 10^12 rows):
- the split-table size is bounded by ``leaf_size`` (a node splits only while
  it holds > leaf_size points), NOT by depth — with leaf_size = 1e6 a
  10^12-point build yields ~1e6 split nodes (~50 MB collected/broadcast);
- the loop carries only ``(key, x, y, node, code, sk, path_len)``; payload
  columns are projected out by the caller and joined back by key;
- per level: exactly one shuffle (groupBy('node') with map-side partial
  aggregation) for the ``mean`` and ``median_approx`` strategies; the exact
  ``median`` strategy adds a window sort per level and targets
  fixture-exact small builds;
- levels optionally checkpoint to parquet + JSON manifest → resumable
  builds with per-level lineage metrics (north_rule).

The per-point ``code`` column is accumulated during the loop exactly per the
reference's semantics (bit = 1 ⇔ went left, LSB-first — lkt.cpp:140-157);
``sort_key`` is the monotone transform that linearizes the tree (bit = 0 ⇔
left, MSB-first, left-padded to max_depth bits — SURVEY.md §1.3).

Nondeterminism fixes vs the reference are deliberate canonical semantics
(SURVEY.md §4.4): heap node ids instead of allocation order
(fixlentree.hh:42,53), exact split values instead of physical-order-dependent
systematic samples (nocuda.cpp:30-34), order-independent assignment.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linear_kdtree_spark.oracle import MAX_DEPTH
from linear_kdtree_spark.operators.tree import SplitTree

SPLITS_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("axis", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("n_left", T.LongType(), False),
        T.StructField("n_right", T.LongType(), False),
        T.StructField("left_child", T.LongType(), False),
        T.StructField("right_child", T.LongType(), False),
    ]
)


@dataclass
class LktIndex:
    """The complete index — Spark analogue of ``linear_kdtree`` (lkt.h:25-32):
    the kd-ordered point DataFrame (``code`` + ``sort_key`` columns in place
    of the reference's parallel ``morton_codes`` array, lkt.h:31), the flat
    heap-ordered split DataFrame (analogue of ``fixlentree``,
    fixlentree.hh:20-81), and the broadcastable driver-side tree."""

    points: DataFrame  # key, x, y, node, path_len, code, sort_key
    splits: DataFrame
    tree: SplitTree
    lineage: list = field(default_factory=list)
    max_depth: int = MAX_DEPTH
    coord_type: str = "float"


def _split_stats(active: DataFrame, axis: str, strategy: str) -> DataFrame:
    """Per-node (split value, count, min, max) for one level — the
    distributed replacement of the reference's systematic-sample split
    heuristic (``lkt_find_splitpoint_x/_y``, nocuda.cpp:27-48)."""
    if strategy == "mean":
        return active.groupBy("node").agg(
            F.avg(axis).alias("sv"),
            F.count(F.lit(1)).alias("cnt"),
            F.min(axis).alias("mn"),
            F.max(axis).alias("mx"),
        )
    if strategy == "median":
        # canonical discrete upper median sorted[n // 2] — an actual data
        # value, bit-exact vs the serial oracle
        w = Window.partitionBy("node").orderBy(F.col(axis), "key")
        cw = Window.partitionBy("node")
        return (
            active.select("node", "key", axis)
            .withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(cw))
            .withColumn("mn", F.min(axis).over(cw))
            .withColumn("mx", F.max(axis).over(cw))
            .filter(F.col("rn") == (F.col("cnt") / 2).cast("long") + 1)
            .select(
                "node", F.col(axis).cast("double").alias("sv"), "cnt", "mn", "mx"
            )
        )
    if strategy == "median_approx":
        # scale path: one groupBy, mergeable Greenwald-Khanna sketch
        return active.groupBy("node").agg(
            F.percentile_approx(axis, 0.5, 10000).cast("double").alias("sv"),
            F.count(F.lit(1)).alias("cnt"),
            F.min(axis).alias("mn"),
            F.max(axis).alias("mx"),
        )
    raise ValueError(f"unknown split strategy: {strategy}")


def lkt_build(
    points: DataFrame,
    max_depth: int = MAX_DEPTH,
    strategy: str = "mean",
    leaf_size: int = 1,
    num_partitions: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 4,
    key_col: str = "key",
    x_col: str = "x",
    y_col: str = "y",
    coord_type: str = "float",
) -> LktIndex:
    """Build the index over a points DataFrame.

    ``coord_type``: 'float' is the canonical reference type (``ord_t``,
    lkt.h:13, compared bit-exactly in fixture tests); 'double' keeps full
    input precision (used where results must match a float64 oracle).

    ``points`` must carry (key_col, x_col, y_col); other columns are dropped
    (join them back by ``key``). Returns an :class:`LktIndex` whose
    ``points`` are range-partitioned and sorted by ``sort_key`` — the
    physical kd order of the reference's in-place array.
    """
    spark = points.sparkSession

    state = _load_manifest(checkpoint_dir) if checkpoint_dir else None
    split_rows: list[dict] = []
    lineage: list[dict] = []
    node_counts: dict[int, int] = {}
    start_depth = 0
    if state:
        split_rows = state["split_rows"]
        lineage = state["lineage"]
        node_counts = {int(k): v for k, v in state["node_counts"].items()}
        start_depth = state["next_depth"]
        pts = spark.read.parquet(state["points_path"])
    else:
        pts = points.select(
            F.col(key_col).cast("long").alias("key"),
            F.col(x_col).cast(coord_type).alias("x"),
            F.col(y_col).cast(coord_type).alias("y"),
            F.lit(0).cast("long").alias("node"),
            F.lit(0).cast("long").alias("code"),
            F.lit(0).cast("long").alias("sk"),
            F.lit(0).cast("int").alias("path_len"),
        )

    pts = pts.persist()
    min_split = max(2, leaf_size + 1)

    for depth in range(start_depth, max_depth):
        axis = "x" if depth % 2 == 0 else "y"
        level_lo = (1 << depth) - 1
        active = pts.filter(F.col("node") >= level_lo)
        stats = _split_stats(active, axis, strategy).collect()
        for r in stats:
            node_counts[int(r["node"])] = int(r["cnt"])

        splittable = []
        for r in stats:
            degenerate = (
                r["sv"] is None
                or not (r["sv"] > r["mn"])  # left side would be empty
                or not (r["sv"] <= r["mx"])  # right side would be empty
            )
            if r["cnt"] >= min_split and not degenerate:
                splittable.append((int(r["node"]), float(r["sv"])))
                split_rows.append(
                    {
                        "node_id": int(r["node"]),
                        "depth": depth,
                        "axis": depth % 2,
                        "value": float(r["sv"]),
                    }
                )
        lineage.append(
            {
                "depth": depth,
                "n_active_nodes": len(stats),
                "n_split_nodes": len(splittable),
                "n_active_points": int(sum(r["cnt"] for r in stats)),
                "max_node_points": int(max((r["cnt"] for r in stats), default=0)),
                "min_node_points": int(min((r["cnt"] for r in stats), default=0)),
            }
        )
        if not splittable:
            break

        sdf = spark.createDataFrame(splittable, "node long, sv double")
        joined = pts.join(F.broadcast(sdf), "node", "left")
        has = F.col("sv").isNotNull()
        left = F.col(axis).cast("double") < F.col("sv")
        right_bit = F.when(left, F.lit(0)).otherwise(F.lit(1))
        new_pts = joined.select(
            "key",
            "x",
            "y",
            F.when(has, F.col("node") * 2 + 1 + right_bit)
            .otherwise(F.col("node"))
            .alias("node"),
            F.when(has & left, F.col("code") + F.lit(1 << depth))
            .otherwise(F.col("code"))
            .alias("code"),
            F.when(has, F.col("sk") * 2 + right_bit).otherwise(F.col("sk")).alias("sk"),
            F.when(has, F.col("path_len") + 1)
            .otherwise(F.col("path_len"))
            .alias("path_len"),
        )
        prev = pts
        if checkpoint_dir and (depth + 1) % checkpoint_every == 0:
            pts = _checkpoint_level(
                spark, new_pts, checkpoint_dir, depth, split_rows, lineage, node_counts
            )
        else:
            # lazy localCheckpoint: persists AND truncates the logical plan
            # (a plain persist leaves d chained joins in the plan → O(d²)
            # analysis time across the loop); materialized by the next
            # level's stats action, so still one job per level
            pts = new_pts.localCheckpoint(eager=False)
        prev.unpersist()

    # child counts for split nodes at the deepest level (loop may have
    # ended at max_depth before their children were ever aggregated)
    missing = [
        r["node_id"]
        for r in split_rows
        if 2 * r["node_id"] + 1 not in node_counts
    ]
    if missing:
        lo = min((1 << (node_depth_py(m) + 1)) - 1 for m in missing)
        extra = (
            pts.filter(F.col("node") >= lo).groupBy("node").count().collect()
        )
        for r in extra:
            node_counts[int(r["node"])] = int(r["count"])

    for r in split_rows:
        r["n_left"] = node_counts.get(2 * r["node_id"] + 1, 0)
        r["n_right"] = node_counts.get(2 * r["node_id"] + 2, 0)

    tree = SplitTree.from_rows(split_rows, max_depth=max_depth)
    if not tree.total_points:
        tree.total_points = node_counts.get(0, 0)
    splits_df = spark.createDataFrame(
        [
            (
                r["node_id"], r["depth"], r["axis"], r["value"],
                r["n_left"], r["n_right"], r["left_child"], r["right_child"],
            )
            for r in tree.to_rows()
        ],
        SPLITS_SCHEMA,
    )

    out = pts.withColumn(
        "sort_key",
        (
            F.col("sk")
            * F.pow(F.lit(2.0), (F.lit(max_depth) - F.col("path_len")).cast("double")).cast("long")
        ).cast("long"),
    ).drop("sk")
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    out = out.repartitionByRange(n_parts, "sort_key", "key").sortWithinPartitions(
        "sort_key", "key"
    )
    return LktIndex(
        points=out,
        splits=splits_df,
        tree=tree,
        lineage=lineage,
        max_depth=max_depth,
        coord_type=coord_type,
    )


def node_depth_py(node_id: int) -> int:
    return (node_id + 1).bit_length() - 1


def _checkpoint_level(
    spark, new_pts, checkpoint_dir, depth, split_rows, lineage, node_counts
):
    path = os.path.join(checkpoint_dir, f"level_{depth:02d}")
    new_pts.write.mode("overwrite").parquet(path)
    manifest = {
        "next_depth": depth + 1,
        "points_path": path,
        "split_rows": split_rows,
        "lineage": lineage,
        "node_counts": {str(k): v for k, v in node_counts.items()},
    }
    tmp = os.path.join(checkpoint_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(checkpoint_dir, "manifest.json"))
    return spark.read.parquet(path).persist()


def _load_manifest(checkpoint_dir):
    p = os.path.join(checkpoint_dir, "manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None
