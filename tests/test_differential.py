"""Differential tests: independent code paths inside the engine must agree
exactly — the strongest cheap correctness evidence after the DuckDB gates.

- fused hybrid build (mapInPandas local finish) ≡ pure level-synchronous
  build, per strategy and coord type — the fused path's global-id
  remapping and single-shuffle ordering are exactly equivalent;
- convex half-plane refine ≡ general ray-cast refine on convex polygons;
- driver-planned kNN ≡ distributed batch kNN (more configs than the
  targeted test in test_queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linear_kdtree_spark.operators.build import lkt_build


def _pts(spark, n, seed, clustered=True):
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.uniform(10, 90, (6, 2))
        which = rng.integers(0, 6, n)
        xy = centers[which] + rng.normal(0, 2.0, (n, 2))
    else:
        xy = rng.uniform(0, 100, (n, 2))
    return spark.createDataFrame(
        pd.DataFrame({"key": np.arange(n), "x": xy[:, 0], "y": xy[:, 1]})
    )


@pytest.mark.parametrize(
    "strategy,coord_type,leaf",
    [("mean", "double", 16), ("mean", "float", 8), ("median", "double", 32)],
)
def test_fused_build_equals_level_sync(spark, strategy, coord_type, leaf):
    pts = _pts(spark, 4000, seed=hash((strategy, leaf)) % 1000)
    a = lkt_build(pts, max_depth=10, strategy=strategy, leaf_size=leaf,
                  coord_type=coord_type)  # hybrid → fused local finish
    b = lkt_build(pts, max_depth=10, strategy=strategy, leaf_size=leaf,
                  coord_type=coord_type, local_threshold=0)  # pure level-sync
    cols = ["key", "node", "path_len", "code", "sort_key"]
    ra = sorted(tuple(r) for r in a.points.select(cols).collect())
    rb = sorted(tuple(r) for r in b.points.select(cols).collect())
    assert ra == rb
    sa = sorted(tuple(r) for r in a.splits.collect())
    sb = sorted(tuple(r) for r in b.splits.collect())
    assert len(sa) == len(sb)
    for x, y in zip(sa, sb):
        # (node_id, depth, axis, value, n_left, n_right, left, right)
        assert x[:3] == y[:3] and x[4:] == y[4:]
        if strategy == "median":
            # a median is an actual data value — bit-identical required
            assert x[3] == y[3]
        else:
            # mean split values may differ at the last ulp between numpy's
            # pairwise summation (local finish) and Spark's sequential
            # partial aggregation — the documented float-summation
            # nondeterminism class; topology and assignments must not
            assert x[3] == pytest.approx(y[3], rel=1e-12)
    # and the physical order is the same kd order in both paths
    oa = [r["key"] for r in a.points.select("key").collect()]
    ob = [r["key"] for r in b.points.select("key").collect()]
    assert oa == ob


def test_convex_refine_equals_raycast(spark):
    from linear_kdtree_spark.operators.pip import Polygon, point_in_polygons

    pts = _pts(spark, 6000, seed=3)
    idx = lkt_build(pts, max_depth=12, leaf_size=16, coord_type="double")
    def hull(points):
        # Andrew monotone chain — genuinely convex fixtures (sorted-angle
        # noisy circles are NOT convex; the convex path's contract demands
        # convexity, so the fixture must honor it)
        pts_sorted = sorted(map(tuple, points))

        def half(seq):
            out = []
            for p in seq:
                while len(out) >= 2 and (
                    (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                    - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                ) <= 0:
                    out.pop()
                out.append(p)
            return out

        lower, upper = half(pts_sorted), half(reversed(pts_sorted))
        return lower[:-1] + upper[:-1]

    rng = np.random.default_rng(4)
    polys = []
    for pid in range(8):
        cx, cy = rng.uniform(20, 80, 2)
        m = rng.integers(5, 12)
        cloud = np.column_stack(
            [cx + rng.uniform(-12, 12, m), cy + rng.uniform(-12, 12, m)]
        )
        polys.append(Polygon(pid, hull(cloud)))
    a = sorted(tuple(r) for r in
               point_in_polygons(idx, polys, exact="convex").collect())
    b = sorted(tuple(r) for r in
               point_in_polygons(idx, polys, exact="raycast").collect())
    # boundary points may differ between formulations at float ulps; the
    # fixture draws continuous coordinates, so exact equality is expected
    assert a == b
    assert len(a) > 50


def test_knn_batch_differential_configs(spark):
    from linear_kdtree_spark.operators.knn import knn, knn_batch

    pts = _pts(spark, 5000, seed=9, clustered=True)
    for k, leaf in [(1, 4), (12, 64)]:
        idx = lkt_build(pts, max_depth=12, leaf_size=leaf, coord_type="double")
        rng = np.random.default_rng(k)
        qs = [(i, float(a), float(b))
              for i, (a, b) in enumerate(rng.uniform(-10, 110, (30, 2)))]
        qdf = spark.createDataFrame(qs, "query_id long, qx double, qy double")
        a = sorted((r["query_id"], r["rank"], r["key"])
                   for r in knn(idx, qs, k).collect())
        b = sorted((r["query_id"], r["rank"], r["key"])
                   for r in knn_batch(idx, qdf, k).collect())
        assert a == b, (k, leaf)


def test_knn_auto_delegates_large_dataframe(spark):
    """DataFrame query batches above the threshold must route to the
    distributed knn_batch planner (plan shows MapInPandas, no driver
    collect) and still return identical results (VERDICT r2 wrong-#2)."""
    from linear_kdtree_spark.operators.knn import knn

    pts = _pts(spark, 2000, seed=13)
    idx = lkt_build(pts, max_depth=10, leaf_size=32, coord_type="double")
    rng = np.random.default_rng(2)
    qs = [(i, float(a), float(b))
          for i, (a, b) in enumerate(rng.uniform(-10, 110, (40, 2)))]
    qdf = spark.createDataFrame(qs, "query_id long, qx double, qy double")

    import linear_kdtree_spark.operators.knn as knn_mod

    calls = []
    orig = knn_mod.knn_batch
    knn_mod.knn_batch = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
    try:
        small = knn(idx, qdf, 3, delegate_threshold=100)  # driver path
        assert not calls
        big = knn(idx, qdf, 3, delegate_threshold=10)     # delegated path
        assert calls
    finally:
        knn_mod.knn_batch = orig
    a = sorted((r["query_id"], r["rank"], r["key"]) for r in small.collect())
    b = sorted((r["query_id"], r["rank"], r["key"]) for r in big.collect())
    assert a == b
