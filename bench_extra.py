"""Extra instrumentation benches (guide §1.4): noop-sink isolation per
stage, build-phase breakdown, and knn bounds diagnostics. The frozen
driver bench stays in bench.py — numbers from here are cited in
OPTIMIZATION_r06.md only.

Usage:
  python bench_extra.py knn      # knn stage isolation + bounds diagnostics
  python bench_extra.py build    # build with SPARK_GRAFT_BUILD_DEBUG timing
  python bench_extra.py stages   # every bench stage, noop sink, reps
"""

from __future__ import annotations

import json
import os
import sys
import time


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def make_suite():
    from pyspark.sql import functions as F

    from linear_kdtree_spark.session import get_spark
    from linear_kdtree_spark.entry import (
        KNN_K, KNN_QUERIES_SQL, RADIUS, TILE_DEPTH, load_views, points_df,
        rect_params,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="lkt_bench_extra", shuffle_partitions=cpus)
    amp = int(os.environ.get("SPARK_GRAFT_BENCH_AMP", "8"))
    base = points_df(spark, sf_dir)
    reps = spark.range(amp).withColumnRenamed("id", "r")
    pts = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("key") * amp + F.col("r")).alias("key"),
            (F.col("x") + (F.pmod((F.col("key") * amp + F.col("r")) * 69069,
                                  F.lit(2001)) - 1000) / 1.0e7).alias("x"),
            (F.col("y") + (F.pmod((F.col("key") * amp + F.col("r")) * 40503,
                                  F.lit(2001)) - 1000) / 1.0e7).alias("y"),
        )
        .repartition(cpus * 2)
    )
    return spark, sf_dir, cpus, base, pts


def timed(name, fn, n=3):
    best = None
    for i in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        print(f"  {name} rep{i}: {dt:.3f}s", flush=True)
        best = dt if best is None else min(best, dt)
    print(f"{name} BEST: {best:.3f}s", flush=True)
    return best


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    from pyspark.sql import functions as F

    spark, sf_dir, cpus, base, pts = make_suite()
    from linear_kdtree_spark.entry import (
        KNN_K, KNN_QUERIES_SQL, RADIUS, TILE_DEPTH, load_views, rect_params,
    )
    from bench import _materialized_build

    pts = pts.persist()
    n_points = pts.count()
    print(f"points: {n_points}")

    if mode == "build":
        os.environ["SPARK_GRAFT_BUILD_DEBUG"] = "1"
        for i in range(int(os.environ.get("REPS", "3"))):
            t0 = time.time()
            idx = _materialized_build(pts, cpus, n_points)
            print(f"build rep{i}: {time.time() - t0:.3f}s")
            for lv in idx.lineage:
                print("   ", json.dumps(lv))
            idx.points.unpersist()
        return 0

    spark.sparkContext.setJobDescription("build index")
    idx = _materialized_build(pts, cpus, n_points)
    tree = idx.tree
    nb = tree.node_bounds or {}
    print(f"tree nodes: {len(tree.nodes)}, node_bounds: {len(nb)}, "
          f"total_points: {tree.total_points}")

    if mode in ("knn", "stages"):
        from linear_kdtree_spark.operators.knn import knn_batch

        load_views(spark, sf_dir, ("documents", "embeddings"))
        queries = spark.sql(KNN_QUERIES_SQL)
        # diagnostic: per-query seed bound and cover size
        import numpy as np
        from linear_kdtree_spark.operators.knn import (
            _cover_intervals, _seed_r2_bound,
        )
        qp = queries.toPandas()
        A = tree.to_query_arrays()
        r2 = _seed_r2_bound(qp.qx.to_numpy(), qp.qy.to_numpy(), A, KNN_K)
        qi, lo, hi = _cover_intervals(qp.qx.to_numpy(), qp.qy.to_numpy(), r2, A)
        frac = (hi - lo).sum() / float((1 << tree.max_depth) * len(qp))
        print(f"knn: {len(qp)} queries, finite r2: {np.isfinite(r2).sum()}, "
              f"cover intervals: {len(qi)}, covered key-frac: {frac:.6f}")
        spark.sparkContext.setJobDescription("knn_batch noop")
        timed("knn", lambda: noop(knn_batch(idx, queries, KNN_K)))

    if mode == "stages":
        from linear_kdtree_spark.operators.pip import Polygon, point_in_polygons
        from linear_kdtree_spark.operators.raster import rasterize
        from linear_kdtree_spark.operators.spatial_join import radius_join
        from linear_kdtree_spark.operators.dedup import lsh_candidate_pairs
        from linear_kdtree_spark.operators.similarity import brute_topk_cosine

        polys = []
        for nk in range(25):
            cx, cy, hw, hh = rect_params(nk)
            polys.append(Polygon(nk, [(cx - hw, cy - hh), (cx + hw, cy - hh),
                                      (cx + hw, cy + hh), (cx - hw, cy + hh)]))
        spark.sparkContext.setJobDescription("pip noop")
        timed("pip", lambda: noop(point_in_polygons(idx, polys, exact="convex")))
        spark.sparkContext.setJobDescription("tile_raster noop")
        timed("tile_raster", lambda: noop(rasterize(pts, TILE_DEPTH)))
        sub = base.filter("key % 31 < 2")
        spark.sparkContext.setJobDescription("radius_join noop")
        timed("radius_join",
              lambda: noop(radius_join(sub, sub, RADIUS, dedup_pairs=True)))
        docs = spark.table("documents")
        spark.sparkContext.setJobDescription("minhash noop")
        timed("minhash_lsh", lambda: noop(lsh_candidate_pairs(docs, 8, 4)))
        vecs = spark.table("embeddings")
        qv = vecs.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        spark.sparkContext.setJobDescription("ann_brute noop")
        timed("ann_brute", lambda: noop(brute_topk_cosine(vecs, qv, 3)))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
