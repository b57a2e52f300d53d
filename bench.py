"""Headline benchmark: lkt build + query throughput on the synthetic
web-style skewed point set derived from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1 → 600 k points from lineitem rows).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "points": N,
   "build_knn_pip_points_per_sec": ...}

Scaling protocol (BASELINE.md): `python bench.py --scaling` runs the same
suite in two fresh JVMs at local[8] and local[32] and reports throughput at
both plus efficiency = (T8/T32)/4 — the sandbox proxy for the north_rule's
N → 4N executor scaling target (≥ 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_suite(sf_dir: str, cpus: int, reps: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from linear_kdtree_spark.session import get_spark
    from linear_kdtree_spark.entry import (
        KNN_K,
        KNN_QUERIES_SQL,
        RADIUS,
        TILE_DEPTH,
        load_views,
        points_df,
        rect_params,
    )
    from linear_kdtree_spark.operators.build import lkt_build
    from linear_kdtree_spark.operators.knn import knn_batch
    from linear_kdtree_spark.operators.pip import Polygon, point_in_polygons
    from linear_kdtree_spark.operators.raster import rasterize
    from linear_kdtree_spark.operators.spatial_join import radius_join
    from linear_kdtree_spark.operators.dedup import lsh_candidate_pairs
    from linear_kdtree_spark.operators.similarity import brute_topk_cosine

    # SPARK_GRAFT_MASTER overrides the thread-local master — the cluster
    # scaling mode sets local-cluster[n,c,m] (real separate executor JVMs)
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    spark = get_spark(
        app_name="lkt_bench",
        master=master,
        shuffle_partitions=cpus,
    )
    timings: dict[str, float] = {}
    # best-of-N per stage: single shots on this shared host vary ±50 %
    # (BENCH/SCALING.md; re-measured r3: same build 2.1-17.8 s across 3
    # consecutive reps) — the per-stage minimum is the noise floor and the
    # honest per-stage cost. Default 6: a fresh JVM takes 2-3 build reps
    # to reach its floor on this host (measured r5, idle box: consecutive
    # build reps 69.9 / 154.8 / 32.5 / 10.5 / 10.3 / 8.2 s — codegen +
    # python-worker spawn + first-touch pages amortize over the first
    # reps), so best-of-3 from cold records the warm-up tail, not the
    # engine (that is exactly how BENCH_r04 recorded build 19.2 s against
    # a 9.5 s floor). reps=1 keeps single-shot behavior.
    n_reps = reps or int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "6"))

    def timed(name: str, fn, cleanup=None, stage_reps: int | None = None):
        best, out = None, None
        for i in range(stage_reps or n_reps):
            if cleanup is not None and out is not None:
                cleanup(out)
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # deterministic ×AMP amplification: replicate each base point with a
    # per-replica jitter (≤ 1e-4°, keeps the cluster structure). The sf0.1
    # base (600 k) is too small to exercise 32 cores — per-level fixed costs
    # dominate and scaling measurements invert.
    amp = int(os.environ.get("SPARK_GRAFT_BENCH_AMP", "8"))
    base = points_df(spark, sf_dir)
    reps = spark.range(amp).withColumnRenamed("id", "r")
    pts = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("key") * amp + F.col("r")).alias("key"),
            (
                F.col("x")
                + (F.pmod((F.col("key") * amp + F.col("r")) * 69069, F.lit(2001)) - 1000)
                / 1.0e7
            ).alias("x"),
            (
                F.col("y")
                + (F.pmod((F.col("key") * amp + F.col("r")) * 40503, F.lit(2001)) - 1000)
                / 1.0e7
            ).alias("y"),
        )
        .repartition(cpus * 2)
    )
    # best-of-reps like every other stage (r4 verdict: single-rep had no
    # noise floor by construction); unpersist between reps so each rep
    # pays the real scan+amplify+persist cost, last rep leaves it cached
    n_points = timed(
        "load_points",
        lambda: pts.persist().count(),
        cleanup=lambda _: pts.unpersist(blocking=True),
    )

    idx = timed(
        "build",
        lambda: _materialized_build(pts, cpus, n_points),
        cleanup=lambda i: i.points.unpersist(),
    )

    load_views(spark, sf_dir, ("documents", "embeddings"))
    queries = spark.sql(KNN_QUERIES_SQL)
    # knn_batch: identical result to knn() (tests/test_differential.py),
    # but the per-query planning runs inside ONE mapInPandas stage against
    # broadcast flat-tree arrays instead of a driver loop — the per-job
    # fixed cost the 40-query leg pays does not multiply with queries,
    # and the leg scales with the scan like the rest of the suite
    # (VERDICT r3 next-#2)
    timed("knn", lambda: knn_batch(idx, queries, KNN_K).count())

    polys = []
    for nk in range(25):
        cx, cy, hw, hh = rect_params(nk)
        polys.append(Polygon(nk, [(cx - hw, cy - hh), (cx + hw, cy - hh),
                                  (cx + hw, cy + hh), (cx - hw, cy + hh)]))
    timed("pip", lambda: point_in_polygons(idx, polys, exact="convex").count())

    timed(
        "tile_raster",
        lambda: rasterize(pts, TILE_DEPTH).count(),
    )
    # radius join on the unamplified base sample (amplified replicas sit
    # ~1e-4° apart — a radius join over them measures pair explosion, not
    # join throughput)
    sub = base.filter("key % 31 < 2")
    timed("radius_join", lambda: radius_join(sub, sub, RADIUS, dedup_pairs=True).count())

    docs = spark.table("documents")
    timed("minhash_lsh", lambda: lsh_candidate_pairs(docs, 8, 4).count())
    vecs = spark.table("embeddings")
    qv = vecs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    timed("ann_brute", lambda: brute_topk_cosine(vecs, qv, 3).count())

    total = round(sum(timings.values()) - timings["load_points"], 3)
    core = timings["build"] + timings["knn"] + timings["pip"]
    result = {
        "metric": "lkt build + kNN/PIP query throughput (points/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "points": n_points,
        "cpus": cpus,
        "master": master,
        "amp": amp,
        "reps": n_reps,
        "protocol": "per-stage best-of-reps minima (co-tenant noise floor)",
        "build_knn_pip_points_per_sec": round(n_points * 3 / core, 1),
    }
    spark.stop()
    return result


def _materialized_build(pts, cpus: int, n_points: int):
    from linear_kdtree_spark.operators.build import lkt_build

    # hand off to the fused local finish at ~n/8 per subtree: with the
    # O(n·depth) local builder and exact count-based packing (r3), fewer
    # distributed levels beats more python parallelism — measured best-of-3
    # at local[32]: 4.8 M: 12.4 s (n/20) → 7.6 s (n/8); 19.2 M: 47.3 →
    # 20.3 s. Capped at 4 M so a group always fits one task's pandas
    # memory (the rule a real cluster would use; beyond ~n/4 the few huge
    # subtrees starve the cores — 2.4 M threshold at 4.8 M regressed)
    threshold = max(200_000, min(n_points // 8, 4_000_000))
    idx = lkt_build(
        pts, max_depth=24, strategy="mean", leaf_size=512, num_partitions=cpus,
        local_threshold=threshold,
    )
    idx.points = idx.points.persist()
    idx.points.count()
    return idx


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    if "--scaling-cluster" in argv:
        # REAL multi-executor scaling: local-cluster[n,c,m] spawns n
        # SEPARATE executor JVMs (own heap, netty shuffle service, own
        # Arrow python workers; the package ships as a zip via addPyFile,
        # the spark-submit --py-files path) — the sandbox's closest
        # realization of the north rule's "N and 4N executors". Default
        # pair: 1 executor vs 4 executors, 2 cores each.
        exec_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MB", "8192"))
        cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "2"))
        base_n = int(os.environ.get("SPARK_GRAFT_SCALING_BASE_EXECUTORS", "1"))
        pair = (base_n, base_n * 4)
        results = {}
        for n_exec in pair:
            env = dict(
                os.environ,
                SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},{cores},{exec_mb}]",
                SPARK_GRAFT_CPUS=str(n_exec * cores),
            )
            env.setdefault("SPARK_GRAFT_BENCH_REPS", "3")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            )
            results[n_exec] = json.loads(out.stdout.strip().splitlines()[-1])
        t_lo = results[pair[0]]["build_knn_pip_points_per_sec"]
        t_hi = results[pair[1]]["build_knn_pip_points_per_sec"]
        print(json.dumps({
            "mode": "cluster",
            "executors_pair": list(pair),
            "cores_per_executor": cores,
            "executor_mb": exec_mb,
            f"throughput_{pair[0]}exec_pps": t_lo,
            f"throughput_{pair[1]}exec_pps": t_hi,
            "scaling_efficiency": round((t_hi / t_lo) / 4, 3),
            "detail": results,
        }))
        return 0

    if "--scaling" in argv or "--scaling-weak" in argv:
        # strong scaling: identical input at local[8] vs local[32].
        # weak scaling (--scaling-weak): input ∝ cores (amp 8 → 32), the
        # second lens from BENCH/SCALING.md — per-core load held fixed, as
        # when a 4× cluster ingests 4× data.
        weak = "--scaling-weak" in argv
        base_amp = int(os.environ.get("SPARK_GRAFT_BENCH_AMP", "8"))
        # the N → 4N pair; default 8 → 32. SPARK_GRAFT_SCALING_BASE=2 or 4
        # measures 2→8 / 4→16 — the north rule fixes the RATIO (4×), not N,
        # and on a single shared-memory box the 8→32 pair is confounded by
        # memory-bus saturation (BENCH/SCALING.md substrate control), so
        # the smaller pairs are the honest sandbox proxy for adding
        # EXECUTORS (which add memory channels along with cores).
        base = int(os.environ.get("SPARK_GRAFT_SCALING_BASE", "8"))
        pair = (base, base * 4)
        results = {}
        for c in pair:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
            env.setdefault("SPARK_GRAFT_BENCH_REPS", "3")
            if weak:
                env["SPARK_GRAFT_BENCH_AMP"] = str(base_amp * c // base)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            )
            results[c] = json.loads(out.stdout.strip().splitlines()[-1])
        t_lo = results[pair[0]]["build_knn_pip_points_per_sec"]
        t_hi = results[pair[1]]["build_knn_pip_points_per_sec"]
        # strong: ideal = 4× throughput on the same input. weak: ideal =
        # 4× throughput on 4× input (equal wall-clock), same formula.
        print(json.dumps({
            "mode": "weak" if weak else "strong",
            "pair": list(pair),
            f"throughput_local{pair[0]}_pps": t_lo,
            f"throughput_local{pair[1]}_pps": t_hi,
            # legacy keys so older tooling keeps parsing the default pair
            "throughput_local8_pps": t_lo,
            "throughput_local32_pps": t_hi,
            "scaling_efficiency": round((t_hi / t_lo) / 4, 3),
            "detail": results,
        }))
        return 0

    if "--cpus" in argv:
        cpus = int(argv[argv.index("--cpus") + 1])
    print(json.dumps(run_suite(sf_dir, cpus)))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
