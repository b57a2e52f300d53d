"""Tighter scaling A/B than bench.py --scaling: repeat the core stages
(build / knn / pip) R times inside one JVM per parallelism level and report
per-stage minima (the noise floor on a shared host) plus medians.

Usage: python tools/scaling_study.py [amp] [reps]   (defaults 32, 3)
Writes one JSON line; BENCH/SCALING.md records the results.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time


def run_one(cpus: int, amp: int, reps: int) -> dict:
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from linear_kdtree_spark.entry import (
        KNN_K, KNN_QUERIES_SQL, load_views, points_df, rect_params,
    )
    from linear_kdtree_spark.operators.build import lkt_build
    from linear_kdtree_spark.operators.knn import knn
    from linear_kdtree_spark.operators.pip import Polygon, point_in_polygons
    from linear_kdtree_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    sf_dir = "/root/testdata/sf0.1"
    base = points_df(spark, sf_dir)
    reps_df = spark.range(amp).withColumnRenamed("id", "r")
    pts = (
        base.crossJoin(F.broadcast(reps_df))
        .select(
            (F.col("key") * amp + F.col("r")).alias("key"),
            (F.col("x") + (F.pmod((F.col("key") * amp + F.col("r")) * 69069,
                                  F.lit(2001)) - 1000) / 1.0e7).alias("x"),
            (F.col("y") + (F.pmod((F.col("key") * amp + F.col("r")) * 40503,
                                  F.lit(2001)) - 1000) / 1.0e7).alias("y"),
        )
        .repartition(cpus * 2)
        .persist()
    )
    n = pts.count()
    load_views(spark, sf_dir, ("documents",))
    queries = spark.sql(KNN_QUERIES_SQL).collect()
    qlist = [(int(r["query_id"]), float(r["qx"]), float(r["qy"])) for r in queries]
    polys = []
    for nk in range(25):
        cx, cy, hw, hh = rect_params(nk)
        polys.append(Polygon(nk, [(cx - hw, cy - hh), (cx + hw, cy - hh),
                                  (cx + hw, cy + hh), (cx - hw, cy + hh)]))

    stage_times: dict[str, list[float]] = {"build": [], "knn": [], "pip": []}
    for _ in range(reps):
        t0 = time.time()
        idx = lkt_build(pts, max_depth=24, strategy="mean", leaf_size=512,
                        num_partitions=cpus)
        idx.points = idx.points.persist()
        idx.points.count()
        stage_times["build"].append(time.time() - t0)

        t0 = time.time()
        knn(idx, qlist, KNN_K).count()
        stage_times["knn"].append(time.time() - t0)

        t0 = time.time()
        point_in_polygons(idx, polys, exact="convex").count()
        stage_times["pip"].append(time.time() - t0)

        idx.points.unpersist()

    spark.stop()
    out = {"cpus": cpus, "points": n}
    for k, v in stage_times.items():
        out[k] = {
            "min": round(min(v), 2),
            "median": round(statistics.median(v), 2),
            "all": [round(t, 2) for t in v],
        }
    core_min = sum(out[k]["min"] for k in ("build", "knn", "pip"))
    out["pps_min"] = round(n * 3 / core_min, 1)
    return out


def main() -> int:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if len(sys.argv) > 3 and sys.argv[3] == "--worker":
        print(json.dumps(run_one(int(sys.argv[4]), amp, reps)))
        return 0
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, str(amp), str(reps), "--worker", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    eff = round((results[32]["pps_min"] / results[8]["pps_min"]) / 4, 3)
    print(json.dumps({"scaling_efficiency_min": eff, "detail": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
