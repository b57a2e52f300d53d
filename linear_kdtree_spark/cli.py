"""spark-submit CLI — the engine's job entry point (north_rule:
"run via spark-submit --py-files").

Usage (local or cluster; zip the package for --py-files):

    zip -r engine.zip linear_kdtree_spark
    spark-submit --py-files engine.zip -m linear_kdtree_spark.cli <cmd> ...
    # or locally:
    python -m linear_kdtree_spark.cli build --input pts.parquet --output idx/

Commands
--------
build     points parquet (key, x, y) → kd index (points + splits + lineage)
extract   pages parquet (url, text, …) → points parquet
knn       index dir + queries parquet (query_id, qx, qy) → top-k parquet
pip       index dir + rectangles CSV "poly_id,xmin,ymin,xmax,ymax" → parquet
tile      points parquet → Z-order tile assignment parquet
bench     run the benchmark pipeline (same code path as bench.py)

The CLI mirrors the reference's single binary dispatch (main.cpp:446-463)
with subcommands replacing the numeric test selector.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(args):
    from linear_kdtree_spark.session import get_spark

    return get_spark(
        app_name=f"lkt_{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def cmd_build(args) -> int:
    from pyspark.sql import functions as F

    from linear_kdtree_spark.operators.build import lkt_build

    spark = _spark(args)
    pts = spark.read.parquet(args.input)
    ckpt = os.path.join(args.output, "checkpoints") if args.resumable else None
    if ckpt:
        os.makedirs(ckpt, exist_ok=True)
    idx = lkt_build(
        pts,
        max_depth=args.max_depth,
        strategy=args.strategy,
        leaf_size=args.leaf_size,
        checkpoint_dir=ckpt,
        coord_type=args.coord_type,
    )
    idx.points.write.mode("overwrite").parquet(os.path.join(args.output, "points"))
    idx.splits.write.mode("overwrite").parquet(os.path.join(args.output, "splits"))
    # per-node data bboxes power the kNN radius bound; without them a
    # reloaded index still answers exactly but plans full-range scans
    if idx.tree.node_bounds:
        spark.createDataFrame(
            [(n, *b) for n, b in idx.tree.node_bounds.items()],
            "node long, xmin double, xmax double, ymin double, ymax double",
        ).write.mode("overwrite").parquet(os.path.join(args.output, "bounds"))
    with open(os.path.join(args.output, "lineage.json"), "w") as f:
        json.dump(
            {"max_depth": idx.max_depth, "coord_type": idx.coord_type,
             "levels": idx.lineage},
            f, indent=2,
        )
    n = spark.read.parquet(os.path.join(args.output, "points")).count()
    print(json.dumps({"built_points": n, "splits": idx.splits.count()}))
    return 0


def _load_index(spark, index_dir: str):
    from linear_kdtree_spark.operators.build import LktIndex
    from linear_kdtree_spark.operators.tree import SplitTree

    with open(os.path.join(index_dir, "lineage.json")) as f:
        meta = json.load(f)
    points = spark.read.parquet(os.path.join(index_dir, "points"))
    splits = spark.read.parquet(os.path.join(index_dir, "splits"))
    tree = SplitTree.from_df(splits, max_depth=meta["max_depth"])
    if not tree.total_points:
        tree.total_points = points.count()
    bounds_path = os.path.join(index_dir, "bounds")
    if os.path.isdir(bounds_path):
        tree.node_bounds = {
            int(r["node"]): (r["xmin"], r["xmax"], r["ymin"], r["ymax"])
            for r in spark.read.parquet(bounds_path).collect()
        }
    return LktIndex(
        points=points, splits=splits, tree=tree,
        lineage=meta.get("levels", []), max_depth=meta["max_depth"],
        coord_type=meta.get("coord_type", "float"),
    )


def cmd_extract(args) -> int:
    from linear_kdtree_spark.sources.points import extract_points

    spark = _spark(args)
    pages = spark.read.parquet(args.input)
    out = extract_points(pages, coord_type=args.coord_type)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"extracted_points": spark.read.parquet(args.output).count()}))
    return 0


def cmd_knn(args) -> int:
    from linear_kdtree_spark.operators.knn import knn, knn_batch

    spark = _spark(args)
    idx = _load_index(spark, args.index)
    queries = spark.read.parquet(args.queries)
    if args.batch:
        out = knn_batch(idx, queries, args.k)
    else:
        out = knn(idx, queries, args.k)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"knn_rows": spark.read.parquet(args.output).count()}))
    return 0


def cmd_pip(args) -> int:
    from linear_kdtree_spark.operators.pip import Polygon, point_in_polygons

    spark = _spark(args)
    idx = _load_index(spark, args.index)
    polys = []
    with open(args.polygons) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            pid, xmin, ymin, xmax, ymax = line.split(",")
            pid = int(pid)
            x0, y0, x1, y1 = map(float, (xmin, ymin, xmax, ymax))
            polys.append(
                Polygon(pid, [(x0, y0), (x1, y0), (x1, y1), (x0, y1)])
            )
    out = point_in_polygons(idx, polys, exact="convex")
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"pip_rows": spark.read.parquet(args.output).count()}))
    return 0


def cmd_tile(args) -> int:
    from linear_kdtree_spark.operators.tile import (
        assign_tiles_hex,
        assign_tiles_morton,
        assign_tiles_s2,
    )

    spark = _spark(args)
    pts = spark.read.parquet(args.input)
    if args.mode == "s2":
        out = assign_tiles_s2(pts, args.level)
    elif args.mode == "hex":
        out = assign_tiles_hex(pts, args.res)
    else:
        out = assign_tiles_morton(pts, args.depth)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"tiled_rows": spark.read.parquet(args.output).count()}))
    return 0


def cmd_bench(args) -> int:
    # bench.py lives at the repo root, not inside the package, so under
    # the documented `spark-submit --py-files engine.zip` deployment a
    # bare import fails (review r5) — fall back to loading it from the
    # directory next to this package, and thread the parsed --master /
    # --shuffle-partitions through the env knobs bench actually reads.
    import os

    if args.master:
        os.environ["SPARK_GRAFT_MASTER"] = args.master
    if args.shuffle_partitions:
        # bench.py sizes BOTH the default master local[N] and the shuffle
        # partition count from SPARK_GRAFT_CPUS; pin the master to the
        # real core count first so a high --shuffle-partitions does not
        # silently start that many executor threads (ADVICE r5)
        if not args.master and not os.environ.get("SPARK_GRAFT_MASTER"):
            cpus = int(
                os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
            )
            os.environ["SPARK_GRAFT_MASTER"] = f"local[{cpus}]"
        os.environ["SPARK_GRAFT_CPUS"] = str(args.shuffle_partitions)
    try:
        import bench
    except ModuleNotFoundError:
        import importlib.util

        cand = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
        if not os.path.exists(cand):
            print(json.dumps({"error": "bench.py not found; run from the "
                              "repo root or ship it alongside the package"}))
            return 2
        spec = importlib.util.spec_from_file_location("bench", cand)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
    return bench.main()


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="linear_kdtree_spark")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--max-depth", type=int, default=24)
    b.add_argument("--strategy", default="mean",
                   choices=["mean", "median", "median_approx"])
    b.add_argument("--leaf-size", type=int, default=4096)
    b.add_argument("--coord-type", default="float", choices=["float", "double"])
    b.add_argument("--resumable", action="store_true")
    b.set_defaults(fn=cmd_build)

    e = sub.add_parser("extract")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--coord-type", default="float", choices=["float", "double"])
    e.set_defaults(fn=cmd_extract)

    k = sub.add_parser("knn")
    k.add_argument("--index", required=True)
    k.add_argument("--queries", required=True)
    k.add_argument("--output", required=True)
    k.add_argument("-k", type=int, default=5)
    k.add_argument("--batch", action="store_true",
                   help="fully-distributed planner for large query batches")
    k.set_defaults(fn=cmd_knn)

    q = sub.add_parser("pip")
    q.add_argument("--index", required=True)
    q.add_argument("--polygons", required=True, help="CSV: poly_id,xmin,ymin,xmax,ymax")
    q.add_argument("--output", required=True)
    q.set_defaults(fn=cmd_pip)

    t = sub.add_parser("tile")
    t.add_argument("--input", required=True)
    t.add_argument("--output", required=True)
    t.add_argument("--mode", default="morton", choices=["morton", "s2", "hex"])
    t.add_argument("--depth", type=int, default=8, help="morton grid depth")
    t.add_argument("--level", type=int, default=12, help="s2 cell level")
    t.add_argument("--res", type=int, default=7, help="aperture-7 hex res")
    t.set_defaults(fn=cmd_tile)

    bn = sub.add_parser("bench")
    bn.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
