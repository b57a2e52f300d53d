"""Substrate-isolation control for the scaling study (BENCH/SCALING.md):
a shuffle-free, coordination-free, embarrassingly parallel numpy workload
(S2 cell assignment over synthetic points) run at two thread counts in
plain multiprocessing — NO Spark. Whatever speedup THIS job achieves from
N to 4N processes is the single-box memory-bandwidth ceiling: no Spark
operator restructuring can scale better than a workload with zero
coordination on the same substrate.

Usage: python tools/substrate_control.py [n_points_millions] [base_procs]
Prints one JSON line with per-config best-of-3 and the ceiling ratio.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


BLOCK = 200_000  # fixed per-task block so per-process memory behavior
# (allocation sizes, cache footprint) is IDENTICAL at every process count
# — only the degree of parallelism varies


def _chunk(seed):
    sys.path.insert(0, ".")
    from linear_kdtree_spark.functions.s2 import latlng_to_cell_id

    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89, 89, BLOCK)
    lng = rng.uniform(-180, 180, BLOCK)
    return int(latlng_to_cell_id(lat, lng, 30)[0])


def run(total_points: int, procs: int) -> float:
    n_blocks = max(procs, total_points // BLOCK)
    best = None
    for _ in range(3):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(_chunk, range(n_blocks), chunksize=1)
            dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 19.2
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = int(millions * 1e6)
    t_lo = run(n, base)
    t_hi = run(n, base * 4)
    print(
        json.dumps(
            {
                "workload": "shuffle-free S2 numpy pass (multiprocessing)",
                "points": n,
                "procs": [base, base * 4],
                "best_of_3_sec": [round(t_lo, 2), round(t_hi, 2)],
                "speedup": round(t_lo / t_hi, 2),
                "ceiling_efficiency": round(t_lo / t_hi / 4, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
