"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir, compare row count, schema and
order-insensitive values.

Usage: python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from linear_kdtree_spark.entry import TABLES  # noqa: E402


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # STRICT dtype-kind check: the driver's value-hash distinguishes
            # int64 123 from float64 123.0 (round-1 fingerprint failure mode
            # — DuckDB HUGEINT → pandas float64). Casting both sides to
            # float64 here would mask exactly that class of mismatch.
            a_f = np.issubdtype(av.dtype, np.floating)
            b_f = np.issubdtype(bv.dtype, np.floating)
            if a_f != b_f:
                problems.append(
                    f"dtype kind mismatch in col {c}: {av.dtype} vs {bv.dtype} "
                    "(driver hash would fail)"
                )
                continue
            if a_f:
                eq = np.array_equal(
                    av.astype(np.float64), bv.astype(np.float64), equal_nan=True
                )
            else:
                eq = bool((av == bv).all()) if len(av) else True
            if not eq:
                bad = np.flatnonzero(av != bv)[:5] if len(av) == len(bv) else []
                problems.append(
                    f"values differ in col {c} "
                    + "; ".join(f"row {i}: {av[i]!r} vs {bv[i]!r}" for i in bad)
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from linear_kdtree_spark.session import get_spark

    spark = get_spark(app_name="gate_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = se.queries(), se.oracle_sql()
    failures = 0
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results.append(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            results.append(f"SKIP {name}: no oracle (rows-only) — {len(spark_pdf)} rows, {t1-t0:.1f}s")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            results.append(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            results.append(f"FAIL {name}: " + " | ".join(problems))
            failures += 1
        else:
            results.append(
                f"OK   {name}: {len(spark_pdf)} rows match "
                f"({t1-t0:.1f}s spark, {time.time()-t1:.1f}s duckdb)"
            )
    spark.stop()
    print()
    print("==== GATE SUMMARY ====")
    for line in results:
        print(line)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
