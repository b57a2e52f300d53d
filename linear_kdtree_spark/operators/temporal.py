"""Temporal operators a web-scale event pipeline needs and Spark lacks as
built-ins: as-of join and sessionization helpers (SURVEY.md §2.4 lists the
reference as having no temporal surface at all; these belong to the
engine's beyond-reference mandate).

as_of_join is the standard Spark composition — tag + union + ordered
window with last(ignorenulls) — NOT a per-row UDF: one shuffle on the
``by`` key, whole-stage-codegen'd window, no Python. Semantics match
DuckDB's native ASOF JOIN (each left row matched to the right row with
the greatest ts ≤ left.ts within its key), which serves as the
independent gate oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    out_prefix: str = "r_",
) -> DataFrame:
    """Each left row + the as-of matching right row's columns (prefixed;
    nulls when no right row at-or-before it exists for the key).

    Ties (several right rows sharing the match timestamp) break by the
    greatest ``tie_col`` (default: first of ``right_cols``) — pass a
    unique column or pre-deduplicate for fully pinned semantics."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (by, ts_col)
    ]
    if not right_cols:
        raise ValueError(
            "as_of_join: the right frame carries no columns besides "
            f"({by!r}, {ts_col!r}) — there is nothing to join; add a "
            "payload column or pass right_cols explicitly"
        )
    tie_col = tie_col or right_cols[0]
    # SQL ASOF semantics (the DuckDB oracle): NULL never matches — a right
    # row with a NULL key or NULL ts can match nothing, and a left row
    # with a NULL key gets null right columns. The window below would
    # otherwise group NULL keys together and "match" them (review r5), so
    # drop unmatched right rows up front; left rows always pass through.
    right = right.filter(F.col(by).isNotNull() & F.col(ts_col).isNotNull())
    rstruct = T.StructType([right.schema[c] for c in right_cols])
    lstruct = T.StructType([left.schema[c] for c in left.columns])
    l2 = left.select(
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_il"),
        F.lit(None).cast(rstruct).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r2 = right.select(
        F.col(by).alias("_by"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_il"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
        F.lit(None).cast(lstruct).alias("_l"),
    )
    # right rows sort BEFORE left rows at equal ts (asof is ≤-inclusive);
    # among right rows at one ts the greatest tie_col wins (last in order)
    w = (
        Window.partitionBy("_by")
        .orderBy("_ts", "_il", F.col("_r")[tie_col])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_il") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_m.{c}").alias(f"{out_prefix}{c}") for c in right_cols
    ]
    return matched.select(*out_cols)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    by: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``
    (works on batch AND streaming frames — a streaming input gets
    ``withWatermark(ts_col, watermark or gap)`` attached, since Spark
    rejects a streaming session aggregation without one; pass
    ``watermark`` to bound late data differently from the session gap):
    one session per run of events
    whose inter-arrival is ≤ ``gap``; window end = last event + gap, and
    the boundary is INCLUSIVE — an event exactly at the current end
    extends the session (verified against Spark's behavior in
    tests/test_temporal.py; the DuckDB oracle breaks on diff > gap
    accordingly). Outputs integer-only columns (epoch micros, counts, id
    bounds) so the result is bit-gateable against the gaps-and-islands
    formulation."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark or gap)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(by), sw.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(id_col).alias("min_event_id"),
            F.max(id_col).alias("max_event_id"),
        )
        .select(
            by,
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias(
                "session_end_us"
            ),
            "n_events",
            "min_event_id",
            "max_event_id",
        )
    )
