"""Raster ↔ vector (SURVEY.md §2.3-Q5).

Rasterize: tile assignment at depth d + groupBy(tile) aggregation — one
shuffle with map-side partial aggregation.
Vectorize: aggregated tile stats → tile rectangle geometry, derived from the
tile id by pure bit-deinterleave column expressions (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linear_kdtree_spark.functions.morton import WORLD
from linear_kdtree_spark.operators.tile import assign_tiles_morton


def _deinterleave(tile: Column, depth: int, odd: bool) -> Column:
    """Extract the x (odd=False) or y (odd=True) cell ordinate from a
    Z-order tile id."""
    out = F.lit(0).cast("long")
    for i in range(depth):
        bitpos = 2 * i + (1 if odd else 0)
        # exact integer bit extraction — a double divide loses the low
        # bits once tile >= 2^53, i.e. wrong rectangles at depth >= 27
        out = out + (F.shiftright(tile, bitpos) % 2) * F.lit(1 << i)
    return out


def rasterize(
    points: DataFrame,
    depth: int,
    value_col: str | None = None,
    bounds: tuple[float, float, float, float] = WORLD,
) -> DataFrame:
    """(tile, n_points [, sum_value, avg_value]) per non-empty tile."""
    tiled = assign_tiles_morton(points, depth, bounds)
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col:
        aggs += [
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        ]
    return tiled.groupBy("tile").agg(*aggs)


def rasterize_pyramid(
    points: DataFrame,
    max_depth: int,
    value_col: str | None = None,
    bounds: tuple[float, float, float, float] = WORLD,
) -> DataFrame:
    """(depth, tile, n_points [, sum_value]) for every level 0..max_depth —
    the multi-resolution rollup a tile-serving/raster pipeline materializes.

    Scale shape: the data is scanned ONCE (the max_depth rasterize); every
    coarser level aggregates the PREVIOUS level's aggregate (Z-order parent
    = tile >> 2, exact because halving the grid index is the floor of the
    half-resolution ordinate), so levels 0..d-1 cost O(4^d) aggregate rows,
    not O(points). avg is intentionally absent (not rollup-mergeable
    without carrying sums — callers derive it as sum/n)."""
    base = rasterize(points, max_depth, value_col=value_col, bounds=bounds)
    aggs = [F.sum("n_points").alias("n_points")]
    cols = ["depth", "tile", "n_points"]
    if value_col:
        base = base.drop("avg_value")
        aggs.append(F.sum("sum_value").alias("sum_value"))
        cols.append("sum_value")
    cur = base.withColumn("depth", F.lit(max_depth)).select(*cols)
    levels = [cur]
    for d in range(max_depth - 1, -1, -1):
        cur = (
            cur.groupBy(F.shiftright("tile", 2).alias("tile"))
            .agg(*aggs)
            .withColumn("depth", F.lit(d))
            .select(*cols)
        )
        levels.append(cur)
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def vectorize(
    raster: DataFrame,
    depth: int,
    bounds: tuple[float, float, float, float] = WORLD,
) -> DataFrame:
    """Adds tile rectangle bounds (xmin, ymin, xmax, ymax) to a raster DF —
    the polygonize direction of Q5."""
    xmin_b, ymin_b, xmax_b, ymax_b = bounds
    wx = (xmax_b - xmin_b) / (1 << depth)
    wy = (ymax_b - ymin_b) / (1 << depth)
    ix = _deinterleave(F.col("tile"), depth, odd=False)
    iy = _deinterleave(F.col("tile"), depth, odd=True)
    return (
        raster.withColumn("xmin", F.lit(xmin_b) + ix * F.lit(wx))
        .withColumn("ymin", F.lit(ymin_b) + iy * F.lit(wy))
        .withColumn("xmax", F.col("xmin") + F.lit(wx))
        .withColumn("ymax", F.col("ymin") + F.lit(wy))
    )
