"""Tile assignment (SURVEY.md §2.3-Q3) — H3/S2-style cell ids, two flavors:

- **lkt-native**: the heap ancestor at a fixed tree depth d (= the d-bit
  path prefix of the point's sort_key) — the index's own data-adaptive
  analogue of an H3/S2 cell. Pure column expression over the ``node``
  column the build already carries.
- **fixed-grid Z-order**: the textbook interleaved Morton cell at depth d
  over a fixed bounding box — data-independent, portable (also emitted as
  ANSI SQL for the DuckDB oracle), and the join key for two-sided spatial
  joins.
- **H3 interop**: true H3 ids via a vectorized pandas UDF when the ``h3``
  package is importable; raises NotImplementedError otherwise (the lib is
  not in this container — the Spark-side plumbing is real and tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linear_kdtree_spark.functions.morton import (
    WORLD,
    ancestor_at_depth,
    morton_tile_col,
)
from linear_kdtree_spark.operators.build import LktIndex


def assign_tiles_lkt(index: LktIndex, depth: int) -> DataFrame:
    """(key, tile) — tile = heap id of the point's ancestor at ``depth``
    (the point's own leaf if its path is shorter: that whole subtree is a
    single tile)."""
    return index.points.select(
        "key",
        ancestor_at_depth(F.col("node"), F.col("path_len"), depth).alias("tile"),
    )


def assign_tiles_morton(
    df: DataFrame,
    depth: int,
    bounds: tuple[float, float, float, float] = WORLD,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "tile",
) -> DataFrame:
    return df.withColumn(
        out_col, morton_tile_col(F.col(x_col), F.col(y_col), depth, bounds)
    )


def assign_tiles_h3(df: DataFrame, resolution: int,
                    lat_col: str = "y", lon_col: str = "x") -> DataFrame:
    """True H3 cell ids (interop). Requires the ``h3`` python package."""
    try:
        import h3  # noqa: F401
    except ImportError as e:  # pragma: no cover - h3 not in container
        raise NotImplementedError(
            "h3 package not available in this environment; use "
            "assign_tiles_morton (fixed-grid) or assign_tiles_lkt instead"
        ) from e

    import pandas as pd

    @F.pandas_udf("string")
    def h3_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        import h3

        return pd.Series(
            [h3.latlng_to_cell(a, b, resolution) for a, b in zip(lat, lon)]
        )

    return df.withColumn("h3_cell", h3_cell(F.col(lat_col), F.col(lon_col)))
