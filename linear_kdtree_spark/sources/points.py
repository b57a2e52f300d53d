"""Point extraction: mine ``geo:<lat>,<lon>`` coordinate mentions from the
pages table's ``text`` column (BASELINE.json north_star).

Pure JVM path: ``regexp_extract_all`` → ``posexplode`` → ``regexp_extract``
per ordinal → float cast; key = ``xxhash64(url || ':' || ordinal)``
(FIXTURES.md F1 extraction rule — deterministic, collision-resistant row
identity mirroring the reference's ``key = i`` at main.cpp:119).

Per-row invariant (input_hint): the ``text`` bytes per url are never
transformed — extraction only *reads* them; `text_from_html` recovers the
byte-identical text from the binary html for the invariant test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEO_PATTERN = r"geo:(-?\d+\.\d+),(-?\d+\.\d+)"


def extract_points(pages: DataFrame, coord_type: str = "float") -> DataFrame:
    """pages(url, text, ...) → points(url, ordinal, x=lon, y=lat, key)."""
    matches = pages.select(
        "url",
        F.regexp_extract_all(F.col("text"), F.lit(GEO_PATTERN), 0).alias("ms"),
    )
    exploded = matches.select("url", F.posexplode("ms").alias("ordinal", "m"))
    return exploded.select(
        "url",
        "ordinal",
        F.regexp_extract("m", GEO_PATTERN, 2).cast(coord_type).alias("x"),
        F.regexp_extract("m", GEO_PATTERN, 1).cast(coord_type).alias("y"),
        F.xxhash64(F.concat_ws(":", F.col("url"), F.col("ordinal"))).alias("key"),
    )


def text_from_html(html_col) -> "F.Column":
    """Recover the text bytes from the html wrapper (byte-identical —
    SURVEY.md §5.4 invariant)."""
    s = html_col.cast("string")
    return F.regexp_replace(
        F.regexp_replace(s, r"^<html><body>", ""), r"</body></html>$", ""
    )
