"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1,
BASELINE.json input_hint): ``(url string, warc_ts timestamp, html binary,
text string, lang string)``.

Generated entirely with JVM column expressions from ``spark.range(n)`` —
no driver-side data, no Python, fully reproducible at any scale (the same
generator produces the 1e6-row bench table and the 1e3-row unit fixture).
Each page embeds 0–3 ``geo:<lat>,<lon>`` coordinate mentions in ``text``;
70 % of coordinates draw from 24 Gaussian-ish "city" clusters, 30 %
uniform — the skewed distribution the salting path exists for
(SURVEY.md §4.3). ``html`` wraps ``text`` byte-identically so the
per-url text invariant is testable end-to-end (SURVEY.md §5.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "pt"]
N_CLUSTERS = 24
WORDS = [
    "stream", "query", "table", "index", "join", "filter", "window",
    "batch", "vector", "page", "crawl", "archive", "record", "anchor",
]


def _h(seed: int, col: Column) -> Column:
    """Deterministic 31-bit mix of a long column (two LCG rounds; pure
    integer column arithmetic, portable). Every intermediate stays below
    2^63: the input is reduced to 31 bits BEFORE each multiply, so the
    expression never overflows under Spark's default ANSI mode at ANY id —
    the previous 62-bit form multiplied a 2^62-range value and crashed
    with ARITHMETIC_OVERFLOW above ~13k pages (review r5). 31 bits is
    ample: every consumer takes pmod(h, m) with m ≤ 3.6e6."""
    z = F.pmod(col + F.lit(seed), F.lit(2**31))
    z = F.pmod(z * F.lit(2654435761) + F.lit(40503), F.lit(2**31))
    return F.pmod(z * F.lit(69069) + F.lit(seed), F.lit(2**31))


def coordinate_cols(id_col: Column) -> tuple[Column, Column]:
    """(lat, lon) per mention id: 70 % clustered / 30 % uniform."""
    h1 = _h(101, id_col)
    h2 = _h(202, id_col)
    h3 = _h(303, id_col)
    cluster = F.pmod(h1, F.lit(N_CLUSTERS))
    clustered = F.pmod(h1, F.lit(100)) < 70
    # integer-ish city centers, offset by .5 to dodge grid boundaries
    cx = (F.pmod(cluster * 137, F.lit(340)) - 170 + F.lit(0.5)).cast("double")
    cy = (F.pmod(cluster * 61, F.lit(160)) - 80 + F.lit(0.5)).cast("double")
    lon = F.when(
        clustered, cx + (F.pmod(h2, F.lit(20001)) - 10000) / F.lit(10000.0)
    ).otherwise(F.pmod(h2, F.lit(3600000)) / 10000.0 - 180.0)
    lat = F.when(
        clustered, cy + (F.pmod(h3, F.lit(20001)) - 10000) / F.lit(10000.0)
    ).otherwise(F.pmod(h3, F.lit(1700000)) / 10000.0 - 85.0)
    return lat, lon


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    site = F.pmod(_h(7, i), F.lit(9973))
    url = F.format_string("https://site%04d.example/page/%06d", site, i)
    warc_ts = F.expr(
        "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, id)"
    )
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]), (F.pmod(_h(11, i), F.lit(5)) + 1).cast("int")
    )
    n_geo = F.pmod(_h(13, i), F.lit(4))  # 0..3 mentions
    body_words = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in WORDS]),
                (F.pmod(_h(17 + j, i), F.lit(len(WORDS))) + 1).cast("int"),
            )
            for j in range(8)
        ],
    )
    mentions = []
    for j in range(3):
        mid = i * 4 + j + 1  # distinct mention id space
        lat, lon = coordinate_cols(mid)
        mentions.append(
            F.when(
                n_geo >= j + 1,
                F.format_string(" geo:%.4f,%.4f", lat, lon),
            ).otherwise(F.lit(""))
        )
    text = F.concat(body_words, *mentions)
    html = F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")).cast(
        "binary"
    )
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
