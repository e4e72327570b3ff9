"""Deterministic synthetic ``pages`` generator (FIXTURES.md §1).

Generates the north-star input shape — (url, warc_ts, html, text, lang)
— fully inside Spark (spark.range → column expressions), seeded and
size-parameterized, so fixtures of any scale are reproducible without
external data and without driver-side row materialization.

Planted defects (rates per FIXTURES.md):
  ~1%   exact-duplicate urls            → uniqueness violations
  ~2%   near-duplicate text pairs       → MinHash-LSH hits
  ~1%   exact-duplicate text            → exact-dup groups
  ~1%   empty/whitespace text           → not_blank violations
  ~0.3% invalid lang codes              → referential violations
  hot hosts covering ~20% of rows       → skew/salting tests
  unicode-dirty html in ~5% of rows     → sanitize-chain parity bytes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.arrays import lit_array_str

VALID_LANGS = ("en", "es", "de", "fr", "it", "pt", "nl", "zh")
_WORDS = (
    "data quality spark engine table scan filter join group window "
    "page crawl text review product service fast slow good great time "
    "user system value check result count order merge sort key row"
).split()


def synth_pages(spark: SparkSession, n_rows: int, n_days: int = 7, seed: int = 42) -> DataFrame:
    """Build n_rows synthetic pages; deterministic for a given (n_rows,
    n_days, seed) on any cluster size (everything derives from the row
    index via xxhash64 — no RNG, no per-partition state)."""
    df = spark.range(n_rows).withColumnRenamed("id", "row_idx")
    h = lambda salt: F.abs(F.xxhash64(F.col("row_idx"), F.lit(seed), F.lit(salt)))  # noqa: E731

    # hosts: 5 hot hosts cover ~20% of rows; long tail otherwise
    host = (
        F.when(h("hot") % 100 < 20, F.concat(F.lit("hot"), (h("hoti") % 5).cast("string")))
        .otherwise(F.concat(F.lit("host"), (h("host") % (1 << 16)).cast("string")))
    )
    # ~1% exact-duplicate urls: map 1% of rows onto a small shared id space
    url_id = F.when(h("dupu") % 100 < 1, h("dupui") % 50).otherwise(F.col("row_idx"))
    url = F.concat(F.lit("https://"), host, F.lit(".example.com/p/"), url_id.cast("string"))

    warc_ts = F.to_timestamp(F.lit("2024-03-01 00:00:00")) + F.make_interval(
        secs=(h("ts") % (n_days * 86400)).cast("double")
    )

    # text: 8..40 words drawn deterministically; planted dup/near-dup/empty
    n_words = (h("len") % 33 + 8).cast("int")
    word_at = lambda i: F.element_at(  # noqa: E731
        lit_array_str(_WORDS),
        (F.abs(F.xxhash64(F.col("row_idx"), F.lit(seed), F.lit("w"), i)) % len(_WORDS) + 1).cast("int"),
    )
    base_words = F.transform(F.sequence(F.lit(1), n_words), word_at)
    base_text = F.concat_ws(" ", base_words)
    # exact-dup text (~1%): pull from a pool of 20 canned sentences
    pool = F.concat(F.lit("shared duplicate page body number "), (h("dupt") % 20).cast("string"))
    # near-dup (~2%): base text of a *different* row (row_idx - 1) plus a tweak
    near_src = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda i: F.element_at(
            lit_array_str(_WORDS),
            (F.abs(F.xxhash64((F.col("row_idx") / 2).cast("long"), F.lit(seed), F.lit("w"), i)) % len(_WORDS) + 1).cast("int"),
        ),
    )
    near_text = F.concat_ws(" ", near_src)
    # select whole adjacent PAIRS (row 2k & 2k+1) so every near-dup has a mate
    pair_idx = (F.col("row_idx") / 2).cast("long")
    near_sel = F.abs(F.xxhash64(pair_idx, F.lit(seed), F.lit("nearsel"))) % 100 < 2
    near_tweak = F.when(F.col("row_idx") % 2 == 0, F.lit("")).otherwise(F.lit(" extra"))
    text = (
        F.when(h("blank") % 100 < 1, F.lit("  "))
        .when(h("dupt2") % 100 < 1, pool)
        .when(near_sel, F.concat(near_text, near_tweak))
        .otherwise(base_text)
    )

    # lang: skewed toward en; ~0.3% invalid codes
    lang = (
        F.when(h("bad") % 1000 < 3, F.lit("xx"))
        .when(h("lang") % 100 < 70, F.lit("en"))
        .otherwise(
            F.element_at(
                lit_array_str(VALID_LANGS[1:]),
                (h("lang2") % (len(VALID_LANGS) - 1) + 1).cast("int"),
            )
        )
    )

    # html: wrap text; ~5% get unicode-dirty decorations for sanitize tests
    dirty = F.concat(
        F.lit("“quoted” – café …   "), text, F.lit(" • end​")
    )
    html_text = F.when(h("dirty") % 100 < 5, dirty).otherwise(text)
    html = F.concat(F.lit("<html><body>"), html_text, F.lit("</body></html>")).cast("binary")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        F.col("row_idx"),
    )
