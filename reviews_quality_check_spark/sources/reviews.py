"""Deterministic synthetic ``reviews`` generator (FIXTURES.md §2).

Mirrors the reference input shape ({id,text,sentiment} rows + a file
domain, review_analysis.py:245-259) with planted rows that exercise
every sentiment-rule branch: neutral-indicator substrings, contrast
markers, negations, regex-pattern hits, multi-sentence >20-word texts,
exact duplicates under the 50-word gate, and polar keyword rows.

Built entirely from Spark expressions (md5-indexed template pool), so a
10k-row fixture materializes in milliseconds on any cluster size and is
bit-identical everywhere — the engine's analog of the reference's
Tech10k regression dataset (Report/analysis.log anchors: 231 mismatches
/ 53 removals at fixed config). md5 (not xxhash64) so ANY engine can
regenerate the identical fixture: sql_synth_reviews() emits the DuckDB
twin, which is what lets reviews_pipeline_metrics be oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.arrays import lit_array_str

# template pool: fragments chosen to hit reference rule branches
_TEMPLATES = (
    "This product is good and works great",
    "Terrible quality, bad and useless product",
    "It performs adequately and meets expectations",
    "Good enough but fairly average overall",
    "The device is innovative and efficient hardware",
    "Slow and buggy, outdated and clunky software",
    "Standard typical average industry-standard stuff",
    "There are pros and cons to this approach",
    "Compared to other models this is similar",
    "I love it, excellent and amazing product",
    "Not good at all, never buying again",
    "The screen is great. However the battery is bad. "
    "It lasts a short time and the charger is slow and "
    "the port is loose and the cable is short as well.",
    "Works fine for basic tasks",
    "Decent but limited compared to newer options",
    "plain description without any opinion markers",
    "While the camera is impressive the price is expensive but acceptable",
    "An ordinary reasonable purchase, nothing special",
    "Horrible, worst experience, broken on arrival",
    "Somewhat useful yet rather noisy in operation",
    "Perfect! Happy with this fantastic wonderful buy",
)

SENTIMENTS = ("positive", "negative", "neutral")
DOMAINS = ("technology", "software")


def synth_reviews(spark: SparkSession, n_rows: int, seed: int = 42,
                  dup_rate_pct: int = 2) -> DataFrame:
    """n_rows review rows; ~dup_rate_pct% exact duplicates (short texts,
    satisfying the reference's <=50-word exact-match gate)."""
    df = spark.range(1, n_rows + 1).withColumnRenamed("id", "rid")

    def h(salt: str):
        # 60-bit md5-derived int — portable: DuckDB computes the identical
        # value as ('0x' || substring(md5(rid || ':seed:salt'), 1, 15))::bigint
        key = F.concat_ws(
            ":", F.col("rid").cast("string"), F.lit(str(seed)), F.lit(salt)
        )
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")

    tpl = F.element_at(
        lit_array_str(_TEMPLATES),
        (h("tpl") % len(_TEMPLATES) + 1).cast("int"),
    )
    # suffix varies texts so they aren't all duplicates; dup rows skip it
    suffix = F.concat(F.lit(" unit "), (h("sfx") % 1000).cast("string"))
    is_dup = h("dup") % 100 < dup_rate_pct
    text = F.when(is_dup, tpl).otherwise(F.concat(tpl, suffix))

    # fixed 45/35/20 label distribution (FIXTURES.md §2)
    sentiment = F.element_at(
        lit_array_str(SENTIMENTS),
        F.when(h("sent") % 100 < 45, F.lit(1))
        .when(h("sent") % 100 < 80, F.lit(2))
        .otherwise(F.lit(3)),
    )
    domain = F.element_at(
        lit_array_str(DOMAINS),
        F.when(h("dom") % 100 < 80, F.lit(1)).otherwise(F.lit(2)),
    )
    return df.select(
        F.col("rid").alias("id"),
        text.alias("text"),
        sentiment.alias("sentiment"),
        domain.alias("domain"),
    )


def sql_synth_reviews(n_rows: int, seed: int = 42, dup_rate_pct: int = 2) -> str:
    """DuckDB subquery regenerating synth_reviews() bit-identically —
    same md5-derived indices, same template pool, same label/domain
    draws. Used to oracle-gate every query that consumes the fixture."""
    tpl_list = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in _TEMPLATES) + "]"
    sent_list = "[" + ", ".join(f"'{s}'" for s in SENTIMENTS) + "]"
    dom_list = "[" + ", ".join(f"'{d}'" for d in DOMAINS) + "]"

    def h(salt: str) -> str:
        return (
            f"('0x' || substring(md5(rid::varchar || ':{seed}:{salt}'), 1, 15))::bigint"
        )

    return f"""(
    WITH r AS (SELECT cast(range as bigint) AS rid FROM range(1, {n_rows + 1})),
    g AS (
      SELECT rid,
             {tpl_list}[cast({h('tpl')} % {len(_TEMPLATES)} + 1 as int)] AS tpl,
             ' unit ' || ({h('sfx')} % 1000)::varchar AS suffix,
             {h('dup')} % 100 < {dup_rate_pct} AS is_dup,
             {h('sent')} % 100 AS hs,
             {h('dom')} % 100 AS hd
      FROM r)
    SELECT rid AS id,
           CASE WHEN is_dup THEN tpl ELSE tpl || suffix END AS text,
           {sent_list}[CASE WHEN hs < 45 THEN 1 WHEN hs < 80 THEN 2 ELSE 3 END] AS sentiment,
           {dom_list}[CASE WHEN hd < 80 THEN 1 ELSE 2 END] AS domain
    FROM g)"""
