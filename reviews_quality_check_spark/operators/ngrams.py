"""N-gram diversity and frequency operators.

reference: analyze_ngram_diversity (review_analysis.py:485-522) —
unique/total ratio for n∈{1,2,3}, with stopwords removed for n=1 only;
n-gram frequency tables (statistics.py:96-115) — explode + count + sort.

Scale: explode(ngrams) → two-level hash aggregate (partial map-side
combine is automatic). For 10^12 rows, countDistinct on unigrams is a
second shuffle — approx_count_distinct (HLL) is the scale path; exact
mode kept for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.quality import STOPWORDS
from reviews_quality_check_spark.functions.text import tokens, word_ngrams


def _ngram_col(text_col: str, n: int, remove_stopwords: bool):
    tok = tokens(text_col)
    if remove_stopwords:
        stops = F.array([F.lit(s) for s in STOPWORDS])
        tok = F.filter(tok, lambda t: ~F.array_contains(stops, t))
    return word_ngrams(tok, n)


def ngram_diversity(
    df: DataFrame, text_col: str = "text", exact: bool = True
) -> DataFrame:
    """One row: {uni,bi,tri}gram diversity = distinct/total over the whole
    corpus. Unigrams are stopword-filtered (reference
    review_analysis.py:494-497); bi/trigrams are not.

    Three map-only explode+aggregate passes (one per n). A measured
    single-pass variant (concat of (n, gram)-tagged struct arrays,
    explode once, pivot) was 1.5x SLOWER: the per-element struct tagging
    costs more than re-scanning a column-pruned table, and the distinct
    aggregation -- the actual bottleneck -- is identical either way.
    NB: Spark binds two-parameter transform() lambdas as
    (element, index); a `lambda g, n=n:` closure silently receives the
    array index as n.
    """
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    parts = []
    for n, name in ((1, "unigram"), (2, "bigram"), (3, "trigram")):
        grams = df.select(
            F.explode(_ngram_col(text_col, n, remove_stopwords=(n == 1))).alias("ng")
        )
        parts.append(
            grams.agg(
                (distinct_fn("ng").cast("double") / F.count("ng").cast("double")).alias(
                    f"{name}_diversity"
                )
            )
        )
    return parts[0].crossJoin(parts[1]).crossJoin(parts[2])


def ngram_frequencies(
    df: DataFrame, text_col: str = "text", n: int = 2, top_k: int | None = None
) -> DataFrame:
    """(ngram, cnt) frequency table, descending; deterministic tie-break
    on the ngram string. top_k compiles to TakeOrderedAndProject."""
    grams = df.select(F.explode(_ngram_col(text_col, n, remove_stopwords=False)).alias("ngram"))
    out = (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
    )
    return out.limit(top_k) if top_k else out
