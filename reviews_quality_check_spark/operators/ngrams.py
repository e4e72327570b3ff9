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

from reviews_quality_check_spark.functions.arrays import lit_array_str

from reviews_quality_check_spark.functions.quality import STOPWORDS
from reviews_quality_check_spark.functions.text import tokens, word_ngrams


def _ngram_col(text_col: str, n: int, remove_stopwords: bool):
    tok = tokens(text_col)
    if remove_stopwords:
        stops = lit_array_str(STOPWORDS)
        tok = F.filter(tok, lambda t: ~F.array_contains(stops, t))
    return word_ngrams(tok, n)


def ngram_diversity(
    df: DataFrame, text_col: str = "text", exact: bool = True
) -> DataFrame:
    """One row: {uni,bi,tri}gram diversity = distinct/total over the whole
    corpus. Unigrams are stopword-filtered (reference
    review_analysis.py:494-497); bi/trigrams are not.

    Plan shape (measured at sf0.1, identical values):
      - round-1 word_ngrams HOF (sequence+transform+element_at per gram):
        ~12s — per-element interpreted evaluation;
      - single-pass tagged-struct variant: ~18s;
      - posexplode + lead() windows: ~1.3s but shuffles every token;
      - THIS: explode(arrays_zip(slice, slice, slice)) + concat_ws —
        ~0.85s, map-only (no shuffle, native generator), 14x.
    Still three scans of a column-pruned table: re-scanning parquet is
    cheaper than anything that re-derives grams per element.
    """
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    stops = lit_array_str(STOPWORDS)
    tok = tokens(text_col)
    out = None
    for n, name in ((1, "unigram"), (2, "bigram"), (3, "trigram")):
        if n == 1:
            grams = df.select(
                F.explode(F.filter(tok, lambda t: ~F.array_contains(stops, t))).alias("ng")
            )
        else:
            m = F.greatest(F.size(tok) - (n - 1), F.lit(0))
            z = F.arrays_zip(*[F.slice(tok, i + 1, m) for i in range(n)])
            grams = df.select(F.explode(z).alias("z")).select(
                F.concat_ws(" ", *[F.col(f"z.{i}") for i in range(n)]).alias("ng")
            )
        piece = grams.agg(
            (distinct_fn("ng").cast("double") / F.count("ng").cast("double")).alias(
                f"{name}_diversity"
            )
        )
        out = piece if out is None else out.crossJoin(piece)
    return out


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


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition-removal statistics (Rae et al. 2021 §A1.1:
    drop documents whose most-frequent 2-gram exceeds 18% of all
    2-grams) — engine addition for the training-data pipeline.

    Everything is INTEGER-valued so the cross-engine oracle is exact:
    per doc, word counts (total/distinct), bigram counts
    (total/distinct/max frequency), and the keep flag as
    ``max_bigram_count * 100 <= 18 * n_bigrams`` (vacuously true for
    docs with < 2 tokens). Scale shape: one explode → (doc, bigram)
    count → per-doc aggregate; both shuffles key on the doc id.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("t"))
    words = (
        toks.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
        )
    )
    big = (
        toks.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                    F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            F.max("c").cast("long").alias("max_bigram_count"),
        )
    )
    out = words.join(big, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_distinct_bigrams", F.lit(0)).alias("n_distinct_bigrams"),
        F.coalesce("max_bigram_count", F.lit(0)).alias("max_bigram_count"),
    )
    return out.withColumn(
        "rep_ok",
        F.col("max_bigram_count") * 100 <= 18 * F.col("n_bigrams"),
    )


DUP_SPAN_N = 8  # cross-doc duplicated-span n-gram width


def dup_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DUP_SPAN_N,
) -> DataFrame:
    """Cross-document duplicated n-gram span coverage (the doc-level
    statistic behind substring-level training-data dedup, Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"):
    an n-gram occurring in >= 2 DISTINCT documents marks all n of its
    token positions as duplicated; per doc we report how many token
    positions are covered by any such n-gram and the covered fraction.

    Output: (doc_id, n_tokens, n_dup_tokens, dup_frac). Docs shorter
    than n tokens have n_dup_tokens = 0. dup_frac goes through the
    engine-standard +1e-9 round(4) (quotients of small integers hit
    exact 4dp midpoints).

    Grams are keyed by a 60-bit md5-derived hash (identical closed form
    in the DuckDB oracle, so even a collision — which would merge two
    distinct grams — is reproduced bit-identically cross-engine) to
    keep the gram shuffle narrow at corpus scale. Shape: explode ->
    two-level hash-aggregate for the distinct-doc count -> equi-join of
    occurrences against the dup-gram set -> position explode ->
    doc-keyed distinct+count. No windows, no cartesian; the gram joins
    are plain hash shuffles AQE can split on hot boilerplate grams.
    """
    from reviews_quality_check_spark.operators.pinning import pin

    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("t"))
    occ = (
        toks.select(
            "doc_id",
            F.posexplode(word_ngrams(F.col("t"), n)).alias("pos", "gram"),
        )
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("gh"),
        )
    )
    # occ feeds BOTH the dup-gram aggregate and the coverage join; pinned
    # (per-invocation localCheckpoint — no cross-run reuse) so the
    # tokenize/ngram/md5 map work runs once instead of twice. Total I/O
    # strictly drops at scale too: the narrow (doc_id, pos, gh) rows were
    # already shuffled twice; now they are computed once, stored once,
    # read twice (r6 measured 3.2s -> 2.0s at sf0.1). Set
    # $RQC_CHECKPOINT_DIR to make the pin durable to executor loss.
    occ = pin(occ, None)
    dup = (
        occ.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    covered = (
        occ.join(dup, "gh")
        .select(
            "doc_id", F.explode(F.sequence("pos", F.col("pos") + n - 1)).alias("p")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_tokens"))
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return (
        base.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("n_dup_tokens", F.lit(0)).cast("double")
                    / F.col("n_tokens")
                    + F.lit(1e-9),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def sql_dup_ngram_spans(docs_sql: str, token_re: str, n: int = DUP_SPAN_N) -> str:
    """DuckDB twin of dup_ngram_spans over a (doc_id, text) relation."""
    return f"""
    WITH docs AS ({docs_sql}),
    tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{token_re}') AS t
      FROM docs),
    idx AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - {n - 1}, 0) + 1)) AS i
      FROM tok),
    occ AS (
      SELECT doc_id, i - 1 AS pos,
             ('0x' || substr(md5(array_to_string(t[i:i+{n - 1}], ' ')), 1, 15))::bigint AS gh
      FROM idx),
    dup AS (
      SELECT gh FROM occ GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
    covered AS (
      SELECT doc_id, count(*) AS n_dup_tokens FROM (
        SELECT DISTINCT doc_id, p FROM (
          SELECT doc_id, pos + unnest(range(0, {n})) AS p
          FROM occ JOIN dup USING (gh)))
      GROUP BY doc_id),
    base AS (SELECT doc_id, len(t) AS n_tokens FROM tok)
    SELECT base.doc_id,
           cast(n_tokens AS bigint) AS n_tokens,
           cast(coalesce(n_dup_tokens, 0) AS bigint) AS n_dup_tokens,
           CASE WHEN n_tokens > 0
                THEN round(cast(coalesce(n_dup_tokens, 0) AS double) / n_tokens
                           + 1e-9, 4)
                ELSE 0.0 END AS dup_frac
    FROM base LEFT JOIN covered USING (doc_id)
    ORDER BY doc_id
    """
