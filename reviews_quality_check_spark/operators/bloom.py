"""Bloom-filter benchmark decontamination — the scale path for testing
corpus shingles against an eval set too large to broadcast raw.

``decontamination_hits`` (queries.py) joins corpus 8-gram shingles
against the eval set's shingles directly — right when the eval side is
small. At web scale the eval side can be 10^8-10^9 shingles (every
benchmark ever published): the production pattern (Brown et al. 2020
GPT-3 Appendix C describe 13-gram bloom decontamination; reference
analyzers/duplicates.py:1-40 does set-membership per review) is a
Bloom bitmap PREFILTER — m bits, k hashes — broadcast to every
executor, with the expensive exact join running only over the tiny
candidate set the bloom lets through.

Engine shape: the bitmap is built as 62-bit words (``word_idx``,
``bits``) by a ``bit_or`` hash-aggregate over the eval shingles' k
md5-derived bit positions — m/62 rows total, broadcastable at any m
that fits executor memory (m = 2^32 bits ≈ 69M words ≈ 0.5 GB; real
deployments pick m from the eval-shingle count). The corpus probe is
explode(k positions) → broadcast-join the word table → per-shingle
"all k bits set" → per-doc aggregate. The exact-confirm join then
touches ONLY bloom candidates, so its cost is the bloom's true-hit +
false-positive volume, not the corpus.

Why 62-bit words, not 64: DuckDB raises on ``1::BIGINT << 63``
(overflow) and ``1 << 62`` flips the sign bit's neighbour safely on
both engines, so capping the in-word offset at 61 keeps every mask a
positive BIGINT with identical two's-complement semantics in Spark
(Java long) and the DuckDB oracle.

Everything is md5-derived (positions: first 8 hex chars of
md5('<j>#<shingle>')), so the filter — including its false positives —
reproduces bit-identically in the DuckDB oracle: the output certifies
the bloom's FP accounting, not just its true hits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 62


def _positions(shingle: Column, j: Column, m_bits: int) -> Column:
    """Bit position in [0, m_bits) for hash function j of a shingle —
    DuckDB twin: ('0x'||substr(md5(j||'#'||s),1,8))::bigint % m."""
    key = F.concat(j.cast("string"), F.lit("#"), shingle)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % m_bits


def _doc_shingles(df: DataFrame, key: str, n: int) -> DataFrame:
    from reviews_quality_check_spark.functions.text import tokens, word_ngrams

    return df.select(
        key,
        F.explode(F.array_distinct(word_ngrams(tokens("text"), n))).alias(
            "shingle"
        ),
    )


def bloom_decontamination(
    corpus: DataFrame,
    tests: DataFrame,
    m_bits: int = 1024,
    k: int = 3,
    ngram: int = 8,
) -> DataFrame:
    """Bloom-prefiltered decontamination of (doc_id, text) corpus
    against (test_id, text) eval docs.

    Returns (doc_id, bloom_hits, exact_hits, false_positives): per
    corpus doc with >= 1 bloom-candidate shingle, the number of
    distinct shingles the bloom admits, how many of those are REAL
    eval-set shingles (confirmed by the exact join over candidates
    only), and the difference — the per-doc false-positive count,
    deterministic because the whole filter is md5-derived.

    Scale: the words table is m_bits/62 rows (broadcast); the corpus
    side is explode(k) -> broadcast join -> two doc-keyed aggregates.
    No corpus-sized shuffle beyond the (doc_id, shingle) aggregate.
    """
    ks = F.sequence(F.lit(1), F.lit(k))
    tsh = _doc_shingles(tests, "test_id", ngram).select("shingle").distinct()
    words = (
        tsh.select(
            F.explode(ks).alias("j"),
            F.col("shingle"),
        )
        .select(_positions(F.col("shingle"), F.col("j"), m_bits).alias("pos"))
        .select(
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    csh = _doc_shingles(corpus, "doc_id", ngram)
    probes = csh.select(
        "doc_id",
        "shingle",
        F.explode(ks).alias("j"),
    ).withColumn("pos", _positions(F.col("shingle"), F.col("j"), m_bits))
    probes = probes.select(
        "doc_id",
        "shingle",
        (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {BITS_PER_WORD} as int))").alias("mask"),
    )
    hits = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .select(
            "doc_id",
            "shingle",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.sum("hit").alias("n_hit"))
        .filter(F.col("n_hit") == k)
    )
    confirmed = hits.join(
        F.broadcast(tsh.withColumn("is_real", F.lit(1))), "shingle", "left"
    )
    return (
        confirmed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("bloom_hits"),
            F.sum(F.coalesce("is_real", F.lit(0))).alias("exact_hits"),
        )
        .select(
            "doc_id",
            "bloom_hits",
            "exact_hits",
            (F.col("bloom_hits") - F.col("exact_hits")).alias("false_positives"),
        )
        .orderBy("doc_id")
    )


def sql_bloom_decontamination(
    corpus_sql: str,
    tests_sql: str,
    sql_tokens_of_text: str,
    m_bits: int = 1024,
    k: int = 3,
    ngram: int = 8,
) -> str:
    """DuckDB twin. ``sql_tokens_of_text`` is the token-array expression
    over a column named ``text`` (queries.py sql_tokens('text'))."""
    terms = " || ' ' || ".join(f"t[i+{d}]" if d else "t[i]" for d in range(ngram))
    sh = (
        f"list_distinct(list_transform(range(1, len(t) - {ngram - 2}),"
        f" i -> {terms}))"
    )
    pos = "(('0x' || substr(md5(cast(j AS varchar) || '#' || shingle), 1, 8))::bigint % {m})".format(m=m_bits)
    return f"""
    WITH corpus AS ({corpus_sql}),
    tests AS ({tests_sql}),
    tsh AS (
      SELECT DISTINCT unnest(sh) AS shingle FROM (
        SELECT {sh} AS sh FROM
          (SELECT {sql_tokens_of_text} AS t FROM tests))),
    tpos AS (
      SELECT {pos} AS pos
      FROM tsh CROSS JOIN (SELECT unnest(range(1, {k + 1})) AS j)),
    words AS (
      SELECT pos // {BITS_PER_WORD} AS word_idx,
             bit_or(1::bigint << cast(pos % {BITS_PER_WORD} AS int)) AS bits
      FROM tpos GROUP BY 1),
    csh AS (
      SELECT doc_id, unnest(sh) AS shingle FROM (
        SELECT doc_id, {sh} AS sh FROM
          (SELECT doc_id, {sql_tokens_of_text} AS t FROM corpus))),
    probes AS (
      SELECT doc_id, shingle,
             {pos} // {BITS_PER_WORD} AS word_idx,
             1::bigint << cast({pos} % {BITS_PER_WORD} AS int) AS mask
      FROM csh CROSS JOIN (SELECT unnest(range(1, {k + 1})) AS j)),
    hits AS (
      SELECT doc_id, shingle, sum(
               CASE WHEN bits IS NOT NULL AND (bits & mask) != 0
                    THEN 1 ELSE 0 END) AS n_hit
      FROM probes LEFT JOIN words USING (word_idx)
      GROUP BY doc_id, shingle
      HAVING n_hit = {k}),
    confirmed AS (
      SELECT h.doc_id, h.shingle,
             CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END AS is_real
      FROM hits h LEFT JOIN tsh t USING (shingle))
    SELECT doc_id,
           count(*) AS bloom_hits,
           cast(sum(is_real) AS bigint) AS exact_hits,
           cast(count(*) - sum(is_real) AS bigint) AS false_positives
    FROM confirmed GROUP BY doc_id
    ORDER BY doc_id
    """
