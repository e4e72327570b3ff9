"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (100 TB / 10^12 rows):
  - Exact dedup is a hash aggregate on a fixed-width md5 fingerprint —
    never on the raw text — so shuffle rows stay narrow. For hot keys
    (e.g. empty/boilerplate pages duplicated millions of times) use the
    salted two-phase variant.
  - MinHash signatures are computed entirely JVM-side with higher-order
    array expressions (no shuffle, no UDF); LSH banding turns the O(n²)
    pair space into per-band equi-joins, which AQE can split on skew.
  - All hash functions are md5-based so results are engine-independent
    (the DuckDB correctness oracle computes identical signatures).

reference: exact-dup pass analyzers/similarity.py:231-249; pairwise
similarity analyzers/similarity.py:102-199 (re-expressed sub-quadratic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reviews_quality_check_spark.functions.text import (
    md5_fingerprint,
    norm_text,
    shingles,
    similarity_ngram_set_from_words,
    tokens,
    whitespace_words,
    word_ngrams,
)

# ---------------------------------------------------------------------------
# Exact deduplication (reference similarity.py:231-249, A1/A2/W1)
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of rows whose normalized text is identical (size >= 2).

    Output: (fingerprint, member_ids sorted, group_size). The group-by key
    is the md5 fingerprint, not the text — narrow shuffle rows at scale.
    """
    return (
        df.select(F.col(id_col), md5_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row of each exact-duplicate group (W1 semantics,
    reference review_analysis.py:545-551 keep-first)."""
    w = Window.partitionBy(md5_fingerprint(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Both duplicate metrics the reference reports (SURVEY §4.1 quirk 7):
    duplicates_found = Σ(group_size - 1) (review_analysis.py:291) and
    duplicate_groups = COUNT(groups) (report_generator.py:71)."""
    groups = exact_dup_groups(df, text_col, id_col)
    return groups.agg(
        F.coalesce(F.sum(F.col("group_size") - 1), F.lit(0)).alias("duplicates_found"),
        F.count(F.lit(1)).alias("duplicate_groups"),
    )


def salted_uniqueness_violations(
    df: DataFrame, key_col: str = "url", salt_buckets: int = 64
) -> DataFrame:
    """Keys appearing more than once, via an explicit two-phase salted
    aggregate (north_rule: skew in url hot keys handled with salting).

    Phase 1 groups by (key, salt) — hot keys spread over ``salt_buckets``
    reducers; phase 2 merges the per-salt partial counts. Equivalent to
    ``groupBy(key).count()`` but immune to single-reducer hot spots.
    Output: (key, cnt) for cnt >= 2.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.select(F.col(key_col).alias("key"), salt.alias("_salt"))
        .groupBy("key", "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy("key")
        .agg(F.sum("_partial").alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# ---------------------------------------------------------------------------


def minhash_signature(text_col: Column | str, num_hashes: int = 16, shingle_k: int = 3) -> Column:
    """MinHash signature as an array of hex-string minima.

    For permutation i, h_i(doc) = min over shingles s of md5(i || ':' || s).
    Computed with pure array expressions — zero shuffle, zero Python.
    Empty shingle sets get a null signature.
    """
    sh = shingles(text_col, shingle_k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )
    return F.when(F.size(sh) > 0, sig)


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys: md5 of the concatenated signature slice per band."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.md5(
            F.concat_ws("|", F.slice(sig, j * rows_per_band + 1, rows_per_band))
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >= 1 LSH band.

    Plan shape: signature (map-only) → explode bands → self equi-join on
    band key → distinct pairs. The join key space is the band hash, so
    the pair blow-up is bounded by bucket sizes, not n².
    """
    rows_per_band = num_hashes // bands
    # Project step-by-step so each intermediate (tokens → shingles → sig)
    # is computed ONCE per row as a column reference; inlining the whole
    # tree into the transform() lambdas makes codegen re-evaluate the
    # token/shingle subtree per hash permutation (~16× the work).
    sh = F.array_distinct(word_ngrams(F.col("__tok"), shingle_k))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("__sh"), lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )
    banded = (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__tok"))
        .select("id", sh.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .select("id", sig.alias("sig"))
        .select("id", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("band"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified with exact Jaccard
    over the reference n-gram set, tiered per similarity.py:194-199.

    Output: (id_a, id_b, similarity, tier) for similarity >= threshold.
    The verify join broadcasts nothing — both sides re-derive n-gram sets
    from the joined texts, keeping the candidate relation narrow (two ids).
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, shingle_k)
    # Pre-compute the n-gram set ONCE per doc (before the pair join): at
    # scale each doc participates in many candidate pairs — deriving the
    # set pair-side would multiply the heavy text work by the fan-out.
    # Also excludes exact duplicates (reference similarity.py:161).
    fp = df.select(
        F.col(id_col).alias("id"),
        md5_fingerprint(text_col).alias("fp"),
        whitespace_words(text_col).alias("__words"),
    ).select(
        "id", "fp", similarity_ngram_set_from_words(F.col("__words"), shingle_k).alias("ngset")
    )
    joined = (
        cands.join(fp.select(F.col("id").alias("id_a"), F.col("fp").alias("fp_a"),
                             F.col("ngset").alias("set_a")), "id_a")
        .join(fp.select(F.col("id").alias("id_b"), F.col("fp").alias("fp_b"),
                        F.col("ngset").alias("set_b")), "id_b")
        .filter(F.col("fp_a") != F.col("fp_b"))
    )
    set_a, set_b = F.col("set_a"), F.col("set_b")
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    sim = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    tier = (
        F.when(sim >= 0.9, F.lit("critical"))
        .when(sim >= 0.8, F.lit("high"))
        .when(sim >= 0.7, F.lit("moderate"))
    )
    return (
        joined.withColumn("similarity", sim)
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity", tier.alias("tier"))
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) near-dup buckets
# ---------------------------------------------------------------------------


def simhash64(text_col: str) -> Column:
    """64-bit SimHash over tokens: bit b of the hash is 1 iff the sum of
    (+1/-1) votes from each token's xxhash64 bit b is positive.

    Pure array expressions (SQL text because shiftleft's Python wrapper
    only takes literal bit counts); deterministic within Spark (xxhash64
    seed 42). Not oracle-matched in DuckDB (different hash) — rows-only.
    """
    sql = f"""
    CASE WHEN size(regexp_extract_all(lower({text_col}), "[a-z0-9']+", 0)) > 0 THEN
      aggregate(
        zip_with(
          transform(sequence(0, 63), b ->
            aggregate(
              transform(regexp_extract_all(lower({text_col}), "[a-z0-9']+", 0), t -> xxhash64(t)),
              0,
              (acc, h) -> acc + IF(shiftright(h, b) & 1L = 1L, 1, -1))),
          sequence(0, 63),
          (v, b) -> IF(v > 0, shiftleft(1L, b), 0L)),
        0L, (acc, x) -> acc | x)
    END
    """
    return F.expr(sql)


def simhash_buckets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    prefix_bits: int = 16) -> DataFrame:
    """Bucket docs by the top ``prefix_bits`` of their SimHash — the
    banding step of SimHash dedup (candidates share a bucket)."""
    sh = simhash64(text_col)
    return (
        df.select(F.col(id_col), sh.alias("simhash"))
        .filter(F.col("simhash").isNotNull())
        .withColumn("bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits))
    )
