"""Reference-exact blocked similarity mode (SURVEY §4.1 quirk #1).

The reference computes pairwise similarity ONLY inside 1000-row blocks
(analyzers/similarity.py:56,264-269: the similarity matrix is built
block-diagonally), so pairs whose indices fall in different blocks are
never compared. Reproducing partition-local pass/fail requires this
exact semantics: block_id = floor(idx / block_size) becomes the join
key, and the block conveniently doubles as the north_rule's logical
partition.

Scale shape: an equi-join on block_id with an idx_a < idx_b predicate —
each block joins only against itself, so the pair space is
n_blocks × B², shuffled by block (AQE splits stragglers). The
MinHash-LSH path (operators/dedup.py) is the sub-quadratic default;
this mode exists for bit-exact reference parity.

Also here: the reference's exact-match word-count gate (quirk #2,
similarity.py:57,237): only texts with <= 50 words participate in
EXACT duplicate detection; longer literal duplicates are left to the
similarity path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.text import (
    md5_fingerprint_exact,
    similarity_ngram_set_from_words,
    whitespace_words,
)


def exact_dup_groups_gated(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 50,
) -> DataFrame:
    """Exact-duplicate groups restricted to texts <= max_words whitespace
    words — reference similarity.py:57,237 (quirk #2). Longer literal
    duplicates are deliberately NOT reported here."""
    gated = df.filter(F.size(whitespace_words(text_col)) <= max_words)
    return (
        gated.select(F.col(id_col), md5_fingerprint_exact(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
    )


def blocked_similar_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int = 1000,
    threshold: float = 0.7,
) -> DataFrame:
    """Block-local similar pairs with the reference's n-gram Jaccard and
    tier buckets — pairs across block boundaries are never compared
    (quirk #1), and exact duplicates are excluded from the similarity
    path (similarity.py:161, J2 anti-membership).

    Output: (block_id, id_a, id_b, similarity, tier).

    Precondition: ``id_col`` is a dense 0-based index (the reference
    blocks by POSITION in its text list, similarity.py:264-269; with
    non-dense ids derive a row_number first — documented contract).
    The exact-dup exclusion only applies when BOTH texts are <= 50
    whitespace words (similarity.py:57,161,237): identical texts longer
    than the gate ARE reported as similar pairs (sim 1.0), matching the
    reference."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.floor(F.col(id_col) / block_size).alias("block_id"),
        md5_fingerprint_exact(text_col).alias("fp"),
        whitespace_words(text_col).alias("__w"),
    ).select(
        "id", "block_id", "fp",
        (F.size(F.col("__w")) <= 50).alias("short"),
        similarity_ngram_set_from_words(F.col("__w")).alias("ngset"),
    )
    # Repartition by block BEFORE the self-join: (a) co-locates each
    # block's rows so the pair join is partition-local (the X3 strategy —
    # block id is the unit of work at scale), and (b) the exchange is a
    # materialization barrier, so the expensive per-doc ngram set is
    # computed once per ROW map-side instead of being collapsed into the
    # join output and recomputed once per PAIR (measured ~17x difference).
    base = base.repartition(F.col("block_id"))
    a = base.select(
        F.col("block_id"),
        F.col("id").alias("id_a"),
        F.col("fp").alias("fp_a"),
        F.col("short").alias("short_a"),
        F.col("ngset").alias("set_a"),
        F.size("ngset").alias("n_a"),
    )
    b = base.select(
        F.col("block_id"),
        F.col("id").alias("id_b"),
        F.col("fp").alias("fp_b"),
        F.col("short").alias("short_b"),
        F.col("ngset").alias("set_b"),
        F.size("ngset").alias("n_b"),
    )
    pairs = a.join(b, ["block_id"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & ~(F.col("short_a") & F.col("short_b") & (F.col("fp_a") == F.col("fp_b")))
    )
    # sets are distinct, so |A∪B| = |A|+|B|-|A∩B|: one array op per pair
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.col("n_a") + F.col("n_b") - inter
    sim = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    tier = (
        F.when(sim >= 0.9, F.lit("critical"))
        .when(sim >= 0.8, F.lit("high"))
        .when(sim >= 0.7, F.lit("moderate"))
    )
    return (
        pairs.withColumn("similarity", sim)
        .filter(F.col("similarity") >= threshold)
        .select("block_id", "id_a", "id_b", "similarity", tier.alias("tier"))
    )


def combined_similar_pairs(
    docs: DataFrame,
    emb: DataFrame,
    block_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    dup_threshold: float = 0.92,
    tiers: tuple[float, float, float] = (0.98, 0.92, 0.85),
) -> DataFrame:
    """F11 combined similarity with the reference's exact tier semantics
    (analyzers/similarity.py:167,194-199 + config.py:11,19-23):
    combined = (embedding_cosine + ngram_jaccard) / 2, duplicates at
    combined > 0.92 (strict), tiers by elif chain at >= 0.98 / 0.92 /
    0.85 — a pair lands in exactly one tier. Pairs that are exact
    duplicates among <= 50-word texts are excluded BEFORE scoring
    (similarity.py:161); comparison is block-local (quirk #1).

    ``emb`` supplies the embedding column keyed by ``vec_id_col`` ==
    ``id_col`` (the reference encodes embeddings from the same text
    list; here they arrive as a table).

    Scale shape: block-local equi-join (no cartesian), normalized
    vectors staged behind exchanges so norms/ngram sets build once per
    row, candidate pairs shuffle as narrow (id, double) rows.

    Output: (block_id, id_a, id_b, embedding_sim, ngram_sim,
    combined_sim, tier, is_duplicate); rows below tier3 are dropped.
    """
    from reviews_quality_check_spark.operators.ann import dot, l2_norm

    t1, t2, t3 = tiers
    nv = (
        emb.select(
            F.col(vec_id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            l2_norm(F.col(vec_col)).alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .repartition(F.col("vid"))
        .select(
            "vid",
            F.transform(F.col("v"), lambda x: x.cast("double") / F.col("__n")).alias("nv"),
        )
    )
    base = (
        docs.select(
            F.col(id_col).alias("id"),
            F.floor(F.col(id_col) / block_size).alias("block_id"),
            md5_fingerprint_exact(text_col).alias("fp"),
            whitespace_words(text_col).alias("__w"),
        )
        .select(
            "id", "block_id", "fp",
            (F.size(F.col("__w")) <= 50).alias("short"),
            similarity_ngram_set_from_words(F.col("__w")).alias("ngset"),
        )
        .join(nv, F.col("id") == F.col("vid"))
        .drop("vid")
        .repartition(F.col("block_id"))
    )
    a = base.select(
        "block_id",
        F.col("id").alias("id_a"), F.col("fp").alias("fp_a"),
        F.col("short").alias("short_a"), F.col("ngset").alias("set_a"),
        F.size("ngset").alias("n_a"), F.col("nv").alias("nv_a"),
    )
    b = base.select(
        "block_id",
        F.col("id").alias("id_b"), F.col("fp").alias("fp_b"),
        F.col("short").alias("short_b"), F.col("ngset").alias("set_b"),
        F.size("ngset").alias("n_b"), F.col("nv").alias("nv_b"),
    )
    pairs = a.join(b, ["block_id"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & ~(F.col("short_a") & F.col("short_b") & (F.col("fp_a") == F.col("fp_b")))
    )
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.col("n_a") + F.col("n_b") - inter
    nsim = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    # JVM HOF dot on purpose: this join scores EVERY in-block pair
    # (n_blocks x B^2 — 1.5M pairs at sf0.1), so an Arrow UDF would ship
    # ~2x64 doubles per pair to Python (~1.5 GB) — measured SLOWER than
    # the interpreted fold. The vectorized dot_pandas_udf pays off only
    # on small candidate sets (LSH rerank); an unrolled element_at chain
    # is also slower (giant tree defeats codegen). Measured r3.
    esim = dot(F.col("nv_a"), F.col("nv_b"))
    # two-step projection: deriving comb from the ALIASED esim/nsim makes
    # the zip_with dot product evaluate once per pair. (Building esim and
    # esim+nsim in one select compiled the HOF twice; CollapseProject
    # keeps this split because the alias is multiply-referenced and
    # non-cheap.)
    scored = pairs.select(
        "block_id", "id_a", "id_b",
        esim.alias("esim"), nsim.alias("nsim"),
    ).select(
        "block_id", "id_a", "id_b", "esim", "nsim",
        ((F.col("esim") + F.col("nsim")) / F.lit(2.0)).alias("comb"),
    )
    tier = (
        F.when(F.col("comb") >= t1, F.lit("tier1"))
        .when(F.col("comb") >= t2, F.lit("tier2"))
        .when(F.col("comb") >= t3, F.lit("tier3"))
    )
    return (
        scored.filter(F.col("comb") >= t3)
        .select(
            "block_id", "id_a", "id_b",
            F.round("esim", 4).alias("embedding_sim"),
            F.round("nsim", 4).alias("ngram_sim"),
            F.round("comb", 4).alias("combined_sim"),
            tier.alias("tier"),
            (F.col("comb") > dup_threshold).alias("is_duplicate"),
        )
    )
