"""Reference-exact blocked similarity mode (SURVEY §4.1 quirk #1).

The reference computes pairwise similarity ONLY inside 1000-row blocks
(analyzers/similarity.py:56,264-269: the similarity matrix is built
block-diagonally), so pairs whose indices fall in different blocks are
never compared. Reproducing partition-local pass/fail requires this
exact semantics: block_id = floor(idx / block_size) becomes the group
key, and the block conveniently doubles as the north_rule's logical
partition.

Scale shape: per-doc features (fingerprint, <=50-word gate, n-gram set,
normalized embedding) are built ONCE per row as JVM expressions behind
a scale-adaptive spread (single-file sandbox scans plan as one task —
partitioning.spread widens them; production scans pass through), then
the O(B^2) block-local pair scoring runs in ONE vectorized
applyInPandas per block group: Python set intersection for the n-gram
Jaccard and per-dimension-ordered numpy accumulation for the embedding
dot — bit-identical to the previous JVM array_intersect /
zip_with-aggregate fold formulation (r6 measured the interpreted
HOF fold + per-pair array_intersect at ~14 us/pair; the grouped pandas
path is ~2.3x faster end-to-end at sf0.1 and parallel across blocks).
The pair space is n_blocks x B^2, grouped by block (AQE handles
stragglers); B is fixed by the reference contract, so the operator is
linear in n at fixed block size.

The MinHash-LSH path (operators/dedup.py) is the sub-quadratic default;
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
    whitespace_words,
)
from reviews_quality_check_spark.partitioning import spread


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


def _doc_features(df: DataFrame, text_col: str, id_col: str, block_size: int) -> DataFrame:
    """Per-doc features for block-local similarity, computed once per row
    behind a spread: (id, block_id, fp, short, words). The n-gram SET is
    deliberately NOT built here: the char-3-gram construction is an
    interpreted nested-HOF chain (~2s of the old feature stage at sf0.1)
    and its string arrays then cross Arrow — the pandas pair stage
    builds the identical frozensets directly from the words array
    (Python slicing and JVM substring both index CODE POINTS, and the
    locale-sensitive lower/trim/split stays JVM-side in norm_text, so
    set membership is engine-identical — certified by the oracle's
    Jaccard values at three SFs). Rows whose text is NULL are dropped —
    in the join formulation their NULL n-gram set / NULL gate made
    every pair predicate NULL, which the pair filter dropped."""
    return (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("id"),
            F.floor(F.col(id_col) / block_size).alias("block_id"),
            md5_fingerprint_exact(text_col).alias("fp"),
            whitespace_words(text_col).alias("__w"),
        )
        .select(
            "id", "block_id", "fp",
            (F.size(F.col("__w")) <= 50).alias("short"),
            F.col("__w").alias("words"),
        )
        .filter(
            F.col("fp").isNotNull()
            & F.col("short").isNotNull()
            & F.col("words").isNotNull()
        )
    )


def _ngram_set(ws, n: int = 3):
    """Python twin of text.similarity_ngram_set_from_words: every word,
    char n-grams of words >= n chars, word n-grams — as a frozenset
    (the JVM builder's array_distinct makes it a set anyway)."""
    out = set()
    for w in ws:
        lw = len(w)
        for i in range(lw - n + 1):
            out.add(w[i:i + n])
        out.add(w)
    for i in range(len(ws) - n + 1):
        out.add(" ".join(ws[i:i + n]))
    return out


def _tier(sim_col: F.Column) -> F.Column:
    return (
        F.when(sim_col >= 0.9, F.lit("critical"))
        .when(sim_col >= 0.8, F.lit("high"))
        .when(sim_col >= 0.7, F.lit("moderate"))
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
    import pandas as pd

    base = _doc_features(df, text_col, id_col, block_size)
    thr = float(threshold)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        fps = pdf["fp"].to_numpy()
        shorts = pdf["short"].to_numpy()
        sets = [_ngram_set(list(x)) for x in pdf["words"]]
        lens = [len(s) for s in sets]
        bid = int(pdf["block_id"].iloc[0])
        out_a: list[int] = []
        out_b: list[int] = []
        out_s: list[float] = []
        n = len(ids)
        for i in range(n):
            si, li = sets[i], lens[i]
            for j in range(i + 1, n):
                if shorts[i] and shorts[j] and fps[i] == fps[j]:
                    continue
                inter = len(si & sets[j])
                un = li + lens[j] - inter
                # same float64 division as the JVM cast(double)/cast(double)
                s = inter / un if un > 0 else 0.0
                if s >= thr:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_s.append(s)
        return pd.DataFrame(
            {
                "block_id": np.full(len(out_a), bid, dtype="int64"),
                "id_a": np.asarray(out_a, dtype="int64"),
                "id_b": np.asarray(out_b, dtype="int64"),
                "similarity": np.asarray(out_s, dtype="float64"),
            }
        )

    res = base.groupBy("block_id").applyInPandas(
        block_pairs,
        "block_id long, id_a long, id_b long, similarity double",
    )
    return res.select(
        "block_id", "id_a", "id_b", "similarity", _tier(F.col("similarity")).alias("tier")
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

    Scale shape: features once per row (spread map), one equi-join to
    attach the JVM-normalized vector, then block-grouped pandas pair
    scoring. The embedding dot accumulates per-dimension in ascending
    index order across the whole pair block (numpy outer-product
    steps) — the exact float64 op sequence of the previous
    zip_with/aggregate fold and of the oracle's list_reduce, so results
    are bit-identical (same guarantee dot_pandas_udf pins in pytest).

    Output: (block_id, id_a, id_b, embedding_sim, ngram_sim,
    combined_sim, tier, is_duplicate); rows below tier3 are dropped.
    """
    import pandas as pd

    t1, t2, t3 = (float(t) for t in tiers)
    # RAW embeddings travel to the pandas stage; the norm fold and the
    # per-element normalization run vectorized there in the exact float64
    # op order of the old l2_norm / transform(x / n) expressions (per-dim
    # ascending accumulation, then one IEEE division per element) — same
    # values, no interpreted HOF fold on the scan, one exchange less,
    # and half the Arrow bytes (float32 in, not JVM-normalized doubles).
    # Zero-norm vectors are excluded from pairing inside the UDF — the
    # same contract as the old .filter(__n > 0) pre-join.
    base = _doc_features(docs, text_col, id_col, block_size).join(
        emb.select(F.col(vec_id_col).alias("vid"), F.col(vec_col).alias("v")),
        F.col("id") == F.col("vid"),
    ).drop("vid")

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        fps = pdf["fp"].to_numpy()
        shorts = pdf["short"].to_numpy()
        sets = [_ngram_set(list(x)) for x in pdf["words"]]
        lens = [len(s) for s in sets]
        bid = int(pdf["block_id"].iloc[0])
        n = len(ids)
        raw = pdf["v"].to_numpy()
        dims = {len(a) for a in raw if a is not None}
        dim = max(dims) if dims else 0
        wf = np.array(
            [a is not None and len(a) == dim for a in raw], dtype=bool
        )
        v = np.zeros((n, dim), dtype=np.float64)
        if wf.any():
            v[wf] = np.vstack(raw[wf]).astype(np.float64)
        # l2_norm fold order: acc = acc + v_j * v_j, dims ascending
        nrm2 = np.zeros(n, dtype=np.float64)
        for j in range(dim):
            col = v[:, j]
            nrm2 = nrm2 + col * col
        nrm = np.sqrt(nrm2)
        # zero-norm / malformed rows never pair — the old pre-join
        # .filter(l2_norm > 0) contract
        valid = wf & (nrm > 0)
        x = np.zeros_like(v)
        if valid.any():
            x[valid] = v[valid] / nrm[valid, None]
        # per-dimension ordered accumulation: acc[i,k] after step j equals
        # the JVM fold's partial sum over dims 0..j — bit-identical floats
        acc = np.zeros((n, n), dtype=np.float64)
        for j in range(dim):
            col = x[:, j]
            acc += np.multiply.outer(col, col)
        out_a: list[int] = []
        out_b: list[int] = []
        out_e: list[float] = []
        out_ns: list[float] = []
        out_c: list[float] = []
        for i in range(n):
            if not valid[i]:
                continue
            si, li = sets[i], lens[i]
            for j in range(i + 1, n):
                if not valid[j]:
                    continue
                if shorts[i] and shorts[j] and fps[i] == fps[j]:
                    continue
                inter = len(si & sets[j])
                un = li + lens[j] - inter
                nsim = inter / un if un > 0 else 0.0
                esim = acc[i, j]
                comb = (esim + nsim) / 2.0
                if comb >= t3:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_e.append(esim)
                    out_ns.append(nsim)
                    out_c.append(comb)
        return pd.DataFrame(
            {
                "block_id": np.full(len(out_a), bid, dtype="int64"),
                "id_a": np.asarray(out_a, dtype="int64"),
                "id_b": np.asarray(out_b, dtype="int64"),
                "esim": np.asarray(out_e, dtype="float64"),
                "nsim": np.asarray(out_ns, dtype="float64"),
                "comb": np.asarray(out_c, dtype="float64"),
            }
        )

    scored = base.groupBy("block_id").applyInPandas(
        block_pairs,
        "block_id long, id_a long, id_b long, esim double, nsim double, comb double",
    )
    tier = (
        F.when(F.col("comb") >= t1, F.lit("tier1"))
        .when(F.col("comb") >= t2, F.lit("tier2"))
        .when(F.col("comb") >= t3, F.lit("tier3"))
    )
    return scored.select(
        "block_id", "id_a", "id_b",
        F.round("esim", 4).alias("embedding_sim"),
        F.round("nsim", 4).alias("ngram_sim"),
        F.round("comb", 4).alias("combined_sim"),
        tier.alias("tier"),
        (F.col("comb") > dup_threshold).alias("is_duplicate"),
    )
