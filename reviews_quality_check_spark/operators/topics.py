"""Topic modeling: distributed LDA over the canonical tokenizer.

Replaces the reference's gensim LdaMulticore pipeline
(/root/reference/analyzers/topic.py:219-251; duplicate implementation
review_analysis.py:383-410) with Spark ML's natively distributed LDA:

  tokens → stopword filter → min-token gate (topic.py:175) →
  CountVectorizer(minDF/maxDF = dictionary filter_extremes,
  topic.py:187-199) → LDA(seed=42 ≙ random_state=42, topic.py:233)

plus the derived metrics the reference reports: top-n terms per topic
(topic.py:317-327, W3) and mean doc-topic entropy
(topic.py:345-353, A11/F25) — the entropy is a pure higher-order
Column expression over the topicDistribution vector.

Determinism: LDA is seeded; 'online' optimizer results depend on data
partitioning, so reference-matching runs use optimizer='em' (exact
same result for a fixed input regardless of partitioning is NOT
guaranteed by either — treat topic outputs as rows-only checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.arrays import lit_array_str

from reviews_quality_check_spark.functions.quality import STOPWORDS
from reviews_quality_check_spark.functions.text import tokens


def _token_df(df: DataFrame, text_col: str, id_col: str, min_tokens: int = 3) -> DataFrame:
    stops = lit_array_str(STOPWORDS)
    tok = F.filter(tokens(text_col), lambda t: ~F.array_contains(stops, t))
    return (
        df.select(F.col(id_col).alias("doc_id"), tok.alias("tokens"))
        .filter(F.size("tokens") >= min_tokens)  # reference topic.py:175
    )


def fit_lda(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_iter: int = 20,
    vocab_size: int = 10000,
    min_df: float = 2.0,
    max_df: float = 0.5,
    seed: int = 42,
):
    """Fit CountVectorizer + LDA; returns (lda_model, cv_model, features_df)."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = _token_df(df, text_col, id_col)
    cv = CountVectorizer(
        inputCol="tokens", outputCol="features",
        vocabSize=vocab_size, minDF=min_df, maxDF=max_df,
    )
    cv_model = cv.fit(toks)
    feats = cv_model.transform(toks)
    lda = LDA(k=k, maxIter=max_iter, seed=seed, optimizer="em", featuresCol="features")
    model = lda.fit(feats)
    return model, cv_model, feats


def topic_top_terms(model, cv_model, top_n: int = 10) -> list[dict]:
    """Top-n (term, weight) per topic — reference topic.py:317-327."""
    vocab = cv_model.vocabulary
    rows = model.describeTopics(top_n).collect()
    out = []
    for r in rows:
        out.append(
            {
                "topic_id": r["topic"],
                "terms": [vocab[i] for i in r["termIndices"]],
                "weights": [float(w) for w in r["termWeights"]],
            }
        )
    return out


def doc_topic_entropy(model, feats: DataFrame) -> DataFrame:
    """Per-doc Shannon entropy (log2, eps-guarded) of the topic mixture —
    reference topic.py:345-353 — plus the corpus mean."""
    from pyspark.ml.functions import vector_to_array

    dist = model.transform(feats).select(
        "doc_id", vector_to_array("topicDistribution").alias("p")
    )
    ent = F.aggregate(
        F.col("p"),
        F.lit(0.0),
        lambda acc, x: acc - F.when(x > 1e-12, x * F.log2(x)).otherwise(F.lit(0.0)),
    )
    return dist.select("doc_id", ent.alias("entropy"))


def topic_coherence_expr(weights: Column) -> Column:
    """F26 weighted pairwise coherence — reference
    review_analysis.py:473-483: Σ w_i·w_{i+1} / (k-1); 0.0 when k < 2.
    Pure higher-order expression over the weights array."""
    k = F.size(weights)
    pair_sum = F.aggregate(
        F.zip_with(
            F.slice(weights, 1, F.greatest(k - 1, F.lit(1))),
            F.slice(weights, 2, F.greatest(k - 1, F.lit(1))),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(k < 2, F.lit(0.0)).otherwise(pair_sum / (k - 1).cast("double"))


def topics_summary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 5, top_n: int = 10, **lda_kwargs) -> DataFrame:
    """One row per (topic, rank): topic_id, rank, term, weight — the
    engine's W3 'top terms per topic' output table."""
    model, cv_model, feats = fit_lda(df, text_col, id_col, k=k, **lda_kwargs)
    spark = df.sparkSession
    rows = []
    for t in topic_top_terms(model, cv_model, top_n):
        for rank, (term, w) in enumerate(zip(t["terms"], t["weights"]), 1):
            rows.append((t["topic_id"], rank, term, float(w)))
    return spark.createDataFrame(rows, "topic_id int, rank int, term string, weight double")


# ---------------------------------------------------------------------------
# P6/B4 deterministic halves: gensim Dictionary.filter_extremes + doc2bow
# (reference topic.py:186-200) — the parts of the LDA pipeline that are
# closed-form and therefore cross-engine oracle-able. The model fit itself
# (fit_lda above) stays a seeded rows-only / pytest check.
# ---------------------------------------------------------------------------


def _extremes_filter(df: DataFrame, dfreq: DataFrame, n_docs: DataFrame) -> DataFrame:
    """filter_extremes threshold logic over prebuilt doc-frequency and
    doc-count frames — shared so doc_term_matrix can derive BOTH from
    its per-(doc, word) counts shuffle (one tokenization pass; the
    second consumer hits ReusedExchange, not a second text scan —
    tokenization is the dominant per-row cost at web scale).

    ``dfreq``: (word, doc_freq). ``n_docs``: 1 row (n_docs) = docs
    surviving the >=3-token gate."""
    corpus_size = df.select(F.count(F.lit(1)).alias("n_total"))
    scalars = corpus_size.crossJoin(n_docs)
    nb1 = F.when(F.col("n_total") < 5000, F.lit(2)).otherwise(F.lit(3))
    na1 = F.when(F.col("n_total") < 5000, F.lit(0.8)).otherwise(F.lit(0.7))
    scalars = scalars.select(
        "n_total",
        "n_docs",
        nb1.alias("nb1"),
        F.floor(na1 * F.col("n_docs")).cast("long").alias("cap1"),
        F.floor(F.lit(0.95) * F.col("n_docs")).cast("long").alias("cap2"),
    )
    annotated = dfreq.crossJoin(F.broadcast(scalars))
    primary_kept = annotated.filter(
        (F.col("doc_freq") >= F.col("nb1")) & (F.col("doc_freq") <= F.col("cap1"))
    )
    n_primary = primary_kept.select(F.count(F.lit(1)).alias("n_primary"))
    use_fallback = F.col("n_primary") < 50
    return (
        annotated.crossJoin(F.broadcast(n_primary))
        .filter(
            F.when(
                use_fallback,
                (F.col("doc_freq") >= 2) & (F.col("doc_freq") <= F.col("cap2")),
            ).otherwise(
                (F.col("doc_freq") >= F.col("nb1"))
                & (F.col("doc_freq") <= F.col("cap1"))
            )
        )
        .select("word", "doc_freq")
    )


def dictionary_extremes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The reference's adaptive dictionary pruning (topic.py:186-199):

      corpus_size = total docs (BEFORE the >=3-token gate);
      n_docs      = docs surviving the gate (gensim Dictionary.num_docs);
      (no_below, no_above) = (2, 0.8) if corpus_size < 5000 else (3, 0.7);
      keep words with  no_below <= docfreq <= int(no_above * n_docs);
      if fewer than 50 words survive, refilter with (2, 0.95).

    gensim's keep_n default (100000) is a no-op at every vocabulary size
    this corpus can produce and is documented rather than modeled.
    Both the adaptive branch and the <50 fallback are evaluated inside
    the plan (scalar broadcast joins), so the same query is correct at
    every scale factor — including sf0.1 where corpus_size == 5000 flips
    the branch to (3, 0.7).

    Output: (word, doc_freq) for the kept vocabulary.
    """
    from reviews_quality_check_spark.operators.pinning import pin

    toks = _token_df(df, text_col, id_col)
    # single-pass shape: a sentinel "word" ('\x00' — unreachable through
    # the tokenizer) is appended per doc, so ONE explode->groupBy shuffle
    # yields both the per-word doc frequencies and (as the sentinel's
    # frequency) the surviving-doc count. The vocabulary-sized result is
    # PINNED before its (filter-pushdown-prone) consumers read it —
    # without the pin, Catalyst pushes the word==sentinel /
    # word!=sentinel predicates below the aggregate into per-branch
    # scans and the corpus is tokenized once per consumer (measured
    # 1.01s vs 0.77s pinned at sf0.1). checkpoint_dir upgrades the pin
    # to reliable storage (operators/pinning.py).
    sentinel = "\x00"
    hits = toks.select(
        F.explode(
            F.concat(F.array_distinct("tokens"), F.array(F.lit(sentinel)))
        ).alias("word")
    )
    dfreq0 = pin(
        hits.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq")),
        checkpoint_dir,
    )
    n_docs = dfreq0.filter(F.col("word") == sentinel).select(
        F.col("doc_freq").alias("n_docs")
    )
    dfreq = dfreq0.filter(F.col("word") != sentinel)
    return _extremes_filter(df, dfreq, n_docs)


def doc_term_matrix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """gensim doc2bow over the pruned vocabulary (topic.py:200): one row
    per (doc_id, word) with the in-doc term count, restricted to words
    kept by :func:`dictionary_extremes`. This IS the LDA input corpus —
    certifying it certifies everything deterministic upstream of the
    sampler. Scale shape: ONE tokenization pass feeds both the doc-freq
    pruning and the per-doc counts (explode -> count), then a broadcast
    semi-join on the (tiny) kept vocabulary."""
    toks = _token_df(df, text_col, id_col)
    counts = (
        toks.select("doc_id", F.explode("tokens").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # doc_freq(word) == #(doc_id, word) rows and n_docs == #distinct
    # doc_id — both derivable from the counts shuffle itself, so the
    # pruning consumers hit ReusedExchange instead of re-tokenizing
    dfreq = counts.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = counts.select(F.count_distinct("doc_id").alias("n_docs"))
    kept = _extremes_filter(df, dfreq, n_docs).select("word")
    return counts.join(F.broadcast(kept), "word").select("doc_id", "word", "n")


# ---------------------------------------------------------------------------
# B6: gensim-Phrases bigram scoring + greedy merge (topic.py:134-143)
# ---------------------------------------------------------------------------


def phrase_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    threshold: float = 100.0,
) -> DataFrame:
    """Bigram phrase scores with gensim Phrases' original_scorer
    (reference topic.py:140: Phrases(texts, min_count=5, threshold=100)):

        score(a, b) = (count(ab) - min_count) / count(a) / count(b) * |V|

    over stopword-filtered token streams; a bigram is ``merged`` when
    score > threshold AND count(ab) >= min_count. Pure counting
    aggregations — no UDF, fully SQL-mirrorable.

    Output: (word_a, word_b, pair_count, score, merged) for bigrams with
    pair_count >= min_count."""
    toks = _token_df(df, text_col, id_col)
    uni = (
        toks.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab_n = uni.select(F.count(F.lit(1)).alias("v"))
    big = (
        toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("tokens"), 1, F.greatest(F.size("tokens") - 1, F.lit(0))),
                    F.slice(F.col("tokens"), 2, F.greatest(F.size("tokens") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("wa"), b.alias("wb")),
                )
            ).alias("p")
        )
        .select(F.col("p.wa").alias("word_a"), F.col("p.wb").alias("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    ua = uni.select(F.col("w").alias("word_a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("word_b"), F.col("c").alias("cb"))
    score = (
        (F.col("pair_count") - F.lit(min_count)).cast("double")
        / F.col("ca")
        / F.col("cb")
        * F.col("v")
    )
    return (
        big.join(ua, "word_a")
        .join(ub, "word_b")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "word_a",
            "word_b",
            "pair_count",
            score.alias("score"),
            (score > threshold).alias("merged"),
        )
    )


def merge_phrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    threshold: float = 100.0,
    delimiter: str = "_",
) -> DataFrame:
    """Apply the Phraser transform: greedy left-to-right single-pass
    merge of scoring bigrams into 'a_b' tokens (gensim Phraser
    semantics: a token consumed by a merge cannot start the next one).

    The phrase table (bounded: bigrams passing min_count+threshold) is
    collected to the driver and inlined as a literal array — the same
    model-materialization step as gensim's Phraser(bigram) / the IVF
    centroid collect; the transform itself is a pure fold expression.

    Output: (doc_id, tokens) with merged token arrays."""
    merged_rows = (
        phrase_scores(df, text_col, id_col, min_count, threshold)
        .filter("merged")
        .select(F.concat_ws(delimiter, "word_a", "word_b").alias("m"))
        .collect()
    )
    phrase_set = lit_array_str([r["m"] for r in merged_rows])

    toks = _token_df(df, text_col, id_col)

    def step(acc, t):
        cand = F.concat_ws(delimiter, acc.getField("prev"), t)
        can_merge = ~acc.getField("prev").isNull() & F.array_contains(phrase_set, cand)
        return F.struct(
            F.when(can_merge, F.concat(acc.getField("out"), F.array(cand)))
            .when(acc.getField("prev").isNull(), acc.getField("out"))
            .otherwise(F.concat(acc.getField("out"), F.array(acc.getField("prev"))))
            .alias("out"),
            F.when(can_merge, F.lit(None).cast("string")).otherwise(t).alias("prev"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    folded = F.aggregate(
        F.col("tokens"),
        init,
        step,
        lambda acc: F.when(
            acc.getField("prev").isNull(), acc.getField("out")
        ).otherwise(F.concat(acc.getField("out"), F.array(acc.getField("prev")))),
    )
    return toks.select("doc_id", folded.alias("tokens"))


# ---------------------------------------------------------------------------
# B5: u_mass coherence as a closed-form doc-frequency aggregation
# (reference topic.py:253-273 via gensim CoherenceModel(coherence='u_mass'))
# ---------------------------------------------------------------------------


def umass_coherence(
    tok_df: DataFrame,
    top_words: DataFrame,
) -> DataFrame:
    """u_mass topic coherence, no UDF: for a ranked word list per topic,
    mean over ordered pairs (w_i lower-ranked, w_j higher-ranked) of
    log((D(w_i, w_j) + 1) / D(w_j)), D = document frequencies.

    ``tok_df``: (doc_id, tokens array<string>). ``top_words``: (topic_id,
    rank, word) — rank 1 = highest. Missing co-occurrences count as
    D=0 (score log(1/D(w_j))), exactly gensim's s_one_pre segmentation.

    Cross-engine determinism: per-pair round(6) before the exact decimal
    sum, one double division, +1e-9 nudge, round(4) — the _avg4 pattern.

    Output: (topic_id, n_pairs, u_mass)."""
    from reviews_quality_check_spark.operators.pinning import pin

    # hits feeds dfreq and BOTH pair-join sides; pinned per-invocation so
    # the tokenize/explode/broadcast-join runs once (r6)
    hits = pin(
        tok_df.select("doc_id", F.explode(F.array_distinct("tokens")).alias("word"))
        .join(F.broadcast(top_words), "word")
        .select("topic_id", "rank", "word", "doc_id"),
        None,
    )
    dfreq = hits.groupBy("topic_id", "rank", "word").agg(
        F.count(F.lit(1)).alias("d")
    )
    a = hits.select("topic_id", F.col("rank").alias("ri"), F.col("word").alias("wi"), "doc_id")
    b = hits.select("topic_id", F.col("rank").alias("rj"), F.col("word").alias("wj"), "doc_id")
    co = (
        a.join(b, ["topic_id", "doc_id"])
        .filter(F.col("ri") > F.col("rj"))
        .groupBy("topic_id", "ri", "rj")
        .agg(F.count(F.lit(1)).alias("dij"))
    )
    # full ordered-pair grid so zero-co-occurrence pairs score log(1/D(wj))
    ta = top_words.select("topic_id", F.col("rank").alias("ri"))
    tb = top_words.select("topic_id", F.col("rank").alias("rj"), F.col("word").alias("wj"))
    grid = (
        ta.join(tb, "topic_id")
        .filter(F.col("ri") > F.col("rj"))
        .join(co, ["topic_id", "ri", "rj"], "left")
        .join(
            dfreq.select("topic_id", F.col("rank").alias("rj"), F.col("d").alias("dj")),
            ["topic_id", "rj"],
        )
    )
    pair_score = F.log(
        (F.coalesce(F.col("dij"), F.lit(0)) + F.lit(1)).cast("double")
        / F.col("dj").cast("double")
    )
    return (
        grid.groupBy("topic_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.round(pair_score, 6).cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
                + F.lit(1e-9),
                4,
            ).alias("u_mass"),
        )
    )


def cv_coherence(
    tok_df: DataFrame,
    top_words: DataFrame,
    eps: float = 1e-12,
) -> DataFrame:
    """c_v topic coherence (Roeder/Both/Hinneburg 2015; reference reports
    it via gensim CoherenceModel, topic.py:253-273): NPMI context vectors
    per topic word, cosine of each word's vector against the summed
    topic vector, mean over words.

    Probability estimation uses boolean DOCUMENT contexts (P = doc-freq /
    n_docs). gensim's default estimator is a 110-token boolean sliding
    window; with web-scale docs the document estimator is the same
    family and keeps the whole metric a closed-form doc-frequency
    aggregation — the deviation is documented, not hidden. No UDF.

    Cross-engine determinism: every float sum (vector sums, dot
    products, norms) quantizes per term (round 6) into an exact decimal
    sum, so aggregation order cannot change results.

    Input shapes as umass_coherence. Output: (topic_id, n_words, c_v).
    """
    n_docs = tok_df.select(
        F.count(F.lit(1)).cast("double").alias("__nd")
    )
    from reviews_quality_check_spark.operators.pinning import pin

    hits = pin(
        tok_df.select("doc_id", F.explode(F.array_distinct("tokens")).alias("word"))
        .join(F.broadcast(top_words), "word")
        .select("topic_id", "rank", "doc_id"),
        None,
    )
    a = hits.select("topic_id", F.col("rank").alias("ri"), "doc_id")
    b = hits.select("topic_id", F.col("rank").alias("rj"), "doc_id")
    co = (
        a.join(b, ["topic_id", "doc_id"])
        .groupBy("topic_id", "ri", "rj")
        .agg(F.count(F.lit(1)).alias("dij"))  # diagonal = D(w_i)
    )
    dfreq = hits.groupBy("topic_id", "rank").agg(F.count(F.lit(1)).alias("d"))
    ta = top_words.select("topic_id", F.col("rank").alias("ri"))
    tb = top_words.select("topic_id", F.col("rank").alias("rj"))
    grid = (
        ta.join(tb, "topic_id")  # full ordered grid incl. diagonal
        .join(co, ["topic_id", "ri", "rj"], "left")
        .join(dfreq.select("topic_id", F.col("rank").alias("ri"), F.col("d").alias("di")), ["topic_id", "ri"])
        .join(dfreq.select("topic_id", F.col("rank").alias("rj"), F.col("d").alias("dj")), ["topic_id", "rj"])
        .crossJoin(F.broadcast(n_docs))
    )
    pij = F.coalesce(F.col("dij"), F.lit(0)).cast("double") / F.col("__nd")
    pi = F.col("di").cast("double") / F.col("__nd")
    pj = F.col("dj").cast("double") / F.col("__nd")
    npmi = F.log((pij + F.lit(eps)) / (pi * pj)) / -F.log(pij + F.lit(eps))
    npmi_rows = grid.select(
        "topic_id", "ri", "rj", F.round(npmi, 6).alias("npmi")
    ).repartition("topic_id")

    def dsum(col):  # order-independent float sum
        return F.sum(F.round(col, 6).cast("decimal(28,10)")).cast("double")

    wsum = npmi_rows.groupBy("topic_id", "rj").agg(dsum(F.col("npmi")).alias("wsum"))
    joined = npmi_rows.join(wsum, ["topic_id", "rj"])
    per_word = joined.groupBy("topic_id", "ri").agg(
        dsum(F.col("npmi") * F.col("wsum")).alias("num"),
        dsum(F.col("npmi") * F.col("npmi")).alias("den1"),
    )
    den2 = wsum.groupBy("topic_id").agg(
        dsum(F.col("wsum") * F.col("wsum")).alias("den2")
    )
    scores = per_word.join(den2, "topic_id").select(
        "topic_id",
        (F.col("num") / (F.sqrt(F.col("den1")) * F.sqrt(F.col("den2")))).alias("score"),
    )
    return scores.groupBy("topic_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(
            dsum(F.col("score")) / F.count(F.lit(1)) + F.lit(1e-9), 4
        ).alias("c_v"),
    )


def lda_topic_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    top_n: int = 4,
    **lda_kwargs,
) -> DataFrame:
    """The full reference topic pipeline composed end-to-end (gensim
    path topic.py:219-273): seeded distributed LDA fit → top-n terms
    per topic → per-topic u_mass AND c_v coherence computed closed-form
    over the fitted top words. Model-fit weights make this rows-only /
    pytest territory (never registered as a driver query); the
    deterministic halves are separately driver-certified
    (queries.lda_dictionary_extremes etc.)."""
    terms = topics_summary(df, text_col, id_col, k=k, top_n=top_n, **lda_kwargs)
    top_words = terms.select("topic_id", "rank", F.col("term").alias("word"))
    toks = _token_df(df, text_col, id_col)
    um = umass_coherence(toks, top_words)
    cv = cv_coherence(toks, top_words)
    return (
        terms.join(um.select("topic_id", "u_mass"), "topic_id", "left")
        .join(cv.select("topic_id", "c_v"), "topic_id", "left")
        .orderBy("topic_id", "rank")
    )
