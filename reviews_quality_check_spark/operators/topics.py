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

from reviews_quality_check_spark.functions.quality import STOPWORDS
from reviews_quality_check_spark.functions.text import tokens


def _token_df(df: DataFrame, text_col: str, id_col: str, min_tokens: int = 3) -> DataFrame:
    stops = F.array([F.lit(s) for s in STOPWORDS])
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
