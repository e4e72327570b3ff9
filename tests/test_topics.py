"""LDA topic operator: structural checks (distributed Spark ML LDA is
seeded but not bit-stable across environments, so assertions are on
shape/invariants, not term identity)."""

from __future__ import annotations

import math

import pytest

from reviews_quality_check_spark.operators.topics import (
    doc_topic_entropy,
    fit_lda,
    topic_top_terms,
    topics_summary,
)

DOCS = [
    (i, "spark query engine plan optimizer shuffle join " * 3) for i in range(10)
] + [
    (i + 10, "recipe cooking flavor kitchen delicious meal dinner " * 3) for i in range(10)
] + [
    (i + 20, "football match goal player team season league " * 3) for i in range(10)
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_lda_shapes_and_entropy(docs):
    model, cv_model, feats = fit_lda(docs, k=3, max_iter=10)
    topics = topic_top_terms(model, cv_model, top_n=5)
    assert len(topics) == 3
    for t in topics:
        assert len(t["terms"]) == 5
        assert all(w >= 0 for w in t["weights"])
        assert t["weights"] == sorted(t["weights"], reverse=True)

    ent = doc_topic_entropy(model, feats).collect()
    assert len(ent) == 30
    for r in ent:
        assert 0.0 <= r["entropy"] <= math.log2(3) + 1e-9


def test_topics_summary_table(docs):
    out = topics_summary(docs, k=3, top_n=4)
    rows = out.collect()
    assert len(rows) == 12
    ranks = {(r["topic_id"], r["rank"]) for r in rows}
    assert len(ranks) == 12  # (topic, rank) unique


def test_min_token_gate(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b"), (3, "solid text with enough tokens here")],
        "doc_id long, text string",
    )
    from reviews_quality_check_spark.operators.topics import _token_df

    kept = _token_df(df, "text", "doc_id").select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [3]  # <3 lemmas dropped (topic.py:175)


def test_umass_hand_computed(spark):
    """u_mass vs a by-hand fixture: D(a)=4, D(b)=2, D(c)=2; pairs
    (b,a)->log(3/4), (c,a)->log(3/4), (c,b)->log(2/2)=0."""
    import math

    from reviews_quality_check_spark.operators.topics import umass_coherence

    tok = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "b", "c"]), (3, ["a", "c"]), (4, ["a"])],
        "doc_id long, tokens array<string>",
    )
    top = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b"), (0, 3, "c")], "topic_id int, rank int, word string"
    )
    row = umass_coherence(tok, top).collect()[0]
    want = (2 * round(math.log(3 / 4), 6) + 0.0) / 3 + 1e-9
    assert row["n_pairs"] == 3
    assert row["u_mass"] == round(want, 4)


def test_phrase_merge_greedy_and_vocab_change(spark):
    """Phraser greedy left-to-right: a token consumed by a merge cannot
    start the next merge; merged tokens enter the downstream vocabulary."""
    from pyspark.ml.feature import CountVectorizer

    from reviews_quality_check_spark.operators.topics import merge_phrases, phrase_scores

    docs = spark.createDataFrame(
        [(i, "xx yy zz") for i in range(6)], "doc_id long, text string"
    )
    scores = {
        (r["word_a"], r["word_b"]): r["merged"]
        for r in phrase_scores(docs, min_count=1, threshold=0.1).collect()
    }
    assert scores[("xx", "yy")] and scores[("yy", "zz")]
    merged = merge_phrases(docs, min_count=1, threshold=0.1)
    toks = merged.orderBy("doc_id").collect()[0]["tokens"]
    assert toks == ["xx_yy", "zz"]  # yy consumed; (yy, zz) cannot fire
    cv = CountVectorizer(inputCol="tokens", outputCol="f").fit(merged)
    assert "xx_yy" in cv.vocabulary and "yy" not in cv.vocabulary


def test_cv_coherence_properties(spark):
    """c_v sanity: a topic whose words always co-occur has identical NPMI
    context vectors -> every cosine is 1.0 -> c_v = 1.0; a topic mixing
    co-occurring and never-co-occurring words scores strictly lower."""
    from reviews_quality_check_spark.operators.topics import cv_coherence

    # a,b always together in 3 of 6 docs; c lives alone in the others
    tok = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["a", "b"]),
         (4, ["c"]), (5, ["c"]), (6, ["c"])],
        "doc_id long, tokens array<string>",
    )
    perfect = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b")], "topic_id int, rank int, word string"
    )
    mixed = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "c")], "topic_id int, rank int, word string"
    )
    got = {r["topic_id"]: r["c_v"] for r in
           cv_coherence(tok, perfect.unionAll(mixed)).collect()}
    assert got[0] == pytest.approx(1.0, abs=1e-6)
    assert got[1] < got[0]


def test_dictionary_extremes_gensim_parity(spark):
    """dictionary_extremes reproduces gensim filter_extremes semantics:
    hand-computed doc frequencies, adaptive caps, and the <50 fallback
    (which always fires at this corpus size: primary keeps < 50 words)."""
    from reviews_quality_check_spark.operators.topics import dictionary_extremes

    # 10 docs; 'common' in all 10 (df=10), 'often' in 8, 'rare' in 1
    rows = []
    for i in range(10):
        words = ["common", "alpha%d" % i, "beta%d" % i, "gamma%d" % i]
        if i < 8:
            words.append("often")
        if i == 0:
            words.append("rare")
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["word"]: r["doc_freq"] for r in dictionary_extremes(df).collect()}
    # corpus_size=10 < 5000 -> (no_below=2, no_above=0.8): primary keeps
    # only 'often' (df=8 <= int(0.8*10)=8; 'common' df=10 > 8; singletons
    # df=1 < 2) -> 1 < 50 -> fallback (2, 0.95): cap int(0.95*10)=9,
    # keeps 'often' only again ('common' 10 > 9, singletons < 2)
    assert kept == {"often": 8}


def test_doc_term_matrix_counts(spark):
    from reviews_quality_check_spark.operators.topics import doc_term_matrix

    rows = [(i, "apple apple banana cherry dropme") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every word df=10, corpus 10 docs: primary cap int(0.8*10)=8 keeps
    # nothing -> fallback cap int(0.95*10)=9 keeps nothing either ->
    # empty matrix (all words are in every doc)
    assert doc_term_matrix(df).count() == 0
    rows = [(i, "apple apple banana cherry") for i in range(10)] + [
        (10 + j, "kiwi mango papaya guava lime") for j in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 20 docs, each word df=10 <= int(0.95*20)=19 (fallback fires since
    # primary cap int(0.8*20)=16 keeps all 8 words -> 8 < 50 -> fallback)
    out = doc_term_matrix(df).collect()
    by = {(r["doc_id"], r["word"]): r["n"] for r in out}
    assert by[(0, "apple")] == 2 and by[(0, "banana")] == 1
    assert (0, "kiwi") not in by and (10, "kiwi")in by


def test_entropy_and_coherence_exprs_match_row_formulas(spark):
    """The registered doc_topic_entropy / topic_coherence_weighted
    queries compute entropy and Σw_i·w_{i+1}/(k-1) relationally; this
    pins the operator HOF expressions (used on real LDA topicDistribution
    vectors) to the same arithmetic on shared weight vectors."""
    import pyspark.sql.functions as F

    from reviews_quality_check_spark.operators.topics import topic_coherence_expr

    vecs = [
        (1, [0.5, 0.3, 0.2]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.25, 0.25, 0.25, 0.25]),
        (4, [0.9]),
    ]
    df = spark.createDataFrame(vecs, "doc_id long, p array<double>")
    ent = F.aggregate(
        F.col("p"), F.lit(0.0),
        lambda acc, x: acc - F.when(x > 1e-12, x * F.log2(x)).otherwise(F.lit(0.0)),
    )
    got = {
        r["doc_id"]: (r["e"], r["c"])
        for r in df.select(
            "doc_id", ent.alias("e"), topic_coherence_expr(F.col("p")).alias("c")
        ).collect()
    }
    import math

    for doc_id, p in vecs:
        e_ref = -sum(x * math.log2(x) for x in p if x > 1e-12)
        k = len(p)
        c_ref = 0.0 if k < 2 else sum(
            p[i] * p[i + 1] for i in range(k - 1)
        ) / (k - 1)
        assert abs(got[doc_id][0] - e_ref) < 1e-12
        assert abs(got[doc_id][1] - c_ref) < 1e-12


def test_lda_topic_report_end_to_end(docs):
    """Full pipeline composition: seeded fit -> top terms -> u_mass +
    c_v per fitted topic (the reference's report output shape)."""
    from reviews_quality_check_spark.operators.topics import lda_topic_report

    out = lda_topic_report(docs, k=3, top_n=4, max_iter=10, min_df=1.0, max_df=1e9)
    rows = out.collect()
    assert len(rows) == 12  # 3 topics x 4 ranks
    for r in rows:
        assert r["u_mass"] is not None and r["c_v"] is not None
        # perfectly co-occurring topic words give log((D+1)/D) > 0 per
        # pair — with D=10 docs that is log(11/10)=0.0953, the maximum
        assert r["u_mass"] <= 0.1
