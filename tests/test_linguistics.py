"""F26/F27 linguistics + B2 scorer-UDF tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.udfs import make_scorer_udf
from reviews_quality_check_spark.operators.linguistics import (
    grammar_checks,
    linguistic_quality,
    sentence_flow,
)
from reviews_quality_check_spark.operators.topics import topic_coherence_expr
from reviews_quality_check_spark.oracle import reference as O

TEXTS = [
    "Good flow here. Another sentence follows. And one more!",
    "bad flow here. no capitals follow. still none.",
    "Mixed case. some lower. Then Upper again!",
    "single sentence only",
    "",
    "Trailing fragment without punct. then this",
    "Exclaim! Question? Statement.",
]


def test_sentence_flow_matches_oracle(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "i long, text string")
    got = {r["i"]: r["f"] for r in df.select("i", sentence_flow("text").alias("f")).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == pytest.approx(O.sentence_flow(t), abs=1e-12), f"{i}: {t!r}"


def test_flow_bounds_and_quality(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "i long, text string")
    rows = df.select(
        sentence_flow("text").alias("f"), linguistic_quality("text").alias("q")
    ).collect()
    for r in rows:
        assert 0.5 <= r["f"] <= 1.0
        assert 0.0 <= r["q"] <= 1.0


def test_topic_coherence_expr(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 0.3, 0.2]), (2, [1.0]), (3, [])],
        "i long, w array<double>",
    )
    got = {r["i"]: r["c"] for r in df.select("i", topic_coherence_expr(F.col("w")).alias("c")).collect()}
    assert got[1] == pytest.approx(O.topic_coherence([0.5, 0.3, 0.2]))
    assert got[2] == 0.0 and got[3] == 0.0


def test_scorer_udf_matches_expression_surrogate(spark):
    """The Arrow-batched surrogate scorer must agree with the Column-
    expression surrogate (same formula, two implementations)."""
    from reviews_quality_check_spark.functions.sentiment_rules import surrogate_score
    from reviews_quality_check_spark.functions.text import tokens

    texts = [
        "good great product", "bad awful thing", "neutral words only",
        "good bad good bad", "love love love hate",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    scorer = make_scorer_udf("surrogate")
    pred, conf = surrogate_score(F.lower(F.col("text")), tokens("text"))
    rows = df.select(
        "i",
        scorer(F.col("text")).alias("udf"),
        pred.alias("expr_label"),
        conf.alias("expr_conf"),
    ).collect()
    for r in rows:
        assert r["udf"]["label"] == r["expr_label"], r["i"]
        assert r["udf"]["confidence"] == pytest.approx(r["expr_conf"], abs=1e-12)


def test_grammar_checks_runs_without_tagger_libs(spark):
    """F28 no longer needs spaCy/TextBlob: the mini-tagger is pure
    Column expressions."""
    df = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    rows = grammar_checks(df).collect()
    assert rows[0]["grammar_issues"] == 0 and rows[0]["grammar_score"] == 1.0


def test_grammar_rules_fixture(spark):
    """The three reference rules (linguistics.py:304-326) on hand-built
    sentences: NN+VBP, NNS+VBZ agreement, a-before-vowel."""
    from reviews_quality_check_spark.operators.linguistics import grammar_checks

    rows = [
        (1, "The device work."),            # device(NN) work(VBP) -> 1
        (2, "The devices works."),          # devices(NNS) works(VBZ) -> 1
        (3, "I bought a orange device."),   # a + orange -> 1
        (4, "The device works."),           # NN + VBZ -> fine
        (5, "An ordinary purchase."),       # clean
        (6, ""),                            # blank -> 0 issues, score 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in grammar_checks(df).collect()}
    assert got[1]["grammar_issues"] == 1
    assert got[2]["grammar_issues"] == 1
    assert got[3]["grammar_issues"] == 1
    assert got[4]["grammar_issues"] == 0
    assert got[5]["grammar_issues"] == 0
    assert got[6]["grammar_issues"] == 0 and got[6]["grammar_score"] == 1.0
    # score = clamp(1 - issues/words): doc 1 has 3 whitespace words
    assert got[1]["grammar_score"] == pytest.approx(1 - 1 / 3)
