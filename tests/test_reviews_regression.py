"""Deterministic regression anchor (the engine's Tech10k analog).

The reference's only regression evidence is a shipped log showing the
same fixed config reproduces 231 mismatches / 53 duplicate removals on
Tech10k across runs (Report/analysis.log:15,41,65-66,90-91). The
engine's anchor: a 10k synthetic reviews fixture (seed=42) must produce
EXACTLY the pinned metric values below, run after run, at any
parallelism. The pins were cross-checked against the pure-Python oracle
at creation time (test_matches_python_oracle re-derives them on a
sample every run).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.sentiment_rules import validate_sentiments
from reviews_quality_check_spark.operators.dedup import duplicate_metrics
from reviews_quality_check_spark.oracle import reference as O
from reviews_quality_check_spark.sources.reviews import synth_reviews

N = 10_000


@pytest.fixture(scope="module")
def reviews(spark):
    return synth_reviews(spark, N).cache()


# pinned anchor values (seed=42, N=10000) — change ONLY with a semantic
# version bump of the rule layer or the fixture generator (the engine's
# analog of the reference's 231-mismatch / 53-removal log anchor)
EXPECTED_MISMATCHES = 5041
EXPECTED_MISMATCHES_BY_LABEL = {"positive": 2545, "negative": 2111, "neutral": 385}
EXPECTED_DUPLICATES_FOUND = 2291
EXPECTED_DUPLICATE_GROUPS = 1818


def test_fixture_shape(reviews):
    assert reviews.count() == N
    dist = {r["sentiment"]: r["n"] for r in
            reviews.groupBy("sentiment").agg(F.count("*").alias("n")).collect()}
    # 45/35/20 +- 2%
    assert abs(dist["positive"] / N - 0.45) < 0.02
    assert abs(dist["negative"] / N - 0.35) < 0.02
    assert abs(dist["neutral"] / N - 0.20) < 0.02


def test_deterministic_across_runs_and_parallelism(reviews, spark):
    v = validate_sentiments(reviews)
    m1 = v.agg(F.sum(F.col("is_mismatch").cast("long"))).collect()[0][0]
    # recompute on a differently-partitioned copy
    v2 = validate_sentiments(reviews.repartition(3))
    m2 = v2.agg(F.sum(F.col("is_mismatch").cast("long"))).collect()[0][0]
    assert m1 == m2
    d1 = duplicate_metrics(reviews, "text", "id").collect()[0]
    d2 = duplicate_metrics(reviews.repartition(7), "text", "id").collect()[0]
    assert (d1["duplicates_found"], d1["duplicate_groups"]) == (
        d2["duplicates_found"], d2["duplicate_groups"]
    )
    # pinned anchors
    assert m1 == EXPECTED_MISMATCHES
    by_label = {
        r["sentiment"]: r["n"]
        for r in v.filter("is_mismatch")
        .groupBy("sentiment").agg(F.count("*").alias("n")).collect()
    }
    assert by_label == EXPECTED_MISMATCHES_BY_LABEL
    assert d1["duplicates_found"] == EXPECTED_DUPLICATES_FOUND
    assert d1["duplicate_groups"] == EXPECTED_DUPLICATE_GROUPS


def test_matches_python_oracle_sample(reviews):
    """Every Spark verdict on a 500-row sample equals the Python oracle
    (full-chain check at fixture scale)."""
    sample = validate_sentiments(reviews.filter(F.col("id") <= 500)).select(
        "id", "text", "sentiment", "domain", "predicted", "confidence", "is_mismatch"
    ).collect()
    assert len(sample) == 500
    for r in sample:
        want = O.validate_sentiment(r["text"], r["sentiment"], r["domain"])
        assert r["predicted"] == want["predicted"], r["id"]
        assert r["confidence"] == pytest.approx(want["confidence"], abs=0), r["id"]
        assert bool(r["is_mismatch"]) == want["is_mismatch"], r["id"]
