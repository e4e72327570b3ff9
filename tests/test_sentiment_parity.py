"""Sentiment rule-chain parity: Spark expressions vs the Python oracle.

Exercises every branch of the reference chain (sentiment.py:399-513):
domain merge, neutral override, confidence adjustments, asymmetric
mismatch rule (SURVEY §4.1 quirks #3-#5), over all 3 labels × both
domains × texts engineered to hit each path.
"""

from __future__ import annotations

import pytest

from reviews_quality_check_spark.functions.sentiment_rules import validate_sentiments
from reviews_quality_check_spark.oracle import reference as O

TEXTS = [
    # surrogate polar predictions
    "good great excellent product, love it",
    "bad terrible awful, hate this",
    "good bad",  # tie -> neutral
    # neutral indicator (substring 'fair' inside 'fairly' = quirk #3)
    "It works fairly well in most cases",
    # contrast marker + >20 words multi-sentence (confidence adjust path)
    "The product is good. However it has problems. " + "word " * 20 + "end.",
    # multiple neutral indicators (ncount>1 -> *1.1 cap)
    "Average and basic, decent but acceptable overall",
    # domain indicators: technology positive
    "innovative and efficient, reliable hardware",
    # domain negative outweighs
    "slow and buggy, outdated and clunky",
    # domain neutral markers dominate
    "standard typical average industry-standard stuff",
    # regex pattern: pros and cons
    "There are pros and cons to this approach",
    # regex: comparison pattern
    "compared to other models this is similar",
    # negation + empty-ish
    "not good at all",
    "plain text without any markers whatsoever",
    "Good.",  # single word sentence — multi_sentence quirk (split len 2)
]

LABELS = ("positive", "negative", "neutral")
DOMAINS = ("technology", "software", None)


@pytest.fixture(scope="module")
def validated(spark):
    rows = []
    rid = 0
    for t in TEXTS:
        for lab in LABELS:
            for dom in DOMAINS:
                rows.append((rid, t, lab, dom))
                rid += 1
    df = spark.createDataFrame(rows, "id long, text string, sentiment string, domain string")
    out = validate_sentiments(df).select(
        "id", "text", "sentiment", "domain",
        "predicted", "confidence", "is_mismatch",
        "has_neutral_indicators", "has_neutral_patterns", "domain_sentiment",
    )
    return {r["id"]: r for r in out.collect()}


def test_full_chain_parity(validated):
    rid = 0
    for t in TEXTS:
        for lab in LABELS:
            for dom in DOMAINS:
                got = validated[rid]
                want = O.validate_sentiment(t, lab, dom)
                ctx = f"id={rid} text={t[:40]!r} label={lab} domain={dom}"
                assert got["predicted"] == want["predicted"], f"pred {ctx}"
                assert got["confidence"] == pytest.approx(want["confidence"], abs=0), (
                    f"conf {ctx}: {got['confidence']} vs {want['confidence']}"
                )
                assert bool(got["is_mismatch"]) == want["is_mismatch"], f"mismatch {ctx}"
                assert bool(got["has_neutral_indicators"]) == want["has_neutral_indicators"], ctx
                assert bool(got["has_neutral_patterns"]) == want["has_neutral_patterns"], ctx
                assert got["domain_sentiment"] == want["domain_sentiment"], f"dsent {ctx}"
                rid += 1


def test_substring_quirk():
    """quirk #3: 'fairly' must trigger indicator 'fair' (substring, not
    token, matching — reference sentiment.py:188-199)."""
    r = O.validate_sentiment("It performs fairly", "positive", None)
    assert r["has_neutral_indicators"] is True
    assert r["predicted"] == "neutral"


def test_asymmetric_mismatch_rule():
    """quirk #5: labeled-neutral uses strict > on the NEUTRAL threshold;
    other labels use >= on the PREDICTED sentiment's threshold."""
    # predicted positive conf 0.98 ('good great excellent love' = 4 hits)
    r = O.validate_sentiment("good great excellent love", "neutral", None)
    assert r["predicted"] == "positive" and r["confidence"] > 0.85
    assert r["is_mismatch"] is True
    # same text labeled negative: mismatch iff conf >= thr(positive)=0.90
    r2 = O.validate_sentiment("good great excellent love", "negative", None)
    assert r2["is_mismatch"] == (r2["confidence"] >= 0.90)
