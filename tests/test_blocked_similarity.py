"""Reference-exact blocked similarity (SURVEY §4.1 quirks #1 and #2)."""

from __future__ import annotations

import pytest

from reviews_quality_check_spark.operators.similarity_blocked import (
    blocked_similar_pairs,
    exact_dup_groups_gated,
)
from reviews_quality_check_spark.oracle import reference as O


def test_cross_block_pairs_never_compared(spark):
    """Identical texts at ids 5 and 1005 are in different 1000-blocks —
    the reference never compares them (similarity.py:264-269)."""
    rows = [
        (5, "an identical piece of text across blocks today"),
        (1005, "an identical piece of text across blocks today extra"),
        (6, "an identical piece of text across blocks today indeed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = blocked_similar_pairs(df, block_size=1000, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (5, 6) in got          # same block: compared
    assert (5, 1005) not in got   # cross-block: never compared (quirk #1)
    assert (6, 1005) not in got


def test_blocked_similarity_values_match_oracle(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "something else entirely different here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): (r["similarity"], r["tier"])
           for r in blocked_similar_pairs(df, block_size=1000, threshold=0.3).collect()}
    texts = dict(rows)
    for (a, b), (sim, tier) in out.items():
        want = O.ngram_jaccard(texts[a], texts[b])
        assert sim == pytest.approx(want, abs=1e-12)
        assert tier == O.similarity_tier(want)
    assert (0, 1) in out


def test_exact_gate_excludes_long_texts(spark):
    """quirk #2: >50-word literal duplicates are NOT exact-dup candidates."""
    short = "short duplicate text"
    long = " ".join(f"w{i}" for i in range(60))
    rows = [(1, short), (2, short), (3, long), (4, long)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_dup_groups_gated(df).collect()
    assert len(groups) == 1
    assert groups[0]["member_ids"] == [1, 2]  # the 60-word dup pair excluded
