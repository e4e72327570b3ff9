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


def test_long_identical_texts_reported_as_similar_pairs(spark):
    """Reference parity: identical texts LONGER than the 50-word exact
    gate are not in the duplicates set, so the similarity path reports
    them as a sim-1.0 pair (similarity.py:57,161,237); identical short
    texts stay excluded."""
    short = "short duplicate text"
    long = " ".join(f"w{i}" for i in range(60))
    rows = [(1, short), (2, short), (3, long), (4, long)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["similarity"]
           for r in blocked_similar_pairs(df, block_size=1000, threshold=0.3).collect()}
    assert out.get((3, 4)) == pytest.approx(1.0)
    assert (1, 2) not in out


def test_combined_similar_pairs_tiers(spark):
    """F11: combined = (cosine + jaccard)/2, elif tier chain, strict >
    dup threshold, short-exact-dup exclusion (similarity.py:167,194-199)."""
    from reviews_quality_check_spark.operators.similarity_blocked import (
        combined_similar_pairs,
    )

    t = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumps over the lazy cat"
    rows = [
        (0, t), (1, t),                      # identical short -> excluded
        (2, t2),                             # near-dup of 0/1 by ngrams
        (3, "completely different words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # embeddings: 0,1,2 identical unit vectors (cos 1.0), 3 orthogonal
    e1 = [1.0] + [0.0] * 7
    e2 = [0.0, 1.0] + [0.0] * 6
    emb = spark.createDataFrame(
        [(0, e1, 0), (1, e1, 0), (2, e1, 0), (3, e2, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in combined_similar_pairs(docs, emb, block_size=1000).collect()
    }
    assert (0, 1) not in out  # identical short pair excluded pre-scoring
    # (0,2): cos=1.0, jaccard high -> combined in [0.85, 1.0)
    r02 = out[(0, 2)]
    assert r02["embedding_sim"] == pytest.approx(1.0)
    assert 0.85 <= r02["combined_sim"] < 1.0
    # elif semantics: exactly one tier, consistent with the thresholds
    exp_tier = ("tier1" if r02["combined_sim"] >= 0.98
                else "tier2" if r02["combined_sim"] >= 0.92
                else "tier3")
    assert r02["tier"] == exp_tier
    assert r02["is_duplicate"] == (r02["combined_sim"] > 0.92)
    # orthogonal embedding + disjoint ngrams -> below tier3, dropped
    assert (0, 3) not in out and (2, 3) not in out
