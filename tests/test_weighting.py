"""Parity tests for the corpus-weighting operators (TF-IDF, DSIR,
perplexity buckets) against hand-computed closed forms on tiny
fixtures — the oracle harness certifies cross-engine parity on the
corpus; these pin the MATH on inputs small enough to verify by hand.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.operators.weighting import (
    DSIR_BUCKETS,
    dsir_log_weights,
    perplexity_buckets,
    tfidf_top_terms,
)


def _docs(spark, rows):
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("doc_id"),
                F.lit(t).alias("text"),
                F.lit(lang).alias("lang"),
                F.lit(src).alias("source"),
            )
            for i, t, lang, src in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def test_tfidf_hand_computed(spark):
    # 3 docs; term "cat" in doc 0 only (tf=2), "the" everywhere
    rows = [
        (0, "cat cat the dog", "en", "a"),
        (1, "the dog runs", "en", "a"),
        (2, "the bird", "en", "a"),
    ]
    out = tfidf_top_terms(_docs(spark, rows), k=2).collect()
    n = 3

    def idf(df):
        return math.log((n + 1) / (df + 1)) + 1.0

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.term, r.tfidf))
    # doc0: cat tf=2 df=1 -> 2*(ln(2)+1); the tf=1 df=3 -> 1.0; dog tf=1 df=2
    assert by_doc[0][0][1] == "cat"
    assert by_doc[0][0][2] == pytest.approx(round(2 * idf(1), 6), abs=1e-9)
    # doc0 rank2: dog (idf ln(4/3)+1 ~ 1.287) beats the (idf exactly 1.0)
    assert by_doc[0][1][1] == "dog"
    # every doc gets exactly k=2 rows with rk 1,2
    for d in (0, 1, 2):
        assert [rk for rk, _, _ in sorted(by_doc[d])] == [1, 2]


def test_tfidf_tie_breaks_by_term(spark):
    rows = [(0, "beta alpha", "en", "a"), (1, "gamma delta", "en", "a")]
    out = tfidf_top_terms(_docs(spark, rows), k=2).collect()
    doc0 = [r.term for r in out if r.doc_id == 0]
    assert doc0 == ["alpha", "beta"]  # equal scores -> term ASC


def test_dsir_prefers_target_like_docs(spark):
    # target domain 'tgt' talks about cats; raw mixes in dogs
    rows = [
        (0, "cat cat cat", "en", "tgt"),
        (1, "cat cat cat", "en", "tgt"),
        (2, "dog dog dog", "en", "raw"),
        (3, "cat cat dog", "en", "raw"),
        (4, "", "en", "raw"),
    ]
    out = {r.doc_id: r for r in dsir_log_weights(_docs(spark, rows), "tgt").collect()}
    # cat-heavy docs must outscore dog-heavy docs under the tgt model
    assert out[0].log_weight > out[3].log_weight > out[2].log_weight
    # zero-token doc: no features, weight exactly 0
    assert out[4].n_feats == 0 and out[4].log_weight == 0.0
    # n_feats = unigrams + bigrams = 3 + 2
    assert out[0].n_feats == 5


def test_dsir_hand_computed_single_bucket_ratio(spark):
    # one doc, one token -> weight = ln((t+1)/(T+B)) - ln((r+1)/(R+B))
    rows = [(0, "cat", "en", "tgt"), (1, "cat", "en", "raw")]
    out = {r.doc_id: r for r in dsir_log_weights(_docs(spark, rows), "tgt").collect()}
    B = DSIR_BUCKETS
    # bucket(cat): tgt_cnt=1, raw_cnt=2, tgt_total=1, raw_total=2
    expected = round(
        round(math.log((1 + 1) / (1 + B)) - math.log((2 + 1) / (2 + B)), 6) + 1e-9,
        4,
    )
    assert out[0].log_weight == pytest.approx(expected, abs=1e-9)


def test_perplexity_buckets_order_and_coverage(spark):
    # 6 en docs: common words -> low nll (head), rare words -> tail
    rows = [
        (0, "the the the", "en", "a"),
        (1, "the the the", "en", "a"),
        (2, "the dog ran", "en", "a"),
        (3, "the dog sat", "en", "a"),
        (4, "qwerty zxcvb qqq", "en", "a"),
        (5, "plugh xyzzy frobz", "en", "a"),
        (6, "chat chien", "fr", "a"),
    ]
    out = {r.doc_id: r for r in perplexity_buckets(_docs(spark, rows)).collect()}
    assert out[0].ppl_bucket == "head" and out[1].ppl_bucket == "head"
    assert out[4].ppl_bucket == "tail" and out[5].ppl_bucket == "tail"
    # identical docs share a bucket; nll ordering matches rarity
    assert out[0].nll < out[2].nll < out[4].nll
    # single-lang fr group: its only nll value is cut1 -> head
    assert out[6].ppl_bucket == "head"
    # buckets partition the corpus (every scored doc got a bucket)
    assert set(v.ppl_bucket for v in out.values()) <= {"head", "middle", "tail"}


def test_perplexity_excludes_zero_token_docs(spark):
    rows = [(0, "real words here", "en", "a"), (1, "!!!", "en", "a")]
    out = perplexity_buckets(_docs(spark, rows)).collect()
    assert [r.doc_id for r in out] == [0]


# ---------------------------------------------------------------------------
# dup_ngram_spans (operators/ngrams.py) — hand-computed coverage
# ---------------------------------------------------------------------------

def test_dup_ngram_spans_hand_computed(spark):
    from reviews_quality_check_spark.operators.ngrams import dup_ngram_spans

    shared = "a b c d e f g h"  # exactly one 8-gram
    rows = [
        (0, shared + " x y z", "en", "a"),       # positions 0..7 covered
        (1, "p q " + shared, "en", "a"),         # positions 2..9 covered
        (2, "totally unique words only here", "en", "a"),
        (3, "short doc", "en", "a"),             # < 8 tokens -> no grams
    ]
    out = {r.doc_id: r for r in dup_ngram_spans(_docs(spark, rows)).collect()}
    assert out[0].n_tokens == 11 and out[0].n_dup_tokens == 8
    assert out[0].dup_frac == pytest.approx(round(8 / 11 + 1e-9, 4))
    assert out[1].n_tokens == 10 and out[1].n_dup_tokens == 8
    assert out[2].n_dup_tokens == 0 and out[2].dup_frac == 0.0
    assert out[3].n_dup_tokens == 0


def test_dup_ngram_spans_overlapping_grams_union(spark):
    from reviews_quality_check_spark.operators.ngrams import dup_ngram_spans

    # two docs sharing a 9-token run -> two overlapping dup 8-grams,
    # coverage must be the UNION (9 positions, not 16)
    run = "a b c d e f g h i"
    rows = [(0, run, "en", "a"), (1, run + " tail words", "en", "a")]
    out = {r.doc_id: r for r in dup_ngram_spans(_docs(spark, rows)).collect()}
    assert out[0].n_dup_tokens == 9
    assert out[0].dup_frac == pytest.approx(1.0)
    assert out[1].n_dup_tokens == 9


def test_dup_ngram_spans_within_doc_repeat_not_counted(spark):
    from reviews_quality_check_spark.operators.ngrams import dup_ngram_spans

    # the same 8-gram twice WITHIN one doc is not a cross-doc dup
    run = "a b c d e f g h"
    rows = [(0, run + " " + run, "en", "a"), (1, "other text entirely", "en", "a")]
    out = {r.doc_id: r for r in dup_ngram_spans(_docs(spark, rows)).collect()}
    assert out[0].n_dup_tokens == 0


# ---------------------------------------------------------------------------
# quality_classifier_scores — hand-computed math + branch coverage
# ---------------------------------------------------------------------------

def test_quality_classifier_hand_computed_single_token(spark):
    import hashlib

    from reviews_quality_check_spark.operators.weighting import (
        QC_BUCKETS,
        quality_classifier_scores,
    )

    rows = [(0, "cat", "en", "a"), (1, "", "en", "a")]
    out = {
        r.doc_id: r
        for r in quality_classifier_scores(_docs(spark, rows), bias=0.05).collect()
    }
    # doc 0: one unigram, no bigram -> logit = round(w + 0.05 + 1e-9, 6)
    bucket = int(hashlib.md5(b"cat").hexdigest()[:8], 16) % QC_BUCKETS
    w = int(hashlib.md5(f"qw:{bucket}".encode()).hexdigest()[:8], 16) / 4294967295.0 * 2 - 1
    # mirror the engine: round6 -> decimal sum (exact on one term) -> /1
    expected_logit = round(round(w, 6) / 1 + 0.05 + 1e-9, 6)
    assert out[0].n_feats == 1
    assert out[0].logit == pytest.approx(expected_logit, abs=1e-12)
    assert out[0].keep == (expected_logit >= 0.0)
    assert out[0].prob == pytest.approx(
        round(1.0 / (1.0 + math.exp(-expected_logit)) + 1e-9, 4), abs=1e-9
    )
    # doc 1: zero features -> bare bias
    assert out[1].n_feats == 0
    assert out[1].logit == round(0.05 + 1e-9, 6)
    assert out[1].keep is True
    assert out[1].prob == pytest.approx(
        round(1.0 / (1.0 + math.exp(-out[1].logit)) + 1e-9, 4), abs=1e-9
    )


def test_quality_classifier_mean_pooling_and_bigrams(spark):
    from reviews_quality_check_spark.operators.weighting import (
        quality_classifier_scores,
    )

    # n tokens -> n unigrams + (n-1) bigrams features
    rows = [(0, "a b c", "en", "x"), (1, "a b c a b c a b c", "en", "x")]
    out = {
        r.doc_id: r for r in quality_classifier_scores(_docs(spark, rows)).collect()
    }
    assert out[0].n_feats == 5  # 3 + 2
    assert out[1].n_feats == 17  # 9 + 8
    # mean pooling: logit bounded regardless of doc length
    assert abs(out[1].logit) <= 1.0 + 0.05 + 1e-6


def test_quality_classifier_both_branches_on_corpus(spark):
    from reviews_quality_check_spark.queries import QUERIES

    out = QUERIES["quality_classifier_scores"](spark, "/root/testdata/sf0.001")
    agg = out.groupBy("keep").count().collect()
    kept = {r.keep: r["count"] for r in agg}
    assert kept.get(True, 0) > 0 and kept.get(False, 0) > 0
