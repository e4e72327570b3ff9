"""Bloom-decontamination properties on hand fixtures: zero false
negatives (the bloom property), deterministic false-positive
accounting at tiny m, and the 62-bit word-packing edge."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from reviews_quality_check_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_decontamination,
)


def _df(spark, rows, key):
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long" if key == "doc_id" else "int").alias(key),
                F.lit(t).alias("text"),
            )
            for i, t in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def _pos(j: int, shingle: str, m: int) -> int:
    return int(hashlib.md5(f"{j}#{shingle}".encode()).hexdigest()[:8], 16) % m


def test_bloom_no_false_negatives(spark):
    # every corpus shingle that IS in the test set must be admitted,
    # at any m — Bloom filters have no false negatives by construction
    span = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _df(spark, [(0, span + " iota kappa"), (1, "unrelated words " * 4)], "doc_id")
    tests = _df(spark, [(1, span)], "test_id")
    for m in (64, 1024):
        out = {r.doc_id: r for r in bloom_decontamination(corpus, tests, m_bits=m).collect()}
        assert out[0].exact_hits == 1
        assert out[0].bloom_hits >= 1
        assert out[0].false_positives == out[0].bloom_hits - 1


def test_bloom_fp_accounting_matches_hand_hash(spark):
    # at m=64 the 3 test-shingle hashes set <= 9 of 64 bits; compute by
    # hand which corpus-only shingle collides and assert the engine
    # reports exactly that FP set
    m, k = 64, 3
    tspan = "one two three four five six seven eight"
    # corpus doc shares nothing textually with the test span
    cspan = "red orange yellow green blue indigo violet ultraviolet infrared"
    corpus = _df(spark, [(7, cspan)], "doc_id")
    tests = _df(spark, [(1, tspan)], "test_id")
    set_bits = {_pos(j, tspan, m) for j in range(1, k + 1)}
    c_shingles = [
        " ".join(cspan.split()[i : i + 8]) for i in range(len(cspan.split()) - 7)
    ]
    expected_fp = sum(
        1
        for s in c_shingles
        if all(_pos(j, s, m) in set_bits for j in range(1, k + 1))
    )
    out = bloom_decontamination(corpus, tests, m_bits=m).collect()
    got_fp = out[0].false_positives if out else 0
    assert got_fp == expected_fp
    if out:
        assert out[0].exact_hits == 0


def test_bloom_word_packing_covers_high_offsets(spark):
    # positions just under a word boundary (offset 61) must round-trip
    # through the 62-bit packing: probe a shingle whose position lands
    # at offset BITS_PER_WORD-1 for some j by scanning candidates
    m = 4 * BITS_PER_WORD
    found = None
    for n in range(2000):
        s = f"w{n} a b c d e f g"
        if any(_pos(j, s, m) % BITS_PER_WORD == BITS_PER_WORD - 1 for j in (1, 2, 3)):
            found = s
            break
    assert found is not None
    corpus = _df(spark, [(0, found)], "doc_id")
    tests = _df(spark, [(1, found)], "test_id")
    out = bloom_decontamination(corpus, tests, m_bits=m).collect()
    assert out[0].exact_hits == 1 and out[0].bloom_hits == 1
