"""The reference's own shipped test inputs, run against this engine.

north_rule: "pass the reference pytest suite". The reference ships one
test file (test_similarity.py) whose body prints get_ngram_similarity
over four fixed text pairs (no asserts; constructing its analyzer needs
SentenceTransformer, absent here and unnecessary for the n-gram path).
This port runs the SAME four pairs through (a) the engine's Column
expression and (b) the clean-room pure-Python reference port, asserts
they agree to 1e-12, and pins the qualitative ordering the reference's
test narrates (pair1 high > pair2 borderline > pair3 low > pair4 very
low, with pair1 above and pair4 far below the 0.736 threshold the
reference test names).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.text import (
    similarity_ngram_set_from_words,
    whitespace_words,
)
from reviews_quality_check_spark.oracle import reference as O

# verbatim from /root/reference/test_similarity.py:9-32
TEST_PAIRS = [
    (
        "The phone's battery life is excellent, lasting all day with heavy usage.",
        "The phone has excellent battery life that lasts all day under heavy use.",
    ),
    (
        "The screen quality is good with vibrant colors, but viewing angles could be better.",
        "Display shows nice vibrant colors, though the viewing angles aren't perfect.",
    ),
    (
        "The camera takes great photos in daylight with natural colors.",
        "While the photo quality is decent, the colors seem a bit oversaturated.",
    ),
    (
        "The build quality is excellent with premium materials.",
        "The software needs more updates to fix various bugs.",
    ),
]


def _engine_sims(spark):
    rows = [(i, a, b) for i, (a, b) in enumerate(TEST_PAIRS, 1)]
    df = spark.createDataFrame(rows, "pair int, t1 string, t2 string")
    sa = similarity_ngram_set_from_words(whitespace_words("t1"))
    sb = similarity_ngram_set_from_words(whitespace_words("t2"))
    staged = df.select("pair", sa.alias("sa"), sb.alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    sim = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(0.0)
    return {r["pair"]: r["sim"] for r in staged.select("pair", sim.alias("sim")).collect()}


def test_reference_test_similarity_pairs(spark):
    got = _engine_sims(spark)
    want = {i: O.ngram_jaccard(a, b) for i, (a, b) in enumerate(TEST_PAIRS, 1)}
    for i in range(1, 5):
        assert got[i] == pytest.approx(want[i], abs=1e-12), f"pair {i}"
    # the ordering the reference test narrates
    assert got[1] > got[2] > got[3] > got[4]
    assert got[4] < 0.2  # "very low similarity"
