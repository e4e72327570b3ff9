"""Equivalence of the flat-regex (whole-stage-codegen) Flesch fast path
with the per-word algorithm: property-based over random token soups plus
the synth-pages corpus, asserting exact equality against the Python
oracle (which implements the reference per-word rules verbatim)."""

from __future__ import annotations

import random

import pytest

from reviews_quality_check_spark.functions.readability import (
    flesch_reading_ease,
    flesch_reading_ease_fast,
)
from reviews_quality_check_spark.oracle import reference as O

# word pool engineered to hit every syllable-rule branch: no-vowel words,
# single-group-e words, cons-le words, 'le' itself, apostrophes, digits
POOL = [
    "the", "cat", "table", "cable", "le", "e", "xyz", "123", "99e",
    "tree", "bee", "ale", "cle", "tea", "eye", "ye", "'e", "don't",
    "queue", "rhythm", "beautiful", "science", "apple", "simple",
    "battle", "vowelless", "brr", "tv", "a", "i", "style", "lye",
]
PUNCT = [". ", "! ", "? ", ", ", " ", "... ", "?! ", "; "]


def _random_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 30)):
        parts.append(rng.choice(POOL))
        parts.append(rng.choice(PUNCT))
    return "".join(parts)


@pytest.fixture(scope="module")
def texts():
    rng = random.Random(42)
    out = [_random_text(rng) for _ in range(300)]
    out += ["", "   ", ".", "?!.", "no terminator at all", "\todd\nws."]
    return out


def test_fast_equals_slow_equals_oracle(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    rows = df.select(
        "i",
        flesch_reading_ease("text").alias("slow"),
        flesch_reading_ease_fast("text").alias("fast"),
    ).collect()
    for r in rows:
        t = texts[r["i"]]
        want = O.flesch_reading_ease(t)
        assert r["fast"] == pytest.approx(want, abs=0), (
            f"fast mismatch on {t!r}: {r['fast']} vs {want}"
        )
        assert r["slow"] == pytest.approx(want, abs=0), (
            f"slow mismatch on {t!r}: {r['slow']} vs {want}"
        )


def test_fast_on_synth_pages(spark):
    from reviews_quality_check_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 500)
    rows = pages.select(
        "text", flesch_reading_ease_fast("text").alias("fast")
    ).collect()
    for r in rows:
        assert r["fast"] == pytest.approx(O.flesch_reading_ease(r["text"]), abs=0)
