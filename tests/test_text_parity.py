"""Row-level parity: Spark Column expressions vs the pure-Python oracle.

Covers F1-F13 (SURVEY §2.8): normalization, tokenization, sentences,
n-gram sets, truncation, syllables/Flesch, quality score, lang-id —
exact equality on a fixture covering the edge cases the reference's
semantics hinge on.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.quality import (
    mean_word_length,
    predict_lang,
    punct_ratio,
    quality_score,
    stopword_ratio,
)
from reviews_quality_check_spark.functions.readability import flesch_reading_ease
from reviews_quality_check_spark.functions.text import (
    norm_text,
    sentence_count,
    similarity_ngram_set,
    tokens,
    truncate_words,
    word_count,
)
from reviews_quality_check_spark.oracle import reference as O

TEXTS = [
    "The quick brown fox jumps over the lazy dog. It is fast!",
    "This product is good enough but fairly average.",
    "bad terrible awful product",
    "Great great great! I love it.",
    "",
    "   ",
    "single",
    "a.b.c...d!e?f",
    "Don't count contractions wrongly, isn't it?",
    "table cable able le e",
    "Multiple   spaces\tand\nnewlines  collapse",
    "UPPER lower MiXeD 123 numbers42",
    "word " * 60,  # long text for truncation
    "el la de que y los in the and",  # mixed lang markers
    "punctuation!!! ??? ... ,,, ;;;",
]


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def collect_map(df, col):
    return {r["doc_id"]: r["v"] for r in df.select("doc_id", col.alias("v")).collect()}


def test_norm_tokens_sentences(df):
    got_norm = collect_map(df, norm_text("text"))
    got_tok = collect_map(df, tokens("text"))
    got_wc = collect_map(df, word_count("text"))
    got_sc = collect_map(df, sentence_count("text"))
    for i, t in enumerate(TEXTS):
        assert got_norm[i] == O.norm_text(t), f"norm {i}"
        assert got_tok[i] == O.tokenize(t), f"tokens {i}"
        assert got_wc[i] == len(O.tokenize(t)), f"wc {i}"
        assert got_sc[i] == len(O.split_sentences(t)), f"sc {i}"


def test_similarity_ngram_set(df):
    got = collect_map(df, similarity_ngram_set("text"))
    for i, t in enumerate(TEXTS):
        assert set(got[i]) == O.similarity_ngram_set(t), f"ngset {i}"


def test_truncate(df):
    for n in (10, 25, 100):
        got = collect_map(df, truncate_words("text", n))
        for i, t in enumerate(TEXTS):
            assert got[i] == O.truncate_words(t, n), f"trunc {i} n={n}"


def test_flesch_exact(df):
    got = collect_map(df, flesch_reading_ease("text"))
    for i, t in enumerate(TEXTS):
        expected = O.flesch_reading_ease(t)
        assert got[i] == pytest.approx(expected, abs=0.0), f"flesch {i}: {got[i]} vs {expected}"


def test_quality_components(df):
    for col, fn in [
        (quality_score("text"), O.quality_score),
        (punct_ratio("text"), O.punct_ratio),
        (stopword_ratio(tokens("text")), O.stopword_ratio),
        (mean_word_length(tokens("text")), O.mean_word_length),
    ]:
        got = collect_map(df, col)
        for i, t in enumerate(TEXTS):
            expected = fn(t)
            assert math.isclose(got[i], expected, rel_tol=0, abs_tol=0) or got[i] == expected


def test_predict_lang(df):
    got = collect_map(df, predict_lang("text"))
    for i, t in enumerate(TEXTS):
        assert got[i] == O.predict_lang(t), f"lang {i}"


def test_syllables_reference_cases():
    # hand-computed against the reference algorithm
    # (utils/text_processing.py:128-149)
    cases = {
        "cat": 1, "table": 2, "cable": 2, "able": 2, "le": 1, "e": 1,
        "queue": 1, "rhythm": 1, "beautiful": 3, "science": 1,
    }
    for w, want in cases.items():
        assert O.count_syllables(w) == want, w


def test_gopher_flags_hand_computed(spark):
    """Gopher/C4 rule booleans vs hand-computed expectations (integer
    arithmetic: 3n <= total <= 10n etc.)."""
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.functions.quality import gopher_flags

    fifty = " ".join(["the", "cat", "sat", "on", "mats"] * 10)  # 50 words
    rows = [
        (1, fifty + ". Second sentence here. And a third one."),
        (2, "short text"),                             # n=2 -> word_count False
        (3, "{x} " + fifty),                           # brace False
        (4, ("abcdefghijklmnop " * 50).strip()),       # mean len 16 -> False
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = gopher_flags(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[v.alias(k) for k, v in flags.items()]).collect()
    }
    assert got[1]["word_count_ok"] and got[1]["stop_hits_ok"] is True
    assert got[1]["min_sentences_ok"] and got[1]["no_brace"]
    # mean word len of doc 1: words include '.'-attached tokens, all short
    assert got[1]["mean_word_len_ok"]
    assert got[2]["word_count_ok"] is False
    assert got[3]["no_brace"] is False
    assert got[4]["mean_word_len_ok"] is False and got[4]["word_count_ok"]


def test_pii_redaction_and_counts(spark):
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.functions.pii import pii_counts, redact_pii

    rows = [
        (1, "mail a.b-c_d@x-y.co and 10.0.0.1 and +1 (555) 123-4567 now"),
        (2, "no pii here, just order 12345 and v1.2.3 strings"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = pii_counts(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in counts.items()],
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[1]["red"] == "mail <EMAIL> and <IP> and <PHONE> now"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 0, 0)
    assert got[2]["red"] == rows[1][1]  # untouched


def test_repetition_stats_hand_computed(spark):
    from reviews_quality_check_spark.operators.ngrams import repetition_stats

    rows = [
        (1, "buy now " * 10),          # bigrams dominated by 'buy now'
        (2, "one two three four five six seven"),
        (3, "solo"),                   # 1 token: no bigrams, vacuously ok
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    # doc 1: tokens = [buy now]*10 -> 19 bigrams, 'buy now' x10, 'now buy' x9
    assert got[1]["n_words"] == 20 and got[1]["n_bigrams"] == 19
    assert got[1]["max_bigram_count"] == 10 and got[1]["rep_ok"] is False
    assert got[2]["n_bigrams"] == 6 and got[2]["max_bigram_count"] == 1
    assert got[2]["rep_ok"] is True
    assert got[3]["n_bigrams"] == 0 and got[3]["rep_ok"] is True


def test_url_parsing_hand_computed(spark):
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.functions.url import (
        path_depth,
        registered_domain,
        url_host,
        url_path,
        url_query,
    )

    rows = [
        (1, "https://www.news.example.co/a/b/c.html?x=1#frag"),
        (2, "http://plain.org/"),
        (3, "https://bare.io"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r["i"]: r.asDict()
        for r in df.select(
            "i",
            url_host("url").alias("h"),
            url_path("url").alias("p"),
            url_query("url").alias("q"),
            registered_domain(url_host("url")).alias("d"),
            path_depth(url_path("url")).alias("n"),
        ).collect()
    }
    assert got[1] == {"i": 1, "h": "www.news.example.co", "p": "/a/b/c.html",
                      "q": "x=1", "d": "example.co", "n": 3}
    assert got[2]["h"] == "plain.org" and got[2]["p"] == "/" and got[2]["n"] == 0
    assert got[2]["d"] == "plain.org" and got[2]["q"] == ""
    assert got[3]["h"] == "bare.io" and got[3]["p"] == "" and got[3]["n"] == 0


def test_decontamination_discrimination(spark):
    """8-gram overlap vs the eval spans: exact-dup docs and the clean
    region of the near-dup variant hit span 1; the substituted-word
    span hits ONLY the variant doc; the novel span hits nothing."""
    from reviews_quality_check_spark.queries import QUERIES

    got = {
        (r["doc_id"], r["test_id"]): r["n_shared"]
        for r in QUERIES["decontamination_hits"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r["doc_id"] < 0
    }
    assert got[(-1, 1)] == got[(-2, 1)] == got[(-3, 1)] == 5
    assert got[(-5, 2)] == 5
    assert all(t != 3 for _, t in got)          # novel span never hits
    assert (-4, 2) not in got                   # base B lacks 'boomy' span


def test_cleaning_verdicts_branches_not_vacuous(spark):
    """Non-vacuity guard for the composed cleaning pass: the planted
    clean doc (-81) is the ONLY keep=true row (the single-line corpus
    fails min_sentences everywhere), and every flag column carries
    both branches — a corpus regeneration or rule change that silences
    a branch fails here, not just at the oracle."""
    from reviews_quality_check_spark.queries import QUERIES

    rows = QUERIES["cleaning_verdicts"](spark, "/root/testdata/sf0.001").collect()
    kept = [r["doc_id"] for r in rows if r["keep"]]
    assert kept == [-81]
    for col in ("gopher_ok", "rep_ok", "pii_found"):
        vals = {r[col] for r in rows}
        assert vals == {True, False}, col
