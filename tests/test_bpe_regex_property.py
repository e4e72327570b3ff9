"""Property test: the BPE-ish pre-tokenizer regex counts identically in
java.util.regex (Spark), RE2 (DuckDB), and Python re on adversarial
ASCII strings — the three engines the pattern must agree across."""

from __future__ import annotations

import re

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.text import BPE_PRETOKEN_RE, bpe_token_count

# printable ASCII + whitespace variety, apostrophe-heavy alphabet
_ALPHABET = st.sampled_from(
    list("abcXYZ012 '\t\n.,!?$-_") + ["'s", "'ll", "n't", "  "]
)
_TEXTS = st.lists(_ALPHABET, min_size=0, max_size=40).map("".join)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_TEXTS, min_size=1, max_size=8))
def test_bpe_count_three_engine_parity(spark_session_holder, texts):
    spark = spark_session_holder
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_token_count("t").alias("n")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want_py = len(re.findall(BPE_PRETOKEN_RE, t))
        want_duck = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, BPE_PRETOKEN_RE]
        ).fetchone()[0]
        assert got[i] == want_py == want_duck, (repr(t), got[i], want_py, want_duck)


# hypothesis re-invokes the test many times; a function-scoped Spark
# fixture would rebuild sessions — reuse the session fixture via a
# module-level alias fixture
import pytest  # noqa: E402


@pytest.fixture()
def spark_session_holder(spark):
    return spark
