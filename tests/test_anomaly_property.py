"""Property tests: the integer-exact anomaly detectors agree with a
pure-Python reference on arbitrary series (the engine's claim is that
flags are a deterministic pure function of the history — not a float
approximation of one), and batched series evaluation equals
one-at-a-time evaluation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reviews_quality_check_spark.plans.anomaly import detect_anomalies


def _py_flags(values, rel_pct=25, z_k=3, min_hist=3):
    """Clean-room integer reference of the two detectors."""
    out = []
    for i, v in enumerate(values):
        prev = values[i - 1] if i > 0 else None
        rel = prev is not None and 100 * abs(v - prev) > rel_pct * prev
        hist = values[:i]
        c = len(hist)
        if c >= min_hist:
            s = sum(hist)
            ss = sum(x * x for x in hist)
            lhs = (c * v - s) ** 2 * (c - 1)
            rhs = z_k * z_k * c * (c * ss - s * s)
            z = lhs > rhs
        else:
            z = False
        out.append((bool(rel), bool(z)))
    return out


def _spark_flags(spark, values, **kw):
    arr = F.array(
        *[
            F.struct(
                F.lit("m").alias("metric"),
                F.lit(f"w{i:04d}").alias("window_id"),
                F.lit(int(v)).cast("long").alias("value"),
            )
            for i, v in enumerate(values)
        ]
    )
    df = spark.range(1).select(F.explode(arr).alias("r")).select("r.*")
    rows = detect_anomalies(df, **kw).orderBy("window_id").collect()
    return [(r["rel_anomaly"], r["z_anomaly"]) for r in rows]


@pytest.fixture()
def spark_session_holder(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=2_000_000_000),
                    min_size=1, max_size=12)
)
def test_detectors_match_python_reference(spark_session_holder, values):
    # 2e9 values exercise the decimal path (v^2 ~ 4e18 > int64)
    assert _spark_flags(spark_session_holder, values) == _py_flags(values)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=8),
    b=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=8),
)
def test_series_are_independent(spark_session_holder, a, b):
    """Two series evaluated together flag exactly as each alone —
    the partitionBy(series) isolation property."""
    spark = spark_session_holder
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("metric"),
                F.lit(f"w{i:04d}").alias("window_id"),
                F.lit(int(v)).cast("long").alias("value"),
            )
            for name, vals in (("a", a), ("b", b))
            for i, v in enumerate(vals)
        ]
    )
    df = spark.range(1).select(F.explode(arr).alias("r")).select("r.*")
    rows = detect_anomalies(df).orderBy("metric", "window_id").collect()
    got_a = [(r["rel_anomaly"], r["z_anomaly"]) for r in rows if r["metric"] == "a"]
    got_b = [(r["rel_anomaly"], r["z_anomaly"]) for r in rows if r["metric"] == "b"]
    assert got_a == _py_flags(a)
    assert got_b == _py_flags(b)
