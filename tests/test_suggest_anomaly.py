"""Constraint suggestion + metric-history anomaly detection.

Hand-computed expectations for every rule/detector branch, plus the
Deequ round-trip property: the suite suggested from a table passes on
that same table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from reviews_quality_check_spark.plans.anomaly import detect_anomalies
from reviews_quality_check_spark.plans.runner import SuiteRunner
from reviews_quality_check_spark.plans.suggest import (
    build_suite,
    profile_columns,
    suggest_constraints,
)


def _docs(spark, rows):
    """(doc_id, text, lang, source, n_chars) literal frame, pure-JVM."""
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("doc_id"),
                (F.lit(t) if t is not None else F.lit(None)).cast("string").alias("text"),
                F.lit(lg).alias("lang"),
                F.lit(src).alias("source"),
                F.lit(n).cast("long").alias("n_chars"),
            )
            for i, t, lg, src, n in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


CLEAN = [
    (1, "alpha", "en", "web", 10),
    (2, "beta", "en", "web", 20),
    (3, "gamma", "de", "books", 30),
    (4, "delta", "de", "books", 40),
]


def test_suggestion_rules_clean_frame(spark):
    d = _docs(spark, CLEAN)
    out = suggest_constraints(
        spark, d, numeric_cols=("doc_id", "n_chars"),
        string_cols=("text", "lang", "source"), max_card=3,
    )
    got = {(r["col_name"], r["rule"]): r for r in out.collect()}
    # complete columns -> not_null everywhere, no null_rate_max
    for c in ("doc_id", "text", "lang", "source", "n_chars"):
        assert (c, "not_null") in got
        assert (c, "null_rate_max") not in got
    # unique: every column here is either fully distinct or not
    assert (got["doc_id", "unique"]["observed"]) == 1.0
    assert ("lang", "unique") not in got  # 2 distinct over 4 rows
    # in_set only for string cols with distinct <= max_card=3
    assert got["lang", "in_set"]["params"] == "de,en"
    assert got["source", "in_set"]["params"] == "books,web"
    assert ("text", "in_set") not in got  # 4 distinct > 3
    # numeric range + non-negativity
    assert (got["n_chars", "in_range"]["param_lo"], got["n_chars", "in_range"]["param_hi"]) == (10.0, 40.0)
    assert ("n_chars", "non_negative") in got
    assert ("text", "in_range") not in got


def test_suggestion_null_and_negative_branches(spark):
    rows = CLEAN + [(-5, None, "en", "web", -7)]
    d = _docs(spark, rows)
    out = suggest_constraints(
        spark, d, numeric_cols=("doc_id", "n_chars"),
        string_cols=("text", "lang", "source"), max_card=3,
    )
    got = {(r["col_name"], r["rule"]): r for r in out.collect()}
    # text gained a null: not_null/unique replaced by the rate ceiling
    assert ("text", "not_null") not in got
    assert ("text", "unique") not in got
    r = got["text", "null_rate_max"]
    # 1 null of 5 rows -> rate 0.2, integer-ceiling at 2dp -> 0.2
    assert r["observed"] == pytest.approx(0.2, abs=1e-6)
    assert r["param_hi"] == pytest.approx(0.2, abs=1e-12)
    # negative minimum suppresses non_negative but keeps in_range
    assert ("n_chars", "non_negative") not in got
    assert got["n_chars", "in_range"]["param_lo"] == -7.0
    # doc_id still unique (distinct ids) though negative
    assert ("doc_id", "unique") in got
    assert ("doc_id", "non_negative") not in got


def test_null_rate_ceiling_is_integer_exact(spark):
    # 1 null of 3 rows -> rate 1/3: ceil at 2dp must be 0.34, not 0.33
    rows = [(1, "a", "en", "w", 1), (2, "b", "en", "w", 2), (3, None, "en", "w", 3)]
    d = _docs(spark, rows)
    prof = profile_columns(d, ("doc_id",), ("text",), max_card=3)
    assert prof["text"]["nulls"] == 1
    out = suggest_constraints(spark, d, ("doc_id",), ("text",), max_card=3)
    r = {(x["col_name"], x["rule"]): x for x in out.collect()}["text", "null_rate_max"]
    assert r["param_hi"] == pytest.approx(0.34, abs=1e-12)


def test_round_trip_suggested_suite_passes(spark):
    """Deequ's core promise: profile -> suggest -> run on the SAME data
    -> every check passes in every partition."""
    rows = CLEAN + [(5, "epsilon", "en", "web", 50)]
    d = _docs(spark, rows)
    sugg = suggest_constraints(
        spark, d, numeric_cols=("doc_id", "n_chars"),
        string_cols=("text", "lang", "source"), max_card=5,
    ).collect()
    suite = build_suite(sugg, row_key="doc_id")
    assert suite.row_checks and suite.agg_checks  # both families present
    res = SuiteRunner(suite).run(d, F.col("lang"), resume=False)
    verdicts = res.verdicts.collect()
    assert verdicts and all(v["passed"] for v in verdicts)


def test_approx_profile_same_plan_shape(spark):
    d = _docs(spark, CLEAN)
    prof = profile_columns(d, ("doc_id",), ("lang",), max_card=3, approx=True)
    # HLL at 4 values is exact in practice; the contract is "cardinality
    # to the nearest power of ten", assert the loose bound
    assert 3 <= prof["doc_id"]["distinct"] <= 5
    assert prof["lang"]["values"] == ["de", "en"]


# ---------------------------------------------------------------------------
# anomaly detection
# ---------------------------------------------------------------------------


def _series(spark, values, metric="m"):
    arr = F.array(
        *[
            F.struct(
                F.lit(metric).alias("metric"),
                F.lit(f"w{i:03d}").alias("window_id"),
                F.lit(int(v)).cast("long").alias("value"),
            )
            for i, v in enumerate(values)
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def _flags(spark, values, **kw):
    out = detect_anomalies(_series(spark, values), **kw).orderBy("window_id").collect()
    return [(r["rel_anomaly"], r["z_anomaly"]) for r in out], out


def test_constant_series_never_flags(spark):
    flags, _ = _flags(spark, [10] * 6)
    assert flags == [(False, False)] * 6


def test_rel_change_boundary_is_strict(spark):
    # prev=100: v=125 sits EXACTLY on 25% -> not anomalous; 126 is
    # transitions: None, 100->125 (exactly 25%), 125->100 (20% of 125),
    # 100->126 (26%) — only the last crosses the strict > bound
    flags, _ = _flags(spark, [100, 125, 100, 126])
    assert [f[0] for f in flags] == [False, False, False, True]


def test_z_detector_spike_and_history_gate(spark):
    # [10,10,10,100]: the spike has c=3 history with zero variance ->
    # lhs=(3*100-30)^2*2 = 145800 > 0 = rhs -> flagged; earlier rows
    # have c<3 -> suppressed regardless
    flags, rows = _flags(spark, [10, 10, 10, 100])
    assert [f[1] for f in flags] == [False, False, False, True]
    assert [r["hist_n"] for r in rows] == [0, 1, 2, 3]
    assert [r["prev_value"] for r in rows] == [None, 10, 10, 10]


def test_z_detector_tolerates_normal_variation(spark):
    # alternating 100/102: sample sd ~1, value 103 is within 3 sd of
    # mean 101 -> not flagged; 200 is
    flags, _ = _flags(spark, [100, 102, 100, 102, 103, 200])
    assert [f[1] for f in flags] == [False, False, False, False, False, True]


def test_decimal_path_exact_at_1e9_counts(spark):
    # daily counts ~1e9: v^2 ~ 1e18 exceeds int64 in the ss sum — the
    # decimal(38,0) arithmetic must stay exact (constant series: zero
    # variance, no flags; +1 blip over huge values flags nothing)
    base = 1_000_000_007
    flags, _ = _flags(spark, [base, base, base, base + 1, base])
    assert [f[1] for f in flags] == [False, False, False, True, False]
    # the +1 blip IS a z anomaly (zero trailing variance), rel stays off
    assert [f[0] for f in flags] == [False] * 5


def test_min_hist_parameter(spark):
    flags, _ = _flags(spark, [10, 10, 10, 100], min_hist=4)
    assert [f[1] for f in flags] == [False] * 4


# ---------------------------------------------------------------------------
# runner metrics-history integration
# ---------------------------------------------------------------------------


def test_runner_metrics_history_anomalies(spark, tmp_path):
    """The north_star loop: every committed run appends metric-history
    rows; history_anomalies flags the run whose violation counts jump."""
    from reviews_quality_check_spark.plans import checks as C

    def frame(n_bad):
        rows = [(i, "ok text", "en", "web", 10) for i in range(1, 21)]
        rows += [(100 + j, None, "en", "web", 10) for j in range(n_bad)]
        return _docs(spark, rows)

    suite = C.Suite(name="hist", row_key="doc_id")
    suite.add(C.not_blank("text", max_rate=1.0))  # count-only, always passes
    out = str(tmp_path / "out")
    runner = SuiteRunner(suite, out_dir=out)

    for seq, n_bad in enumerate([1, 1, 1, 1, 9]):
        assert runner.next_run_seq(spark) == seq  # auto-increment contract
        runner.run(frame(n_bad), F.col("lang"), resume=False)

    hist = {
        (r["metric"], r["window_id"]): r
        for r in runner.history_anomalies(spark).collect()
    }
    viol = [hist["en/not_blank_text", s] for s in range(5)]
    # stable 1,1,1,1 then 9: the jump is both a rel and a z anomaly
    assert [r["value"] for r in viol] == [1, 1, 1, 1, 9]
    assert (viol[4]["rel_anomaly"], viol[4]["z_anomaly"]) == (True, True)
    assert all(not r["rel_anomaly"] and not r["z_anomaly"] for r in viol[:4])
    # volume series exists and stays calm (21,21,21,21,29: 8/21 = 38% rel)
    vol = [hist["en/__rows_scanned", s] for s in range(5)]
    assert [r["value"] for r in vol] == [21, 21, 21, 21, 29]
    assert vol[4]["rel_anomaly"] and vol[4]["z_anomaly"]


def test_in_set_refuses_separator_bearing_members(spark):
    import pytest as _pytest

    rows = [(1, "a", "x,y", "w", 1), (2, "b", "z", "w", 2)]
    with _pytest.raises(ValueError, match="separator"):
        suggest_constraints(spark, _docs(spark, rows), ("doc_id",), ("lang",), max_card=5)


def test_metrics_replay_same_run_seq_keeps_one_history_point(spark, tmp_path):
    """Crash-resume shape: re-running under the SAME explicit run_seq
    appends a second physical row (fresh run_id) but history_anomalies
    keeps one point per (series, seq) — the replay is invisible."""
    from reviews_quality_check_spark.plans import checks as C

    d = _docs(spark, [(i, None if i == 1 else "t", "en", "w", 1) for i in range(1, 6)])
    suite = C.Suite(name="replay", row_key="doc_id")
    suite.add(C.not_blank("text", max_rate=1.0))
    runner = SuiteRunner(suite, out_dir=str(tmp_path / "out"))
    runner.run(d, F.col("lang"), resume=False, run_seq=0)
    runner.run(d, F.col("lang"), resume=False, run_seq=0)  # replay
    m = spark.read.parquet(str(tmp_path / "out" / "metrics"))
    # two physical rows per series (append mode), distinct run_ids...
    assert m.filter(F.col("check_name") == "not_blank_text").count() == 2
    # ...but exactly one history point per series at seq 0
    hist = runner.history_anomalies(spark).collect()
    pts = [(r["metric"], r["window_id"], r["value"]) for r in hist]
    assert sorted(pts) == [("en/__rows_scanned", 0, 5), ("en/not_blank_text", 0, 1)]
