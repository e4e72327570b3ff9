"""Suite runner: verdict semantics, violation rows, and the
checkpoint/resume contract (north_rule: a killed run resumes from the
last completed partition; completed partitions are not recomputed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.plans import checks as C
from reviews_quality_check_spark.plans.runner import SuiteRunner


@pytest.fixture()
def pages(spark):
    rows = [
        # (url, lang, text, day)
        ("https://a/1", "en", "hello world one", "d1"),
        ("https://a/2", "en", "", "d1"),                    # blank violation
        ("https://a/3", "xx", "valid text here", "d1"),     # bad lang
        ("https://a/1", "en", "dup url row", "d2"),         # dup url (global? per-partition d2 only)
        ("https://b/1", "en", "fine", "d2"),
        ("https://b/1", "en", "fine again", "d2"),          # dup url within d2
        ("https://c/1", "de", "alles gut", "d3"),
    ]
    return spark.createDataFrame(rows, "url string, lang string, text string, day string")


def _suite() -> C.Suite:
    s = C.Suite(name="t", row_key="url")
    s.add(C.not_blank("text"))
    s.add(C.in_set("lang", ("en", "de")))
    s.add(C.uniqueness("url"))
    return s


def test_verdicts_and_violations(pages):
    res = SuiteRunner(_suite()).run(pages, F.col("day"), resume=False)
    v = {(r["partition_id"], r["check_name"]): r for r in res.verdicts.collect()}
    assert v[("d1", "not_blank_text")]["passed"] is False
    assert v[("d1", "not_blank_text")]["violation_count"] == 1
    assert v[("d1", "in_set_lang")]["violation_count"] == 1
    assert v[("d1", "unique_url")]["passed"] is True
    assert v[("d2", "unique_url")]["passed"] is False
    assert v[("d2", "unique_url")]["violation_count"] == 1  # Σ(cnt-1) for b/1
    assert v[("d3", "not_blank_text")]["passed"] is True

    viol = {(r["partition_id"], r["check_name"], r["row_key"]) for r in res.violations.collect()}
    assert ("d1", "not_blank_text", "https://a/2") in viol
    assert ("d1", "in_set_lang", "https://a/3") in viol


def test_predicate_check_gopher_conjunction(pages):
    """predicate() adapts a cleaning-rule boolean (here two Gopher/C4
    flags) into a suite RowCheck: blank text violates via the n>0 term,
    normal rows pass, and the check shares the same single-scan
    projection as the other row checks."""
    from reviews_quality_check_spark.functions.quality import gopher_flags

    gf = gopher_flags(F.col("text"))
    s = C.Suite(name="t", row_key="url")
    s.add(C.predicate("gopher_core", gf["mean_word_len_ok"] & gf["no_brace"]))
    res = SuiteRunner(s).run(pages, F.col("day"), resume=False)
    viol = {
        (r["partition_id"], r["row_key"])
        for r in res.violations.filter(F.col("check_name") == "gopher_core").collect()
    }
    assert ("d1", "https://a/2") in viol  # blank text -> n=0 -> violates
    v = {(r["partition_id"], r["check_name"]): r for r in res.verdicts.collect()}
    assert v[("d3", "gopher_core")]["passed"] is True
    assert v[("d1", "gopher_core")]["passed"] is False


def test_checkpoint_resume_skips_committed(pages, tmp_path, spark):
    out = str(tmp_path / "suite_out")
    runner = SuiteRunner(_suite(), out_dir=out)

    # run 1: only d1 visible (simulates a run killed before d2/d3)
    runner.run(pages.filter(F.col("day") == "d1"), F.col("day"), resume=True)
    assert set(runner.committed_partitions(spark)) == {"d1"}

    # run 2: full input; d1 must be skipped, d2/d3 processed
    res = runner.run(pages, F.col("day"), resume=True)
    assert res.partitions_skipped == 1
    assert set(runner.committed_partitions(spark)) == {"d1", "d2", "d3"}

    verdicts = spark.read.parquet(out + "/verdicts")
    v = {(r["partition_id"], r["check_name"]): r["passed"] for r in verdicts.collect()}
    assert v[("d1", "not_blank_text")] is False  # from run 1, preserved
    assert v[("d2", "unique_url")] is False
    assert v[("d3", "not_blank_text")] is True

    # run 3: everything committed -> nothing recomputed
    res3 = runner.run(pages, F.col("day"), resume=True)
    assert res3.partitions_processed == 0
    assert res3.partitions_skipped == 3

    lineage = spark.read.parquet(out + "/lineage")
    per_part = {r["partition_id"]: r["rows_scanned"] for r in lineage.collect()}
    assert per_part == {"d1": 3, "d2": 3, "d3": 1}
    # idempotency: each partition committed exactly once
    assert lineage.count() == 3


def test_rerun_without_resume_is_idempotent(pages, tmp_path, spark):
    out = str(tmp_path / "suite_out2")
    runner = SuiteRunner(_suite(), out_dir=out)
    runner.run(pages, F.col("day"), resume=False)
    first = sorted(
        tuple(r) for r in spark.read.parquet(out + "/verdicts").collect()
    )
    runner.run(pages, F.col("day"), resume=False)  # overwrite same partitions
    second = sorted(
        tuple(r) for r in spark.read.parquet(out + "/verdicts").collect()
    )
    assert first == second
