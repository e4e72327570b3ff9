"""Schema-contract validation + freshness staleness gate."""

from __future__ import annotations

import pyspark.sql.functions as F

from reviews_quality_check_spark.plans import checks as C
from reviews_quality_check_spark.plans.runner import SuiteRunner
from reviews_quality_check_spark.plans.schema_check import (
    check_schema,
    schema_passes,
    schema_verdicts,
)


def _frame(spark):
    return spark.range(1).select(
        F.lit(1).cast("long").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit(2.5).alias("score"),
    )


EXPECTED = (("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
            ("score", "int"))


def test_schema_verdict_statuses(spark):
    d = _frame(spark)
    rows = {r[0]: r for r in schema_verdicts(d, EXPECTED)}
    assert rows["doc_id"][3] == "ok"
    assert rows["text"][3] == "ok"
    assert rows["lang"] == ("lang", "string", None, "missing")
    assert rows["score"] == ("score", "int", "double", "type_mismatch")
    # no extra here; drop 'text' from expected -> it becomes extra
    rows2 = {r[0]: r for r in schema_verdicts(d, EXPECTED[:1])}
    assert rows2["text"] == ("text", None, "double", "extra") or rows2["text"][3] == "extra"


def test_schema_check_dataframe_is_literal_plan(spark):
    d = _frame(spark)
    out = check_schema(spark, d, EXPECTED)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan" not in plan or "Range" in plan  # no data-source scan
    got = {r["col_name"]: r["status"] for r in out.collect()}
    assert got == {"doc_id": "ok", "text": "ok", "lang": "missing",
                   "score": "type_mismatch"}


def test_schema_passes_gate(spark):
    d = _frame(spark)
    good = (("doc_id", "bigint"), ("text", "string"), ("score", "double"))
    assert schema_passes(d, good)
    assert not schema_passes(d, good[:2])             # extra 'score'
    assert schema_passes(d, good[:2], allow_extra=True)
    assert not schema_passes(d, EXPECTED)             # missing + mismatch


def _events(spark, rows):
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("event_id"),
                F.to_timestamp(F.lit(ts)).alias("ts"),
                F.lit(et).alias("event_type"),
            )
            for i, ts, et in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def test_freshness_boundary_and_stale(spark):
    # asof 2024-02-03: 'fresh' newest = 2024-01-27 -> age exactly 7
    # (PASSES, <= bound); 'stale' newest = 2024-01-26 -> age 8 (fails)
    d = _events(spark, [
        (1, "2024-01-20 00:00:00", "fresh"),
        (2, "2024-01-27 23:59:59", "fresh"),
        (3, "2024-01-26 12:00:00", "stale"),
    ])
    suite = C.Suite(name="fr", row_key="event_id")
    suite.add(C.freshness("ts", max_age_days=7, asof="2024-02-03"))
    res = SuiteRunner(suite).run(d, F.col("event_type"), resume=False)
    got = {r["partition_id"]: r for r in res.verdicts.collect()}
    assert got["fresh"]["passed"] and got["fresh"]["metric_value"] == 7.0
    assert not got["stale"]["passed"] and got["stale"]["metric_value"] == 8.0


def _docs_fd(spark, rows):
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("doc_id"),
                (F.lit(k) if k is not None else F.lit(None)).cast("string").alias("k"),
                (F.lit(v) if v is not None else F.lit(None)).cast("string").alias("v"),
                F.lit(p).alias("part"),
            )
            for i, k, v, p in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def test_functional_dependency_counts_and_nulls(spark):
    # k=a maps to {x, y} -> 1 violating key; k=b maps to {x} twice -> ok;
    # null key excluded; null dependent doesn't count as a value
    d = _docs_fd(spark, [
        (1, "a", "x", "p"),
        (2, "a", "y", "p"),
        (3, "b", "x", "p"),
        (4, "b", "x", "p"),
        (5, None, "z", "p"),
        (6, "c", None, "p"),
        (7, "c", "w", "p"),
    ])
    suite = C.Suite(name="fd", row_key="doc_id")
    suite.add(C.functional_dependency("k", "v"))
    res = SuiteRunner(suite).run(d, F.col("part"), resume=False)
    r = res.verdicts.collect()[0]
    assert r["check_name"] == "fd_k_v"
    assert r["violation_count"] == 1 and not r["passed"]
    # tolerance threshold: allow 1 inconsistent key -> passes
    suite2 = C.Suite(name="fd2", row_key="doc_id")
    suite2.add(C.functional_dependency("k", "v", max_violations=1))
    r2 = SuiteRunner(suite2).run(d, F.col("part"), resume=False).verdicts.collect()[0]
    assert r2["passed"]
