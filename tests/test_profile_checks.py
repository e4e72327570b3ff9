"""Profile-suite AggCheck constructors: referential (broadcast dim),
distinct-count floor (exact two-phase + HLL sketch variant), and the
integer-exact type-1 percentile floor."""

from __future__ import annotations

from pyspark.sql import functions as F

from reviews_quality_check_spark.plans import checks as C
from reviews_quality_check_spark.plans.runner import SuiteRunner


def _docs(spark, rows):
    """rows: (doc_id, lang, source, n_chars) as a pure-JVM literal plan."""
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("doc_id"),
                F.lit(lang).alias("lang"),
                (F.lit(src) if src is not None else F.lit(None).cast("string")).alias(
                    "source"
                ),
                F.lit(n).cast("long").alias("n_chars"),
            )
            for i, lang, src, n in rows
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def _dim(spark, values):
    return spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in values])).alias("src")
    )


def _run(spark, df, check):
    suite = C.Suite(name="t", row_key="doc_id")
    suite.add(C.not_null("n_chars"))
    suite.add(check)
    res = SuiteRunner(suite).run(df, F.col("lang"), resume=False)
    return {
        (r.partition_id, r.check_name): r
        for r in res.verdicts.collect()
    }


def test_referential_counts_unmatched_non_null_fks(spark):
    d = _docs(
        spark,
        [(1, "en", "a", 5), (2, "en", "rogue", 5), (3, "en", None, 5), (4, "de", "a", 5)],
    )
    out = _run(spark, d, C.referential("source", _dim(spark, ["a", "b"]), "src"))
    en = out[("en", "referential_source")]
    # NULL fk is not a violation; only the rogue row counts
    assert en.violation_count == 1 and en.passed is False
    de = out[("de", "referential_source")]
    assert de.violation_count == 0 and de.passed is True


def test_referential_plan_broadcasts_dim(spark):
    d = _docs(spark, [(1, "en", "a", 5)])
    ck = C.referential("source", _dim(spark, ["a"]), "src")
    plan = ck.plan(
        d.select(F.col("lang").alias("__part"), "source"), "__part"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_distinct_count_exact_and_hll_agree_within_rsd(spark):
    rows = [(i, "en", "a", i % 7) for i in range(500)] + [
        (i, "de", "a", i) for i in range(1000, 1020)
    ]
    d = _docs(spark, rows)
    exact = _run(spark, d, C.distinct_count_min("doc_id", 1))
    assert exact[("en", "distinct_min_doc_id")].metric_value == 500.0
    assert exact[("de", "distinct_min_doc_id")].metric_value == 20.0
    approx = _run(spark, d, C.distinct_count_min("doc_id", 1, approx=True, rsd=0.05))
    for part, n in (("en", 500.0), ("de", 20.0)):
        est = approx[(part, "distinct_min_doc_id_approx")].metric_value
        assert abs(est - n) / n <= 0.15  # 3x rsd headroom


def test_distinct_count_floor_fail_branch(spark):
    d = _docs(spark, [(1, "xx", "a", 5), (2, "xx", "a", 5)])
    out = _run(spark, d, C.distinct_count_min("doc_id", 10))
    assert out[("xx", "distinct_min_doc_id")].passed is False


def test_quantile_min_type1_semantics(spark):
    # n=4 values [1,2,3,4]: p50 = smallest v with 100*cum >= 50*4 -> v=2
    d = _docs(spark, [(i, "en", "a", n) for i, n in enumerate([1, 2, 3, 4])])
    out = _run(spark, d, C.quantile_min("n_chars", 50, 2))
    r = out[("en", "p50_min_n_chars")]
    assert r.metric_value == 2.0 and r.passed is True
    # p75: smallest v with 100*cum >= 75*4=300 -> cum(3)=3 -> v=3
    out = _run(spark, d, C.quantile_min("n_chars", 75, 4))
    r = out[("en", "p75_min_n_chars")]
    assert r.metric_value == 3.0 and r.passed is False
