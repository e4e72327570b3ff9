"""Incremental mergeable column states: merged == direct, ingest cost
is one scan of the NEW partition only, HLL estimate within band."""

from __future__ import annotations

import pyspark.sql.functions as F

from reviews_quality_check_spark.operators.incremental_stats import (
    append_states,
    compute_states,
    merge_states,
)


def _frame(spark, lo, hi, part):
    return (
        spark.range(lo, hi)
        .select(
            F.lit(part).alias("day"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 100).cast("long").alias("n_chars"),
            F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
            F.when(F.col("id") % 10 == 0, F.lit(None))
            .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
            .alias("text"),
        )
    )


COLS = dict(numeric_cols=("doc_id", "n_chars"), string_cols=("source", "text"))


def test_merged_equals_direct(spark):
    d1 = _frame(spark, 0, 500, "d1")
    d2 = _frame(spark, 500, 1200, "d2")
    both = d1.unionByName(d2)
    # states computed per-partition separately, then merged...
    s1 = compute_states(d1, "day", **COLS)
    s2 = compute_states(d2, "day", **COLS)
    merged = {
        r["col_name"]: r for r in merge_states(s1.unionByName(s2)).collect()
    }
    # ...must equal the single-pass direct computation over the union
    direct = {
        r["col_name"]: r
        for r in merge_states(compute_states(both, "day", **COLS)).collect()
    }
    for c in ("doc_id", "n_chars", "source", "text"):
        m, d = merged[c], direct[c]
        assert (m["row_count"], m["null_count"]) == (d["row_count"], d["null_count"])
        assert (m["min_value"], m["max_value"]) == (d["min_value"], d["max_value"])
        assert m["mean_value"] == d["mean_value"]
        assert m["distinct_estimate"] == d["distinct_estimate"]  # sketch-exact union
    # spot-check exact values
    assert merged["doc_id"]["row_count"] == 1200
    assert merged["text"]["null_count"] == 120
    assert merged["text"]["null_rate"] == 0.1
    assert float(merged["doc_id"]["min_value"]) == 0.0
    assert float(merged["doc_id"]["max_value"]) == 1199.0
    assert merged["doc_id"]["mean_value"] == 599.5
    assert merged["n_chars"]["mean_value"] == 49.5  # 12 full 0..99 cycles


def test_hll_estimate_within_band(spark):
    d = _frame(spark, 0, 2000, "d")
    got = {r["col_name"]: r for r in merge_states(compute_states(d, "day", **COLS)).collect()}
    assert abs(got["doc_id"]["distinct_estimate"] - 2000) / 2000 < 0.05
    assert abs(got["source"]["distinct_estimate"] - 7) < 0.5  # tiny card: exact regime


def test_append_states_idempotent_and_incremental(spark, tmp_path):
    out = str(tmp_path / "states")
    append_states(compute_states(_frame(spark, 0, 300, "d1"), "day", **COLS), out)
    # re-ingesting d1 (crash replay) must not double-count...
    append_states(compute_states(_frame(spark, 0, 300, "d1"), "day", **COLS), out)
    # ...and ingesting d2 only adds d2's states
    append_states(compute_states(_frame(spark, 300, 800, "d2"), "day", **COLS), out)
    states = spark.read.parquet(out)
    assert states.filter(F.col("col_name") == "doc_id").count() == 2  # d1, d2 once each
    got = {r["col_name"]: r for r in merge_states(states).collect()}
    assert got["doc_id"]["row_count"] == 800
    assert float(got["doc_id"]["max_value"]) == 799.0
