"""Partition pruning: the engine's analog of the reference's file-level
domain pre-filter (X1, review_analysis.py:183-200) — an Iceberg-style
date/lang-partitioned table must scan only matching partitions when a
suite filters on the partition column."""

from __future__ import annotations

from pyspark.sql import functions as F

from reviews_quality_check_spark.sources.pages import synth_pages


def test_date_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "pages_partitioned")
    pages = synth_pages(spark, 5000, n_days=7).withColumn(
        "day", F.to_date("warc_ts")
    )
    pages.write.partitionBy("day").parquet(out)

    t = spark.read.parquet(out)
    one_day = t.filter(F.col("day") == "2024-03-02").select("url", "text")

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # pruned scan: the physical partition count in the scan must be the
    # single matching day, visible as partition filters in the plan
    assert "PartitionFilters" in plan
    assert "2024-03-02" in plan or "isnotnull(day" in plan

    # behavioral check: row counts match a full-scan filter
    full = synth_pages(spark, 5000, n_days=7).withColumn("day", F.to_date("warc_ts"))
    expected = full.filter(F.col("day") == "2024-03-02").count()
    assert one_day.count() == expected
    assert expected > 0


def test_lang_partition_pruning_counts(spark, tmp_path):
    out = str(tmp_path / "pages_by_lang")
    synth_pages(spark, 3000).write.partitionBy("lang").parquet(out)
    t = spark.read.parquet(out)
    en = t.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert en.count() > 0
