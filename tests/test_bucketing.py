"""Bucketed co-located joins: pre-bucketing both sides of a recurring
join key removes the shuffle entirely — the storage-layout strategy the
engine recommends for repeated fact-fact joins at 100 TB (SCALE.md)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")

    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    # external tables under tmp (warehouse.dir is a static conf)
    a.write.bucketBy(8, "k").sortBy("k").option("path", str(tmp_path / "ta")).mode(
        "overwrite"
    ).saveAsTable("t_bucket_a")
    b.write.bucketBy(8, "k").sortBy("k").option("path", str(tmp_path / "tb")).mode(
        "overwrite"
    ).saveAsTable("t_bucket_b")

    joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: the sort-merge join must read both bucketed tables
    # without any Exchange
    assert "SortMergeJoin" in plan
    assert not re.search(r"Exchange hashpartitioning", plan), plan[:2000]
    assert joined.count() == 10_000

    # control: the same join on plain parquet DOES shuffle
    a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
    b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
    plain = spark.read.parquet(str(tmp_path / "pa")).join(
        spark.read.parquet(str(tmp_path / "pb")), "k"
    )
    plan2 = plain._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"Exchange hashpartitioning", plan2)

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
