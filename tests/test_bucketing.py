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


def test_asof_join_semantics(spark):
    """asof_join: nearest prior-or-equal right row per key; null when no
    prior row; equal-ts right row matches (inclusive); keys isolated."""
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", "p1"), (1, "2024-01-01 00:00:30", "p0"),
         (2, "2024-01-01 00:01:00", "p2")],
        "k long, ts string, pid string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10), (1, "2024-01-01 00:05:00", 20),
         (2, "2024-01-01 00:02:00", 30)],
        "k long, ts string, v int",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["pid"]: r["asof_v"]
        for r in asof_join(
            left, right, key_cols=("k",), left_ts="ts", right_ts="ts",
            right_value_cols=("v",),
        ).collect()
    }
    assert got["p1"] == 20    # equal ts matches (inclusive bound)
    assert got["p0"] is None  # no prior right row
    assert got["p2"] is None  # key 2's right row is later; key 1 invisible


def test_asof_join_matched_row_nulls_and_dup_ties(spark):
    """The matched right row travels as ONE struct: a NULL field in the
    matched row stays NULL (never back-filled from an older right row),
    and duplicate-(key, ts) right rows resolve deterministically to the
    field-wise-greatest row (ADVICE r2 medium)."""
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", "pA"), (2, "2024-01-01 00:10:00", "pB")],
        "k long, ts string, pid string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        # key 1: older row has v=5,w='old'; NEWER matched row has v NULL.
        # key 2: two right rows share ts 00:02 -> greatest struct wins.
        [(1, "2024-01-01 00:01:00", 5, "old"),
         (1, "2024-01-01 00:05:00", None, "new"),
         (2, "2024-01-01 00:02:00", 7, "x"),
         (2, "2024-01-01 00:02:00", 9, "y")],
        "k long, ts string, v int, w string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        r["pid"]: (r["asof_v"], r["asof_w"])
        for r in asof_join(
            left, right, key_cols=("k",), left_ts="ts", right_ts="ts",
            right_value_cols=("v", "w"),
        ).collect()
    }
    assert rows["pA"] == (None, "new")  # NULL not stitched from the old row
    assert rows["pB"] == (9, "y")       # deterministic duplicate-ts winner


def test_range_join_bucketed_boundaries(spark):
    """Inclusive bounds on both ends; points outside excluded; intervals
    spanning multiple buckets still match exactly once per point."""
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.operators.asof import range_join_bucketed

    pts = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:30:00"),
         ("c", "2024-01-01 01:15:00"), ("d", "2024-01-01 02:00:01")],
        "pid string, pts string",
    ).withColumn("pts", F.to_timestamp("pts"))
    # one 2-hour interval: spans 5 buckets at 1800s
    iv = spark.createDataFrame(
        [("i1", "2024-01-01 00:00:00", "2024-01-01 02:00:00")],
        "iid string, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    got = sorted(
        r["pid"]
        for r in range_join_bucketed(pts, iv, "pts", "s", "e", bucket_seconds=1800).collect()
    )
    assert got == ["a", "b", "c"]  # start inclusive, end inclusive, d is 1s late


def test_asof_and_range_join_property(spark):
    """Property check on a pseudo-random fixture: asof_join equals the
    brute-force 'max right ts <= left ts per key' answer, and
    range_join_bucketed equals the brute-force BETWEEN join, across
    bucket widths."""
    import hashlib

    from pyspark.sql import functions as F

    from reviews_quality_check_spark.operators.asof import asof_join, range_join_bucketed

    def h(i, salt):
        return int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8], 16)

    base = 1700000000
    lrows = [(h(i, "k") % 5, base + h(i, "lt") % 86_400, f"L{i}") for i in range(120)]
    rrows = [(h(i, "rk") % 5, base + h(i, "rt") % 86_400, i) for i in range(150)]
    left = spark.createDataFrame(lrows, "k long, ep long, pid string").select(
        "k", F.timestamp_seconds("ep").alias("ts"), "pid"
    )
    right = spark.createDataFrame(rrows, "k long, ep long, rid long").select(
        "k", F.timestamp_seconds("ep").alias("ts"), "rid"
    )
    # dedupe right per (k, ts) for a deterministic asof answer
    right1 = right.groupBy("k", "ts").agg(F.max("rid").alias("rid"))

    got = {
        r["pid"]: r["asof_rid"]
        for r in asof_join(left, right1, ("k",), "ts", "ts", ("rid",)).collect()
    }
    rmap = {}
    for row in right1.collect():
        rmap.setdefault(row["k"], []).append((row["ts"], row["rid"]))
    want = {}
    for k, ts, pid in [(r["k"], r["ts"], r["pid"]) for r in left.collect()]:
        cands = [(t, rid) for t, rid in rmap.get(k, []) if t <= ts]
        want[pid] = max(cands)[1] if cands else None
    assert got == want

    # range join: points=left rows, intervals=right rows +- widths
    iv = right.select(
        "rid", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 47 MINUTES")).alias("e"),
    )
    pts = left.select("pid", F.col("ts").alias("pts"))
    for bw in (60, 1800, 7200):
        got_pairs = {
            (r["pid"], r["rid"])
            for r in range_join_bucketed(pts, iv, "pts", "s", "e", bucket_seconds=bw).collect()
        }
        want_pairs = {
            (r["pid"], r["rid"])
            for r in pts.join(iv, (F.col("pts") >= F.col("s")) & (F.col("pts") <= F.col("e"))).collect()
        }
        assert got_pairs == want_pairs, f"bucket_seconds={bw}"
