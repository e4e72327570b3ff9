"""Streaming ingest dedup: exactly-once emission per url within the
watermark horizon, dedup state survives a checkpoint restart, and the
operator's plan is the bounded-state dropDuplicatesWithinWatermark
(not the unbounded dropDuplicates)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from reviews_quality_check_spark.streaming.ingest_dedup import dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_batch(spark, src, rows):
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string")
    df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp")).write.mode(
        "append"
    ).parquet(src)


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        dedup_stream(stream, ["url"], "warc_ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_first_arrival_wins_and_state_survives_restart(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    _write_batch(
        spark,
        src,
        [
            ("u/a", "2024-01-01 00:00:00", "first-a"),
            ("u/a", "2024-01-01 00:10:00", "dup-a"),
            ("u/b", "2024-01-01 00:20:00", "first-b"),
        ],
    )
    _run(spark, src, ckpt, out)
    got = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert set(got) == {"u/a", "u/b"}

    # restart on the same checkpoint with a NEW file: the in-horizon
    # duplicate of u/a is still suppressed (state restored), u/c emits
    _write_batch(
        spark,
        src,
        [
            ("u/a", "2024-01-01 00:30:00", "dup-a-2"),
            ("u/c", "2024-01-01 00:40:00", "first-c"),
        ],
    )
    _run(spark, src, ckpt, out)
    rows = spark.read.parquet(out).collect()
    assert sorted(r.url for r in rows) == ["u/a", "u/b", "u/c"]
    assert {r.url: r.text for r in rows}["u/a"] == "first-a"


def test_plan_uses_watermarked_dedup(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.concat(F.lit("u/"), F.col("value").cast("string")).alias("url"),
            F.col("timestamp").alias("warc_ts"),
        )
    )
    d = dedup_stream(stream, ["url"], "warc_ts", "1 hour")
    plan = d._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan
