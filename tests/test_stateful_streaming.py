"""applyInPandasWithState: per-key running violation rate accumulates
correctly across MULTIPLE micro-batches (state survives between
triggers) and across restarts (checkpointed state)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from reviews_quality_check_spark.streaming.stateful_counts import start_monitor

SCHEMA = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("is_violation", T.BooleanType())]
)


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _write_batch(spark, src, [("en", True), ("en", False), ("de", False)])
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = start_monitor(stream, ckpt, out)
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [("en", True), ("de", True), ("de", False)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    # latest update per key = cumulative across both batches
    latest = {}
    for r in rows:
        if r["key"] not in latest or r["rows_seen"] > latest[r["key"]]["rows_seen"]:
            latest[r["key"]] = r
    assert latest["en"]["rows_seen"] == 3
    assert latest["en"]["violations_seen"] == 2
    assert latest["en"]["violation_rate"] == 2 / 3
    assert latest["de"]["rows_seen"] == 3
    assert latest["de"]["violations_seen"] == 1

    # restart from checkpoint: state must survive
    _write_batch(spark, src, [("en", False)])
    stream2 = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q2 = start_monitor(stream2, ckpt, out)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows2 = spark.read.parquet(out).collect()
    en_max = max(r["rows_seen"] for r in rows2 if r["key"] == "en")
    assert en_max == 4  # 3 from before the restart + 1 after
