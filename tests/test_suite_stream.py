"""Streaming suite verdicts: batch-twin equality (the batch run of the
identical function is the oracle), append-mode watermark semantics,
and exactly-once verdicts across a checkpoint restart."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

import reviews_quality_check_spark.plans.checks as C
from reviews_quality_check_spark.streaming.suite_stream import validate_stream

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

ROWS_BATCH1 = [
    # window 00:00: one blank text (violation), one bad lang
    ("u/1", "2024-01-01 00:05:00", "good words here", "en"),
    ("u/2", "2024-01-01 00:15:00", "   ", "en"),
    ("u/3", "2024-01-01 00:25:00", "more good text", "xx"),
    # window 01:00: all clean
    ("u/4", "2024-01-01 01:10:00", "clean row", "de"),
    ("u/5", "2024-01-01 01:20:00", "another clean row", "fr"),
]
ROWS_FLUSH = [
    # window 03:00: advances the watermark past both earlier windows
    ("u/6", "2024-01-01 03:30:00", "flush row", "en"),
]


def _suite() -> C.Suite:
    s = C.Suite(name="stream_suite", row_key="url")
    s.add(C.not_blank("text"))
    s.add(C.in_set("lang", ("en", "de", "fr")))
    return s


def _write(spark, src, rows):
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string, lang string")
    df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp")).write.mode(
        "append"
    ).parquet(src)


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        validate_stream(stream, _suite(), "warc_ts", "1 hour", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_matches_batch_twin_and_is_exactly_once(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    _write(spark, src, ROWS_BATCH1)
    _run(spark, src, ckpt, out)
    # append mode: nothing emitted until the watermark passes a close
    emitted = spark.read.schema(
        "window_start timestamp, check_name string, n_rows long, "
        "violation_count long, passed boolean"
    ).parquet(out)
    assert emitted.count() == 0

    _write(spark, src, ROWS_FLUSH)
    _run(spark, src, ckpt, out)
    got = {
        (str(r.window_start), r.check_name): (r.n_rows, r.violation_count, r.passed)
        for r in spark.read.parquet(out).collect()
    }
    # the two closed windows emitted; the 03:00 window is still open
    assert len(got) == 4
    # batch twin on the same rows = the oracle
    batch = (
        spark.createDataFrame(
            ROWS_BATCH1 + ROWS_FLUSH,
            "url string, warc_ts string, text string, lang string",
        )
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    )
    twin = {
        (str(r.window_start), r.check_name): (r.n_rows, r.violation_count, r.passed)
        for r in validate_stream(batch, _suite(), "warc_ts", "1 hour").collect()
        if str(r.window_start) < "2024-01-01 03"
    }
    assert got == twin
    # hand-check the violating window
    assert got[("2024-01-01 00:00:00", "not_blank_text")] == (3, 1, False)
    assert got[("2024-01-01 00:00:00", "in_set_lang")] == (3, 1, False)
    assert got[("2024-01-01 01:00:00", "not_blank_text")] == (2, 0, True)

    # restart on the same checkpoint with no new data: no re-emission
    _run(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == 4


def test_validate_stream_requires_row_checks(spark):
    import pytest

    df = spark.range(1).select(
        F.lit("u").alias("url"),
        F.current_timestamp().alias("warc_ts"),
    )
    with pytest.raises(ValueError):
        validate_stream(df, C.Suite(name="empty", row_key="url"))


def test_all_null_violation_window_matches_batch(spark, tmp_path):
    """ADVICE r5 #2: a RowCheck whose violation expression is NULL for
    every row in a window must yield violation_count=0 / passed=true
    (the batch runner's coalesce semantics), not NULL/NULL."""
    import pyspark.sql.functions as F

    from reviews_quality_check_spark.plans import checks as C
    from reviews_quality_check_spark.streaming.suite_stream import validate_stream

    df = spark.range(10).select(
        F.lit("2024-01-01 00:10:00").cast("timestamp").alias("warc_ts"),
        F.col("id").alias("v"),
    )
    suite = C.Suite(name="nulls", row_key="v")
    # violation NULL on every row (NULL boolean expression)
    suite.add(C.RowCheck(name="null_check", violation=F.lit(None).cast("boolean")))
    out = validate_stream(df, suite, ts_col="warc_ts", window="1 hour").collect()
    assert len(out) == 1
    assert out[0]["violation_count"] == 0
    assert bool(out[0]["passed"]) is True
