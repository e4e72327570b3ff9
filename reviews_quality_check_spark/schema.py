"""Canonical StructTypes for the engine.

The primary input is the ``pages`` table (BASELINE.json input_hint): an
Iceberg-style table of Common-Crawl-style web pages. The ``reviews``
shape mirrors the reference's JSON envelope rows
(/root/reference/review_analysis.py:245-259, reduce_dataset.py:55-56) so
pass/fail semantics can be compared 1:1 in the parity tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- Primary input: Common-Crawl-style web pages -----------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# -- Reference-parity fixture: review rows ------------------------------------
# reference: review_analysis.py:245-259 ({id,text,sentiment} + file domain)
REVIEWS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("sentiment", T.StringType(), True),
        T.StructField("domain", T.StringType(), True),
    ]
)

# -- Engine output tables ------------------------------------------------------
# One row per (partition, check): the per-partition verdict required by the
# north rule. "partition" is the engine's logical validation unit (e.g. a
# warc_ts day / block id), not a physical Spark partition.
VERDICTS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("violation_count", T.LongType(), False),
        T.StructField("metric_value", T.DoubleType(), True),
        T.StructField("threshold", T.DoubleType(), True),
    ]
)

# One row per violating input row per check (bounded by per-check caps).
VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("row_key", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Lineage/metrics rows appended per completed partition (north_rule):
# the checkpoint commit log that resume anti-joins against.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("suite_name", T.StringType(), False),
        T.StructField("rows_scanned", T.LongType(), False),
        T.StructField("checks_run", T.IntegerType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal: opaque binary payload + typed metadata (decode is stubbed in
# operators/multimodal.py; the Spark-side plumbing is real).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
