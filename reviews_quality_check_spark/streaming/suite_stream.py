"""Streaming twin of the constraint-suite runner: continuous
validation of arriving pages.

The batch engine compiles a Suite's RowChecks into one projection +
one aggregate per partition (plans/runner.py). Row checks are pure
Column predicates, so the identical compilation streams: watermarked
event-time windows replace the static partition column, and each
micro-batch folds its rows into per-(window, check) violation counts
— Spark's streaming state keeps the running window aggregates and
emits a window's final verdict when the watermark passes its close.

Scope split (why ONLY row checks stream here): the suite's AggChecks
are corpus-shaped — uniqueness is the streaming ingest_dedup
operator's job (bounded dropDuplicatesWithinWatermark state), and
distribution drift is drift_stream's job (windowed histogram KL).
Together the four streaming modules are the full engine's
row/uniqueness/drift surface in continuous form; this module
completes the suite-verdict shape (same output columns as the batch
runner's verdicts, keyed by window instead of partition).

Replay semantics: counts are micro-batch-log deterministic — a
checkpoint restart replays the same batch contents, so emitted
verdicts are exactly-once per window (append mode emits a window only
once, after watermark close).

Reference parity: the reference validates eagerly per input file
(review_analysis.py:228-344, one metrics dict per file); a file IS an
arrival window, so windowed streaming verdicts are that loop's
continuous re-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reviews_quality_check_spark.plans.checks import Suite


def validate_stream(
    stream: DataFrame,
    suite: Suite,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed row-check verdicts over a (possibly streaming)
    DataFrame.

    Output: (window_start: timestamp, check_name: string,
    n_rows: long, violation_count: long, passed: boolean) — one row
    per (event-time window, RowCheck), passed iff the window's
    violation rate is within the check's max_violation_rate.

    Works identically on a batch DataFrame (the groupBy(window(...))
    is the same plan without state) — the batch run IS the oracle for
    the streaming run, and the pytest asserts their equality.

    Scale: one projection on the scan (all checks share it, same as
    the batch runner), one windowed aggregate with map-side combine;
    state is O(open windows x checks), independent of row volume.
    """
    if not suite.row_checks:
        raise ValueError("validate_stream needs at least one RowCheck")
    # coalesce BEFORE the cast (ADVICE r5 #2): a RowCheck whose violation
    # expression is NULL for every row in a window must count 0 and pass,
    # matching SuiteRunner._flagged's batch semantics — a raw NULL sum
    # would yield NULL violation_count / NULL passed.
    flags = [
        F.coalesce(c.violation, F.lit(False)).cast("int").alias(f"__v{i}")
        for i, c in enumerate(suite.row_checks)
    ]
    src = stream
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    agg = src.select(ts_col, *flags).groupBy(
        F.window(F.col(ts_col), window).alias("__w")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(f"__v{i}").alias(f"__s{i}")
            for i in range(len(suite.row_checks))
        ],
    )
    per_check = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"__s{i}").alias("violation_count"),
                F.lit(c.max_violation_rate).alias("__max_rate"),
            )
            for i, c in enumerate(suite.row_checks)
        ]
    )
    return (
        agg.select(
            F.col("__w.start").alias("window_start"),
            F.col("__n").alias("n_rows"),
            F.explode(per_check).alias("c"),
        )
        .select(
            "window_start",
            F.col("c.check_name").alias("check_name"),
            "n_rows",
            F.col("c.violation_count").alias("violation_count"),
            (
                F.col("c.violation_count")
                <= F.col("c.__max_rate") * F.col("n_rows")
            ).alias("passed"),
        )
    )
