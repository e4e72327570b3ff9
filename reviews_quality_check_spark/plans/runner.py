"""Suite runner: compile a Suite to DataFrame plans, emit per-partition
verdicts + violation rows + lineage, checkpoint to a commit log, resume.

Plan shape (the 100 TB story):
  - ALL RowChecks evaluate in ONE projection over ONE scan of the input
    (violation flags are plain boolean columns → whole-stage codegen).
  - Violation rows come from exploding a compacted array<struct> of
    failed checks per row — rows with no violations contribute nothing.
  - Per-partition counts are a single groupBy over the flag columns
    (map-side partial aggregation, narrow shuffle: one row per
    partition_id per reducer).
  - Each AggCheck contributes its own bounded-shuffle plan (salted
    aggregates, window histograms) and unions into the verdict table.

Checkpoint/resume (north_rule): verdicts/violations are written
partitioned by partition_id with dynamic partition overwrite (an
idempotent per-partition commit, the parquet-dir stand-in for an
Iceberg table in this sandbox); lineage rows are appended LAST, so a
killed run simply re-processes partitions that have no lineage row.
``run(resume=True)`` anti-joins the input against committed lineage.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from reviews_quality_check_spark.plans.checks import Suite

# Flagged-projection caches of previous runs (bounded to one entry):
# dropped at the start of the next run — see SuiteRunner.run.
_RUN_CACHES: list[DataFrame] = []


@dataclass
class SuiteResult:
    verdicts: DataFrame
    violations: DataFrame
    partitions_processed: int
    partitions_skipped: int


class SuiteRunner:
    def __init__(self, suite: Suite, out_dir: str | None = None,
                 violation_cap_per_check: int = 10000):
        self.suite = suite
        self.out_dir = out_dir
        self.cap = violation_cap_per_check

    # -- compile -------------------------------------------------------------
    def _flagged(self, df: DataFrame, partition_expr: Column) -> DataFrame:
        """NARROW per-row projection: partition, row key, one boolean per
        RowCheck, lazily-evaluated details (only on violating rows), plus
        the columns AggChecks declare via ``requires``. This is the frame
        the runner persists — O(checks) bytes per row, never the payload
        columns, so caching it is cheap even when rows carry html blobs.
        """
        suite = self.suite
        cols = [
            partition_expr.cast("string").alias("__part"),
            F.col(suite.row_key).cast("string").alias("__key"),
        ]
        extra = sorted(
            {c for ac in suite.agg_checks for c in getattr(ac, "requires", ())}
        )
        cols += [F.col(c) for c in extra]
        for i, rc in enumerate(suite.row_checks):
            flag = F.coalesce(rc.violation, F.lit(False))
            cols.append(flag.alias(f"__v{i}"))
            # detail evaluated only when the row violates (heavy exprs
            # like readability scores stay off the happy path)
            cols.append(F.when(flag, rc.detail_col()).alias(f"__d{i}"))
        return df.select(*cols)

    def violations_plan(self, flagged: DataFrame) -> DataFrame:
        """Exploded violation rows: (partition_id, check_name, row_key, detail)."""
        suite = self.suite
        structs = [
            F.when(
                F.col(f"__v{i}"),
                F.struct(
                    F.lit(rc.name).alias("check_name"),
                    F.col("__key").alias("row_key"),
                    F.col(f"__d{i}").alias("detail"),
                ),
            )
            for i, rc in enumerate(suite.row_checks)
        ]
        if not structs:
            # agg-only suite: no per-row predicates, so no violation rows
            # (an empty F.array() would type as array<void> and break the
            # struct-field extraction below)
            return flagged.sparkSession.createDataFrame(
                [],
                "partition_id string, check_name string, "
                "row_key string, detail string",
            )
        arr = F.array_compact(F.array(*structs))
        return (
            flagged.select(F.col("__part").alias("partition_id"), arr.alias("__viols"))
            .filter(F.size("__viols") > 0)
            .select("partition_id", F.explode("__viols").alias("v"))
            .select(
                "partition_id",
                F.col("v.check_name").alias("check_name"),
                F.col("v.row_key").alias("row_key"),
                F.col("v.detail").alias("detail"),
            )
        )

    def row_verdicts_plan(self, flagged: DataFrame) -> DataFrame:
        """One groupBy: per-partition counts for every RowCheck at once."""
        suite = self.suite
        if not suite.row_checks:
            # agg-only suite (same array<void> guard as violations_plan)
            return flagged.sparkSession.createDataFrame(
                [],
                "partition_id string, check_name string, passed boolean, "
                "violation_count bigint, metric_value double, threshold double",
            )
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, _rc in enumerate(suite.row_checks):
            aggs.append(F.sum(F.col(f"__v{i}").cast("long")).alias(f"__c{i}"))
        counted = flagged.groupBy(F.col("__part").alias("partition_id")).agg(*aggs)

        verdict_structs = [
            F.struct(
                F.lit(rc.name).alias("check_name"),
                (
                    (F.col(f"__c{i}").cast("double") / F.col("__n"))
                    <= F.lit(rc.max_violation_rate)
                ).alias("passed"),
                F.col(f"__c{i}").alias("violation_count"),
                (F.col(f"__c{i}").cast("double") / F.col("__n")).alias("metric_value"),
                F.lit(rc.max_violation_rate).alias("threshold"),
            )
            for i, rc in enumerate(suite.row_checks)
        ]
        return (
            counted.select(
                "partition_id", F.explode(F.array(*verdict_structs)).alias("v")
            )
            .select(
                "partition_id",
                F.col("v.check_name").alias("check_name"),
                F.col("v.passed").alias("passed"),
                F.col("v.violation_count").alias("violation_count"),
                F.col("v.metric_value").alias("metric_value"),
                F.col("v.threshold").alias("threshold"),
            )
        )

    def agg_verdicts_plan(self, base: DataFrame) -> DataFrame | None:
        """``base`` must already carry the ``__part`` column (the flagged
        projection) so agg checks reuse the same (possibly persisted)
        scan instead of re-deriving the input."""
        suite = self.suite
        if not suite.agg_checks:
            return None
        outs = []
        for ac in suite.agg_checks:
            plan = ac.plan(base, "__part")
            if "violation_count" not in plan.columns:
                plan = plan.withColumn("violation_count", F.lit(0).cast("long"))
            outs.append(
                plan.select(
                    "partition_id",
                    F.lit(ac.name).alias("check_name"),
                    ac.passes().alias("passed"),
                    F.col("violation_count").cast("long").alias("violation_count"),
                    F.col("metric_value").cast("double").alias("metric_value"),
                    F.lit(ac.threshold).alias("threshold"),
                )
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    # -- execute ---------------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        partition_expr: Column,
        resume: bool = True,
        persist: bool = True,
        run_seq: int | None = None,
    ) -> SuiteResult:
        """``persist=True`` (default since r6) caches the narrow flagged
        projection (MEMORY_AND_DISK) so the verdict aggregate, the
        violation explode, and every AggCheck reuse ONE evaluation of
        the check expressions — without it each of those plan branches
        re-scans the input and re-evaluates the expensive per-row
        expressions (the 7-check flagship suite paid ~2x flesch + 2x
        gopher + 1x md5 per pass; measured 8.3s -> 4.4s per pass at
        300k pages). The projection is narrow (O(checks) bytes per
        row), so the cache is small even when rows carry html blobs.

        HONESTY GUARD: each run's cache is tagged with a fresh run id
        column so Spark's CacheManager can never serve a PREVIOUS run's
        cache for an identical plan (that would be cross-run result
        caching, not optimization), and the previous run's cache is
        dropped when a new run starts — at most one suite cache is ever
        alive. Every run therefore recomputes from the input exactly
        once."""
        spark = df.sparkSession
        run_id = uuid.uuid4().hex[:12]

        skipped = 0
        if self.out_dir and resume:
            committed = self.committed_partitions(spark)
            if committed:
                all_parts = [
                    r[0]
                    for r in df.select(partition_expr.cast("string").alias("p"))
                    .distinct()
                    .collect()
                ]
                remaining = sorted(set(all_parts) - set(committed))
                skipped = len(all_parts) - len(remaining)
                if not remaining:
                    return SuiteResult(
                        self._read_out("verdicts", spark),
                        self._read_out("violations", spark),
                        0,
                        skipped,
                    )
                df = df.filter(partition_expr.cast("string").isin(remaining))

        flagged = self._flagged(df, partition_expr)
        if persist:
            from pyspark import StorageLevel

            for old in _RUN_CACHES:
                try:
                    old.unpersist()
                except Exception:
                    pass
            _RUN_CACHES.clear()
            # fresh literal per run -> unique plan -> a new cache entry;
            # the column is never selected downstream, so results are
            # unchanged while cross-run cache hits are impossible
            flagged = flagged.withColumn("__cache_epoch", F.lit(run_id))
            flagged = flagged.persist(StorageLevel.MEMORY_AND_DISK)
            _RUN_CACHES.append(flagged)
        verdicts = self.row_verdicts_plan(flagged)
        aggv = self.agg_verdicts_plan(flagged)
        if aggv is not None:
            verdicts = verdicts.unionByName(aggv)
        violations = self.violations_plan(flagged)

        if self.out_dir:
            if run_seq is None:
                run_seq = self.next_run_seq(spark)
            self._commit(spark, run_id, run_seq, flagged, verdicts, violations)
            if persist:
                flagged.unpersist()  # outputs are on disk; drop the cache
            return SuiteResult(
                self._read_out("verdicts", spark),
                self._read_out("violations", spark),
                -1,
                skipped,
            )
        return SuiteResult(verdicts, violations, -1, skipped)

    # -- checkpoint ---------------------------------------------------------------
    def _path(self, name: str) -> str:
        return str(Path(self.out_dir) / name)

    def _read_out(self, name: str, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.parquet(self._path(name))
        except Exception:
            return spark.createDataFrame([], "partition_id string, check_name string")

    def committed_partitions(self, spark: SparkSession) -> list[str]:
        try:
            lineage = spark.read.parquet(self._path("lineage"))
        except Exception:
            return []
        return [
            r[0]
            for r in lineage.filter(F.col("suite_name") == self.suite.name)
            .select("partition_id")
            .distinct()
            .collect()
        ]

    def _commit(
        self,
        spark: SparkSession,
        run_id: str,
        run_seq: int,
        flagged: DataFrame,
        verdicts: DataFrame,
        violations: DataFrame,
    ) -> None:
        """Write outputs partitioned by partition_id (dynamic overwrite =
        idempotent per-partition commit), then append lineage rows last."""
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            verdicts.repartition("partition_id")
            .write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(self._path("verdicts"))
        )
        # Deterministic per-(partition, check) cap: a global limit() would
        # let one high-volume check evict every other check's rows, and the
        # retained subset would vary across partitionings and between
        # one-shot and resumed runs. row_number over row_key pins the
        # retained set.
        from pyspark.sql.window import Window

        capw = Window.partitionBy("partition_id", "check_name").orderBy("row_key")
        (
            violations.withColumn("__rn", F.row_number().over(capw))
            .filter(F.col("__rn") <= self.cap)
            .drop("__rn")
            .repartition("partition_id")
            .write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(self._path("violations"))
        )
        lineage = (
            flagged.groupBy(F.col("__part").alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows_scanned"))
            .select(
                F.lit(run_id).alias("run_id"),
                "partition_id",
                F.lit(self.suite.name).alias("suite_name"),
                "rows_scanned",
                F.lit(
                    len(self.suite.row_checks) + len(self.suite.agg_checks)
                ).cast("int").alias("checks_run"),
                F.current_timestamp().alias("committed_at"),
            )
        )
        # metrics HISTORY (append-only, one row per run x partition x
        # check + a __rows_scanned volume series) — the input
        # history_anomalies() reads. Written BEFORE lineage: lineage is
        # the commit marker, so a crash between the two re-processes the
        # partition on resume. history_anomalies keeps the LAST row per
        # (series, run_seq), which makes the replay invisible WHEN the
        # resume runs under the same run_seq — resume callers should
        # pass the crashed run's run_seq explicitly; with auto-seq the
        # replayed partition lands at a fresh seq instead (a duplicate
        # history point with identical values, harmless to the
        # detectors' thresholds but visible in the series).
        metrics = verdicts.select(
            F.lit(run_id).alias("run_id"),
            F.lit(int(run_seq)).cast("long").alias("run_seq"),
            "partition_id",
            "check_name",
            F.col("violation_count").cast("long").alias("value"),
            F.col("metric_value").cast("double").alias("metric_value"),
        ).unionByName(
            lineage.select(
                "run_id",
                F.lit(int(run_seq)).cast("long").alias("run_seq"),
                "partition_id",
                F.lit("__rows_scanned").alias("check_name"),
                F.col("rows_scanned").cast("long").alias("value"),
                F.lit(None).cast("double").alias("metric_value"),
            )
        )
        metrics.write.mode("append").parquet(self._path("metrics"))
        lineage.write.mode("append").parquet(self._path("lineage"))

    # -- metric history -----------------------------------------------------

    def next_run_seq(self, spark: SparkSession) -> int:
        """Next run sequence number: max committed run_seq + 1 (0 for a
        fresh out_dir). A bounded-metadata read of the metrics sink."""
        try:
            m = spark.read.parquet(self._path("metrics"))
        except Exception:
            return 0
        row = m.agg(F.max("run_seq").alias("mx")).collect()[0]
        return 0 if row["mx"] is None else int(row["mx"]) + 1

    def history_anomalies(
        self,
        spark: SparkSession,
        rel_pct: int = 25,
        z_k: int = 3,
        min_hist: int = 3,
    ) -> DataFrame:
        """Run-over-run anomaly flags from the committed metrics history:
        each (partition, check) violation-count series — plus the
        __rows_scanned volume series (the classic ingestion-drop
        detector) — through plans/anomaly.detect_anomalies. The frame
        is runs x partitions x checks rows: series-sized, never
        corpus-sized. Crash-replayed run_seqs keep only their LAST
        committed row (max run_id is arbitrary but the replayed values
        are identical by the runner's idempotency contract)."""
        from reviews_quality_check_spark.plans.anomaly import detect_anomalies

        m = spark.read.parquet(self._path("metrics"))
        series = (
            m.groupBy(
                F.concat_ws("/", "partition_id", "check_name").alias("metric"),
                F.col("run_seq").alias("window_id"),
            )
            .agg(F.last("value").alias("value"))
        )
        return detect_anomalies(
            series,
            series_col="metric",
            order_col="window_id",
            value_col="value",
            rel_pct=rel_pct,
            z_k=z_k,
            min_hist=min_hist,
        )
