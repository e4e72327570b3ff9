"""Skew stress measurement (VERDICT r3 next-round #6).

SCALE.md claims the salted two-phase aggregate wins on hot keys; this
tool MEASURES it instead of asserting it, on a 90%-one-key fixture at
local[32], for the two aggregate shapes the engine actually runs:

1. uniqueness-check shape (count per key -> dup count): salted
   two-phase (plans/checks.uniqueness) vs direct groupBy. Hash partial
   aggregation collapses the hot key map-side (one row per key per map
   partition), so the expectation is NEAR-PARITY — recording the
   negative result keeps the salting story honest about WHERE salting
   matters.

2. mergeable quantile-digest shape (applyInPandas sketch per key):
   the engine's routed digest (operators/column_stats.quantile_digest:
   hot keys -> salted partial/merge sketch; small keys -> pure-JVM CDF
   read-off) vs an unsalted single-stage groupBy(key).applyInPandas.
   Partial aggregation cannot help a custom Python sketch, so the
   unsalted hot key funnels 90% of all rows through ONE Python worker;
   conversely, an all-Python salted path pays one applyInPandas
   dispatch per tiny (key, salt) group. The r4 routing (added after
   this tool's first measurement showed the all-Python salted path
   LOSING 33.0s vs 8.1s) keeps salting only where it pays.

Prints one JSON line: {"rows": N, "hot_frac": f, "timings": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from reviews_quality_check_spark.session import get_spark

    n_rows = int(os.environ.get("SKEW_ROWS", "2000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_cores = int(cpus) if cpus != "*" else (os.cpu_count() or 8)
    spark = get_spark(app_name="rqc-skew", cores=cpus, shuffle_partitions=n_cores)

    # 90% of rows share one key; the tail is uniform over 100k keys
    df = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("u"), (F.col("id") % 100000).cast("string")))
            .alias("key"),
            F.xxhash64("id").cast("double").alias("v"),  # ~all-distinct: duplicate collapse cannot mask the skew
            F.lit("p0").alias("partition_id"),
        )
        .localCheckpoint()  # freeze the fixture: measure the aggregate, not the generator
    )

    def timed(name, build, passes=3):
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"[skew] {name}: {best:.2f}s", file=sys.stderr)
        return round(best, 3)

    timings = {}
    shapes = set(
        os.environ.get("SKEW_SHAPES", "uniqueness,digest,reservoir").split(",")
    )

    # --- shape 1: uniqueness / dup-count ---------------------------------
    from reviews_quality_check_spark.plans import checks as C  # noqa: E402

    salted_unique = C.uniqueness("key").plan if "uniqueness" in shapes else None

    def unsalted_unique():
        return (
            df.groupBy("partition_id", "key")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("partition_id")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("cnt") >= 2, F.col("cnt") - 1)), F.lit(0)
                ).cast("double").alias("metric_value")
            )
        )

    if "uniqueness" in shapes:
        timings["uniqueness_salted"] = timed(
            "uniqueness salted two-phase", lambda: salted_unique(df, "partition_id")
        )
        timings["uniqueness_unsalted"] = timed(
            "uniqueness direct groupBy", unsalted_unique
        )

    # --- shape 2: per-key quantile digest (Python sketch) -----------------
    from reviews_quality_check_spark.operators.column_stats import (
        _compress,
        quantile_digest,
    )

    if "digest" in shapes:
        timings["digest_routed"] = timed(
            "digest routed (hot->salted sketch, small->JVM exprs)",
            lambda: quantile_digest(df, "v", "key", k=64),
        )

    def unsalted_digest():
        def one(pdf: pd.DataFrame) -> pd.DataFrame:
            vs, ws = _compress(
                pdf["v"].to_numpy(dtype=float),
                pdf["w"].to_numpy(dtype=float),
                64,
            )
            return pd.DataFrame(
                {"group_key": pdf["group_key"].iloc[0], "v": vs, "w": ws}
            )

        base = (
            df.groupBy(F.col("key").alias("group_key"), F.col("v"))
            .agg(F.count(F.lit(1)).cast("double").alias("w"))
        )
        return base.groupBy("group_key").applyInPandas(
            one, schema="group_key string, v double, w double"
        )

    if "digest" in shapes:
        timings["digest_unsalted"] = timed(
            "digest unsalted single-stage", unsalted_digest
        )

    # --- shape 3: per-group cap reservoir (top-cap smallest hashes) -------
    # The domain-balancing sampler: windows get NO map-side partial
    # aggregation and NO AQE skew split, so the naive single-window ranks
    # the hot group's 90% of all rows inside ONE task. The two-phase
    # salted rank (operators/sample.capped_reservoir) caps each
    # (group, salt) cell first.
    from pyspark.sql.window import Window

    from reviews_quality_check_spark.operators.sample import capped_reservoir

    if "reservoir" in shapes:
        cap = 1000
        dfr = df.select(
            "key",
            F.col("v").alias("rid"),
            F.md5(F.concat(F.lit("s:"), F.col("v").cast("string"))).alias("h"),
        ).localCheckpoint()

        def naive_reservoir():
            w = Window.partitionBy("key").orderBy("h", "rid")
            return dfr.withColumn("rk", F.row_number().over(w)).filter(
                F.col("rk") <= cap
            )

        timings["reservoir_two_phase"] = timed(
            "cap reservoir two-phase salted",
            lambda: capped_reservoir(dfr, "key", "h", "rid", cap=cap, salt_cells=32),
        )
        timings["reservoir_single_window"] = timed(
            "cap reservoir single window", naive_reservoir
        )

    # --- shape 3b: cells sweep (VERDICT r4 next-round #2) -----------------
    # Scaling the phase-1 fan-out must bound per-task rows (hot_n/cells)
    # at ~flat cost — the evidence that salt_cells can grow with the
    # group (adaptive mode) instead of staying a constant 16.
    if "cells" in shapes:
        cap = 1000
        dfc = df.select(
            "key",
            F.col("v").alias("rid"),
            F.md5(F.concat(F.lit("s:"), F.col("v").cast("string"))).alias("h"),
        ).localCheckpoint()
        hot_n = int(n_rows * 0.9)
        cells_sweep = {}
        for cells in (16, 64, 256, 1024):
            sec = timed(
                f"cap reservoir cells={cells}",
                lambda cells=cells: capped_reservoir(
                    dfc, "key", "h", "rid", cap=cap, salt_cells=cells
                ),
            )
            cells_sweep[str(cells)] = {
                "sec": sec,
                "max_task_rows": -(-hot_n // cells),
            }
        # adaptive: cells from the pre-count (includes the count job)
        cells_sweep["adaptive"] = {
            "sec": timed(
                "cap reservoir adaptive cells",
                lambda: capped_reservoir(
                    dfc, "key", "h", "rid", cap=cap,
                    target_cell_rows=250_000,
                ),
            ),
            "max_task_rows": 250_000,
        }
        timings["reservoir_cells_sweep"] = cells_sweep

    out = {
        "rows": n_rows,
        "hot_frac": 0.9,
        "cores": n_cores,
        "timings": timings,
    }
    if "uniqueness" in shapes:
        out["uniqueness_speedup_salted"] = round(
            timings["uniqueness_unsalted"] / timings["uniqueness_salted"], 2
        )
    if "digest" in shapes:
        out["digest_speedup_routed"] = round(
            timings["digest_unsalted"] / timings["digest_routed"], 2
        )
    if "reservoir" in shapes:
        out["reservoir_speedup_two_phase"] = round(
            timings["reservoir_single_window"] / timings["reservoir_two_phase"], 2
        )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
