"""Extra benchmarks for optimization work (guide §1.4): per-query
noop-sink isolation with a warm session, best-of-N timing, and optional
.explain("formatted") capture.

NOT the driver's bench — bench.py stays the frozen measurement contract.
Usage:
  python bench_extra.py q1 q2 ...            # time queries at $SPARK_GRAFT_SF_DIR
  python bench_extra.py --explain-dir plans/r06 --suffix before q1 ...
  python bench_extra.py --n 3 q1             # best-of-3
  python bench_extra.py --suite              # time the bench.py flagship suite
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--suite", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_cores = int(cpus) if cpus != "*" else (os.cpu_count() or 8)

    from reviews_quality_check_spark.queries import QUERIES
    from reviews_quality_check_spark.session import get_spark

    spark = get_spark(app_name="rqc-bench-extra", cores=cpus,
                      shuffle_partitions=n_cores * 2)

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warm-up (same as bench.py)
    materialize(QUERIES["doc_column_stats"](spark, sf_dir))

    if args.suite:
        _time_suite(spark, sf_dir, materialize)

    for name in args.queries:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
        times = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min {min(times):.3f}s  all {times}")
    spark.stop()


def _time_suite(spark, sf_dir, materialize) -> None:
    """Mirror bench.py's flagship suite timing (2 warm + 3 timed)."""
    import tempfile

    from pyspark.sql import functions as F

    from reviews_quality_check_spark.functions.quality import gopher_flags
    from reviews_quality_check_spark.functions.readability import (
        flesch_reading_ease_fast,
    )
    from reviews_quality_check_spark.functions.text import norm_text
    from reviews_quality_check_spark.plans import checks as C
    from reviews_quality_check_spark.plans.runner import SuiteRunner
    from reviews_quality_check_spark.sources.pages import VALID_LANGS, synth_pages

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(int(3_000_000 * sf), 10_000)
    pages_path = tempfile.mkdtemp(prefix="rqc_benchx_") + "/pages"
    synth_pages(spark, n_pages).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    pages = pages.withColumn("fp", F.md5(norm_text(F.col("text"))))
    suite = C.Suite(name="pages_suite", row_key="url")
    suite.add(C.not_blank("text"))
    suite.add(C.in_set("lang", VALID_LANGS))
    suite.add(C.expression_floor("flesch_floor", flesch_reading_ease_fast("text"), 5.0))
    gf = gopher_flags(F.col("text"))
    suite.add(
        C.predicate(
            "gopher_core",
            gf["mean_word_len_ok"] & gf["symbol_ratio_ok"]
            & gf["alpha_ratio_ok"] & gf["no_brace"] & gf["no_lorem"],
        )
    )
    suite.add(C.uniqueness("url"))
    suite.add(C.uniqueness("fp"))
    suite.add(C.max_drift("warc_ts", "lang", "1 day", threshold=5.0))

    for _ in range(2):
        warm = SuiteRunner(suite).run(
            pages, F.to_date("warc_ts").cast("string"), resume=False
        )
        materialize(warm.verdicts)
        materialize(warm.violations)
    times = []
    for _ in range(3):
        spark.sparkContext.setJobDescription("bench_extra:pages_suite")
        t0 = time.perf_counter()
        res = SuiteRunner(suite).run(
            pages, F.to_date("warc_ts").cast("string"), resume=False
        )
        materialize(res.verdicts)
        materialize(res.violations)
        times.append(round(time.perf_counter() - t0, 3))
    print(f"pages_suite_validation: min {min(times):.3f}s  all {times}")


if __name__ == "__main__":
    main()
