"""spark-submit entrypoint for the constraint-validation engine.

north_rule: the engine runs "via spark-submit --py-files on clusters of
N and 4N executors". This is that job script. Package the library and
submit:

    cd /root/repo && zip -qr /tmp/rqc.zip reviews_quality_check_spark
    spark-submit --master local[8] \
        --py-files /tmp/rqc.zip \
        tools/submit_validate.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/rqc_out \
        --partition-col lang

On a real cluster, swap --master for the cluster manager and size
--conf spark.sql.shuffle.partitions to ~2-3x total executor cores; the
job itself is unchanged (the engine never assumes local mode). Resume
after a kill with the SAME --output: committed partitions are skipped
via the lineage log (--resume).

Exit code 0 = all partitions passed every check; 2 = violations found
(verdicts/violations parquet written either way); 1 = error.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    p = argparse.ArgumentParser(description="Run a constraint suite over a table")
    p.add_argument("--input", required=True, help="input parquet path")
    p.add_argument("--output", required=True, help="output dir (verdicts/violations/lineage)")
    p.add_argument("--partition-col", default="lang", help="logical partition column")
    p.add_argument("--row-key", default="doc_id", help="unique row key column")
    p.add_argument("--text-col", default="text", help="text column for quality checks")
    p.add_argument("--resume", action="store_true", help="skip partitions already committed")
    p.add_argument("--violation-cap", type=int, default=1000)
    p.add_argument("--run-seq", type=int, default=None,
                   help="explicit run sequence for the metrics history "
                        "(pass the crashed run's seq on resume; default "
                        "auto-increments)")
    p.add_argument("--history-anomalies", action="store_true",
                   help="after the run, write run-over-run anomaly flags "
                        "(rel-change + trailing-z over the metrics history) "
                        "to <output>/anomalies")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("rqc-validate").getOrCreate()

    from reviews_quality_check_spark.functions.readability import flesch_reading_ease_fast
    from reviews_quality_check_spark.plans import checks as C
    from reviews_quality_check_spark.plans.runner import SuiteRunner

    df = spark.read.parquet(args.input)
    suite = C.Suite(name="submitted_suite", row_key=args.row_key)
    suite.add(C.not_blank(args.text_col))
    suite.add(C.uniqueness(args.row_key))
    suite.add(C.expression_floor("flesch_floor", flesch_reading_ease_fast(args.text_col), 0.0))

    runner = SuiteRunner(
        suite, out_dir=args.output, violation_cap_per_check=args.violation_cap
    )
    res = runner.run(
        df, F.col(args.partition_col).cast("string"), resume=args.resume,
        run_seq=args.run_seq,
    )
    failed = res.verdicts.filter(~F.col("passed")).count()
    total = res.verdicts.count()
    print(f"[rqc] verdicts={total} failed_checks={failed} output={args.output}")
    if args.history_anomalies:
        # run-over-run regression flags from the committed metrics
        # history (O(runs x partitions x checks) rows, never the corpus)
        anom = runner.history_anomalies(spark)
        anom.write.mode("overwrite").parquet(args.output + "/anomalies")
        n_anom = anom.filter(F.col("rel_anomaly") | F.col("z_anomaly")).count()
        print(f"[rqc] history_points={anom.count()} anomalies={n_anom}")
    spark.stop()
    return 0 if failed == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
