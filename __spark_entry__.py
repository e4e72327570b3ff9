"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship constraint-suite verdict query on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2 (plus the training-pipeline additions); ``oracle_sql()``
returns the matching DuckDB SQL per query — as of round 4, EVERY
registered query has an oracle (zero rows-only rows: NFKD sanitize is
oracled via planted unicode literals, and the seeded LDA model fit is
unregistered/pytest-only while its deterministic halves are oracled).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reviews_quality_check_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-partition constraint
    verdicts over the documents table (north_rule pass/fail shape)."""
    return QUERIES["suite_verdicts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
