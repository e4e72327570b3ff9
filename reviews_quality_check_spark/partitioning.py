"""Scale-adaptive parallelism helpers.

The engine's inputs range from single-file sandbox tables (one parquet
row group => Spark plans the whole scan as ONE task, so every per-row
expression before the first exchange runs single-threaded) to
multi-thousand-split production tables. ``spread`` widens only the
former: it derives the decision from the frame's own planned partition
count vs the cluster's scheduling width, so it is a no-op at scale and
never a constant tuned to local[32] (guide §2: partitioning must be
scale-adaptive, not a local-mode constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def target_parallelism(df: DataFrame) -> int:
    """The cluster's scheduling width (local[n] -> n)."""
    return df.sparkSession.sparkContext.defaultParallelism


def spread(df: DataFrame, factor: int = 1, key: str | None = None) -> DataFrame:
    """Repartition a frame whose planned scan is narrower than the
    cluster, so downstream map-side expression work uses every core.
    No-op when the scan already has >= defaultParallelism * factor
    partitions (any real-scale input). Row ORDER changes — callers must
    be order-insensitive (every oracled query sorts its output).

    Pass ``key`` (a unique-ish column, e.g. the row id) to hash-
    partition instead of round-robin: a keyless repartition local-sorts
    its input rows first (spark.sql.execution.sortBeforeRepartition,
    on by default since SPARK-23207 for retry determinism), which r6
    measured as most of the exchange cost on payload-bearing rows —
    hash partitioning needs no sort and is deterministic under retries
    by construction.
    """
    from pyspark.sql import functions as F

    target = target_parallelism(df) * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
