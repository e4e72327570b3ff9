"""Deterministic sampling / renumbering operators.

reference: reduce_dataset.py:25-56 — stratified downsample preserving
the sentiment distribution, then shuffle + sequential renumbering
(A13/W2). random.shuffle / random.sample are replaced by hash-based
selection so the engine result is reproducible across cluster sizes and
matches the DuckDB oracle exactly (no RNG in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deterministic_sample(
    df: DataFrame, fraction_pct: int, key_col: str, seed: str = "42"
) -> DataFrame:
    """Keep rows whose md5(seed:key) mod 100 < fraction_pct — a
    deterministic Bernoulli sample, identical in Spark and SQL oracles.
    """
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))), 1, 8), 16, 10).cast("long") % 100
    return df.filter(bucket < fraction_pct)


def stratified_sample(
    df: DataFrame, strata_col: str, fraction_pct: int, key_col: str, seed: str = "42"
) -> DataFrame:
    """Per-stratum deterministic sample (same fraction per stratum keeps
    the distribution, reference reduce_dataset.py:25-47)."""
    # hash key includes the stratum so strata are sampled independently
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + ":"),
                    F.col(strata_col).cast("string"),
                    F.lit(":"),
                    F.col(key_col).cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long") % 100
    return df.filter(bucket < fraction_pct)


def renumber(df: DataFrame, order_col: str, id_name: str = "new_id") -> DataFrame:
    """Sequential 1-based renumbering (reference reduce_dataset.py:55-56).

    NB: row_number over a global ordering is a single-reducer operation —
    correct but not for 10^12 rows. At scale prefer
    ``monotonically_increasing_id`` or zipWithIndex-style per-partition
    offsets; this operator exists for reference parity on bounded data.
    """
    w = Window.orderBy(F.col(order_col))
    return df.withColumn(id_name, F.row_number().over(w))
