"""Column-statistics pass: one vectorized aggregate per partition.

north_star: "one vectorized pass per partition computes column stats
(null rate, distinct-count via HyperLogLog sketches, min/max/quantiles
via t-digest)". Exact variants (countDistinct / percentile_approx with
high accuracy) exist for the DuckDB oracle gate; the scale path uses
approx_count_distinct (HLL) and percentile_approx (which Spark
implements as a mergeable quantile sketch — the t-digest role).

reference analogs: sentiment histogram review_analysis.py:554-556 (A5);
grand totals review_analysis.py:261 (A12); mean quality A3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    group_by: str | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format stats: one row per (group, column) with null_rate,
    distinct count, min/max (as strings for type-uniformity).

    ``exact_distinct=False`` (default, scale path) uses HLL; the oracle
    gate runs with ``True``.
    """
    if columns is None:
        columns = [c for c in df.columns if c != group_by]
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct

    pieces = []
    for c in columns:
        agg_cols = [
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.col(c).isNull().cast("long")).alias("null_count"),
            distinct_fn(F.col(c)).alias("distinct_count"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        ]
        g = df.groupBy(F.col(group_by).alias("group_key")) if group_by else df.groupBy(
            F.lit("_all").alias("group_key")
        )
        pieces.append(
            g.agg(*agg_cols).select(
                "group_key",
                F.lit(c).alias("column_name"),
                "row_count",
                (F.col("null_count").cast("double") / F.col("row_count")).alias("null_rate"),
                "distinct_count",
                "min_value",
                "max_value",
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def numeric_profile(
    df: DataFrame,
    column: str,
    group_by: str | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """Numeric profile with mergeable quantile sketch (percentile_approx —
    Spark's distributed quantile summary, the t-digest role at scale)."""
    g = df.groupBy(F.col(group_by).alias("group_key")) if group_by else df.groupBy(
        F.lit("_all").alias("group_key")
    )
    qs = F.percentile_approx(F.col(column), list(quantiles), accuracy)
    return g.agg(
        F.count(column).alias("n"),
        F.avg(column).alias("mean"),
        F.stddev_samp(column).alias("stddev"),
        F.min(column).alias("min_value"),
        F.max(column).alias("max_value"),
        qs.alias("quantiles"),
    )


def histogram(
    df: DataFrame, column: str, group_by: str | None = None
) -> DataFrame:
    """Categorical histogram with per-group ratio — the sentiment
    distribution shape (reference reduce_dataset.py:62-67)."""
    keys = ([group_by] if group_by else []) + [column]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    if group_by:
        from pyspark.sql.window import Window

        w = Window.partitionBy(group_by)
        return counts.withColumn(
            "ratio", F.col("cnt").cast("double") / F.sum("cnt").over(w)
        )
    # lazy global total: broadcast a 1-row aggregate instead of a driver
    # collect, so the operator stays composable inside one suite plan
    total = counts.agg(F.sum("cnt").cast("double").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).withColumn(
        "ratio", F.col("cnt").cast("double") / F.col("__total")
    ).drop("__total")
