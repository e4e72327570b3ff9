"""As-of (nearest-prior) join — a temporal operator Spark lacks natively.

For each left row, attach the right row with the LARGEST right_ts <=
left_ts within the same key group (the kdb/pandas `merge_asof` /
DuckDB `ASOF JOIN` semantics, 'backward' direction, inclusive bound).

Plan shape — union + running window, NOT a range join: a theta-join on
(key, r.ts <= l.ts) explodes to O(|L|x|R|) per key before the max-ts
filter, which is death on dense keys. Instead both sides union into one
stream tagged by side, one shuffle partitions by key, and a running
`last(value, ignorenulls=True)` over (ts, side) order carries the most
recent right-side values forward onto each left row. Cost: ONE shuffle
of |L|+|R| narrow rows, per-key sort — linear, skew-safe under AQE,
exactly the plan you'd want at 10^12 rows.

Tie rule: right rows sort BEFORE left rows at equal ts, so an equal
timestamp matches (inclusive bound, same as DuckDB ASOF's `>=`).

The matched right row is carried as ONE packed struct (not per-column
`last(ignorenulls)`), so a NULL inside a matched right row stays NULL in
the output instead of being stitched from an older right row — the
merge_asof/DuckDB semantic (attach the single matched row, nulls
included). Duplicate (key, ts) right rows are resolved deterministically:
the window also orders by the packed struct, so the field-wise-greatest
right row wins regardless of shuffle order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    left_ts: str,
    right_ts: str,
    right_value_cols: tuple[str, ...],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix<col>`` columns from
    the nearest prior (or simultaneous) right row per key; nulls when no
    right row precedes. Right value columns must not collide with left
    column names after prefixing.

    The matched right row travels as a single struct, so per-column nulls
    of the matched row are preserved (never back-filled from older right
    rows). Right value columns must be orderable types (the struct doubles
    as the deterministic tie-break among duplicate (key, ts) right rows:
    the field-wise-greatest row wins)."""
    from pyspark.sql import types as T

    keys = list(key_cols)
    rv_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in right_value_cols]
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys and c != left_ts],
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("__rv"),
    )
    u = l.unionByName(r)
    # __rv ascending as the final key: left rows carry NULL (sorts first),
    # duplicate-(key, ts) right rows resolve to the greatest struct — a
    # deterministic winner independent of shuffle order.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *u.columns,
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__c"),
    )
    out_cols = (
        keys
        + [F.col("__ts").alias(left_ts)]
        + [c for c in left.columns if c not in keys and c != left_ts]
        + [F.col(f"__c.{c}").alias(f"{prefix}{c}") for c in right_value_cols]
    )
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 1800,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-in-interval range join without a cartesian: both sides are
    bucketed on epoch-time buckets of ``bucket_seconds``; each interval
    row explodes over the buckets it covers, points carry their single
    bucket, and the match becomes an equi-join on (keys..., bucket) with
    the exact BETWEEN as a residual filter.

    Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as a
    broadcast-nested-loop — O(|P|x|I|). This shape is
    O(|P| + |I| x avg_covered_buckets) shuffled rows on an equi-key.
    Pick bucket_seconds near the typical interval length: each interval
    then explodes to ~2 buckets. Long-tail intervals fan out more —
    bounded, visible in the plan, AQE-splittable.

    Column names of the two inputs must be disjoint (pre-alias).
    Output: matched (point x interval) rows with all columns.
    """
    w = F.lit(int(bucket_seconds)).cast("long")
    pb = points.withColumn(
        "__pb", F.floor(F.unix_timestamp(F.col(point_ts)) / w).cast("long")
    )
    ib = (
        intervals.withColumn(
            "__bs", F.floor(F.unix_timestamp(F.col(start_ts)) / w).cast("long")
        )
        .withColumn("__be", F.floor(F.unix_timestamp(F.col(end_ts)) / w).cast("long"))
        .withColumn("__pb", F.explode(F.sequence(F.col("__bs"), F.col("__be"))))
        .drop("__bs", "__be")
    )
    on = [*key_cols, "__pb"]
    return (
        pb.join(ib, on=on)
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__pb")
    )
