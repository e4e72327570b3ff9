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
    distribution shape (reference reduce_dataset.py:62-67).

    Ungrouped path caveat: the global total crossJoins a 1-row aggregate
    derived from the same ``counts`` subtree, so without a barrier Spark
    evaluates that groupBy (and its scan) twice. Acceptable for
    composability inside suite plans (the scan is column-pruned and the
    agg is map-side combined); when driving this operator standalone
    over a large input, ``counts.persist()``/``localCheckpoint()`` first
    or use the grouped path (window over partitionBy) which is
    single-pass."""
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


# ---------------------------------------------------------------------------
# Custom mergeable quantile sketch as an applyInPandas two-stage aggregate
# (SURVEY §7.3's "t-digest partial/merge" item). percentile_approx above
# is the production path; this demonstrates the ARROW-BATCHED PARTIAL ->
# MERGE pattern for sketches Spark lacks natively, with a deterministic
# fixed-size digest (uniform-rank centroid compression, t-digest family).
# ---------------------------------------------------------------------------


def _compress(values, weights, k: int):
    """Compress weighted points to <= k centroids by equal-weight rank
    strata — deterministic (sorted input, fixed strata), mergeable."""
    import numpy as np

    # lexsort on (weight, value): fully deterministic regardless of the
    # arrival order of equal-valued centroids from different partials
    order = np.lexsort((np.asarray(weights), np.asarray(values)))
    v, w = np.asarray(values)[order], np.asarray(weights)[order]
    if len(v) <= k:
        return v, w
    cum = np.cumsum(w)
    total = cum[-1]
    edges = np.linspace(0, total, k + 1)
    idx = np.searchsorted(cum, edges[1:-1], side="left")
    bounds = np.concatenate(([0], idx + 1, [len(v)]))
    cv, cw = [], []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if a >= b:
            continue
        ws = w[a:b].sum()
        cv.append(float((v[a:b] * w[a:b]).sum() / ws))
        cw.append(float(ws))
    return np.asarray(cv), np.asarray(cw)


def quantile_digest(
    df: DataFrame,
    column: str,
    group_by: str | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    k: int = 128,
) -> DataFrame:
    """Two-stage mergeable quantile sketch:

    Stage 0 (duplicate collapse): a map-side-combining
    ``groupBy(group, salt, value).count()`` turns duplicate values into
    single weighted points BEFORE any pandas state exists — so a
    near-constant column (all duplicates of one dominant value share a
    salt) degenerates to one (value, weight) row, not one full-size
    partial (ADVICE r2: value-skew hole in the rows/256 bound).
    Stage 1 (partial): applyInPandas over (group, salt) compresses each
    slice's weighted points into <= k weighted centroids —
    Arrow-batched, state bounded by distinct-values/256, parallel.
    Stage 2 (merge): applyInPandas per group concatenates partial
    centroids, re-compresses, and reads quantiles off the weighted CDF.

    Group routing (r4): only groups with MORE than k distinct values
    take the Python stages — for n <= k, _compress is the identity, so
    those groups read quantiles off the weighted CDF with pure JVM
    window/aggregate expressions instead (np.interp arithmetic
    op-for-op; bit-equality pytest-pinned). This removes the
    per-tiny-group applyInPandas dispatch that measured 4x slower than
    a naive single-stage on a 100k-small-groups + one-hot-key fixture,
    while hot keys keep the salted parallel sketch (tools/bench_skew.py
    numbers in BENCH.md).

    Deterministic across partitionings/cluster sizes: every stage is a
    pure function of the value multiset (salt = hash(value), weights from
    an exact count) — pinned by tests/test_drift_stats.py.

    Error is bounded by the rank width total/k per stratum (the t-digest
    guarantee family, uniform rather than tail-biased scaling).
    Output: (group_key, n, quantiles array<double>).
    """
    import pandas as pd

    gcol = F.col(group_by) if group_by else F.lit("_all")
    # salt spreads distinct values; duplicates of one value are collapsed
    # to a weighted point by the pre-aggregate below, so sharing a salt
    # costs one row, not one row per duplicate
    base = df.select(
        gcol.cast("string").alias("group_key"),
        F.col(column).cast("double").alias("v"),
        F.pmod(F.xxhash64(F.col(column)), F.lit(256)).alias("salt"),
    ).filter(F.col("v").isNotNull())
    weighted = base.groupBy("group_key", "salt", "v").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )

    # split groups by distinct-value count: <= k -> pure-expression CDF
    # read-off (no Python); > k (hot keys) -> salted partial/merge sketch
    gsize = weighted.groupBy("group_key").agg(F.count(F.lit(1)).alias("__nc"))
    small_keys = gsize.filter(F.col("__nc") <= k).select("group_key")
    big_keys = gsize.filter(F.col("__nc") > k).select("group_key")
    weighted_big = weighted.join(big_keys, "group_key", "left_semi")

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        cv, cw = _compress(pdf["v"].to_numpy(), pdf["w"].to_numpy(), k)
        return pd.DataFrame(
            {"group_key": pdf["group_key"].iloc[0], "cv": [cv.tolist()], "cw": [cw.tolist()]}
        )

    partials = weighted_big.groupBy("group_key", "salt").applyInPandas(
        partial, "group_key string, cv array<double>, cw array<double>"
    )

    qlist = list(quantiles)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = np.concatenate([np.asarray(x) for x in pdf["cv"]])
        w = np.concatenate([np.asarray(x) for x in pdf["cw"]])
        cv, cw = _compress(v, w, k)
        total = cw.sum()
        cum = np.cumsum(cw) - cw / 2.0  # centroid mid-ranks
        qs = [float(np.interp(q * total, cum, cv)) for q in qlist]
        return pd.DataFrame(
            {"group_key": pdf["group_key"].iloc[0], "n": [float(total)], "quantiles": [qs]}
        )

    merged_big = partials.groupBy("group_key").applyInPandas(
        merge, "group_key string, n double, quantiles array<double>"
    )

    # ------------------------------------------------------------------
    # Small-group fast path (skew/overhead fix, measured r4): groups
    # whose distinct-value count is <= k need NO compression (_compress
    # is identity at n <= k), so routing them through applyInPandas
    # costs one Python dispatch per group for nothing — on a 2M-row
    # fixture with 100k small keys + one 90% hot key, the all-Python
    # two-stage path measured 33.0s vs 8.1s for a naive unsalted
    # single-stage (tools/bench_skew.py). Small groups instead read
    # their quantiles off the weighted CDF with pure JVM expressions —
    # the exact np.interp arithmetic, op-for-op (the formula the
    # nchars_digest DuckDB oracle already mirrors bit-exactly):
    #   slope = (vh - vl) / (ch - cl); q = slope * (tgt - cl) + vl.
    # Bit-equality with the Python path is pytest-pinned
    # (tests/test_drift_stats.py); cum/total stay exact because weights
    # are integer counts (x.0/x.5 grid points).
    # Big groups (the hot keys) keep the salted partial/merge sketch —
    # that is where parallelizing one key's work actually pays.
    # ------------------------------------------------------------------
    from pyspark.sql.window import Window

    ws = (
        Window.partitionBy("group_key")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group_key")
    small_rows = weighted.join(small_keys, "group_key", "left_semi").select(
        "group_key",
        "v",
        (F.sum("w").over(ws) - F.col("w") / 2.0).alias("cum"),
        F.sum("w").over(wg).alias("total"),
    )
    aggs = [F.first("total").alias("n")]
    for i, q in enumerate(qlist):
        tgt = F.lit(q) * F.col("total")
        point = F.struct(F.col("cum").alias("c"), F.col("v").alias("x"))
        aggs.append(F.max(F.when(F.col("cum") <= tgt, point)).alias(f"lo{i}"))
        aggs.append(F.min(F.when(F.col("cum") >= tgt, point)).alias(f"hi{i}"))
    small_agg = small_rows.groupBy("group_key").agg(*aggs)
    vals = []
    for i, q in enumerate(qlist):
        cl, vl = F.col(f"lo{i}.c"), F.col(f"lo{i}.x")
        ch, vh = F.col(f"hi{i}.c"), F.col(f"hi{i}.x")
        tgt = F.lit(q) * F.col("n")
        vals.append(
            F.when(cl.isNull(), vh)
            .when(ch.isNull(), vl)
            .when(cl == ch, vl)
            .otherwise((vh - vl) / (ch - cl) * (tgt - cl) + vl)
        )
    merged_small = small_agg.select(
        "group_key", "n", F.array(*vals).alias("quantiles")
    )
    return merged_big.unionByName(merged_small)
