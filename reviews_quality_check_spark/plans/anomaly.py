"""Metric-history anomaly detection over per-window metric series.

The reference validates each input file in isolation; a 10^12-row
rolling crawl additionally needs the Deequ-style *history* dimension —
"this window's metric is legal in absolute terms but wildly off its own
trailing history" (ingestion drops, crawler loops, schema rot). This
module flags those, with two detectors evaluated in ONE window pass:

- relative change: |v - prev| / prev beyond ``rel_pct`` percent;
- trailing z-test: v outside ``z_k`` sample standard deviations of the
  mean of ALL PRECEDING windows (>= ``min_hist`` of them).

Both detectors are evaluated in cross-multiplied integer form so the
flags are exact and engine-independent — no float division anywhere:

  rel:  100 * |v - prev|          >  rel_pct * prev
  z:    (c*v - s)^2 * (c - 1)     >  z_k^2 * c * (c*ss - s^2)

(the z inequality is |v - mean| > k * sqrt(sample variance) with
mean = s/c and var = (c*ss - s^2) / (c*(c-1)) multiplied through by
c^2 * (c-1) — every term is a product of window sums of integers).
Arithmetic runs in decimal(38,0) (Spark) / HUGEINT (DuckDB oracle), so
daily counts up to ~1e9 (v^2 ~ 1e18, past int64) stay exact.

Scale: the input is a per-window metric frame — the OUTPUT of a
combine-effective aggregation (e.g. daily counts over 10^12 rows
reduce map-side to n_days rows per series). The window functions here
therefore run on bounded frames (series x windows), one exchange on
series_col; the corpus-sized work happened upstream in the metric
aggregation, never here. History is a prefix scan (rowsBetween
unboundedPreceding, -1): one sort per series, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_anomalies(
    metrics: DataFrame,
    series_col: str = "metric",
    order_col: str = "window_id",
    value_col: str = "value",
    rel_pct: int = 25,
    z_k: int = 3,
    min_hist: int = 3,
) -> DataFrame:
    """Flag anomalous windows in (series, window, integer value) rows.

    Returns the input keys plus value/prev_value/hist_n (bigint) and
    rel_anomaly/z_anomaly (boolean, never null: false when there is no
    previous window / not enough history).
    """
    w = Window.partitionBy(series_col).orderBy(order_col)
    hist = w.rowsBetween(Window.unboundedPreceding, -1)
    dec = "decimal(38,0)"
    v = F.col(value_col).cast(dec)
    prev = F.lag(F.col(value_col)).over(w).cast(dec)
    c = F.count(value_col).over(hist).cast(dec)
    s = F.sum(v).over(hist)
    ss = F.sum(v * v).over(hist)

    rel = prev.isNotNull() & (
        F.lit(100) * F.abs(v - prev) > F.lit(int(rel_pct)) * prev
    )
    lhs = c * v - s
    z = (c >= F.lit(int(min_hist))) & (
        lhs * lhs * (c - F.lit(1)) > F.lit(int(z_k * z_k)) * c * (c * ss - s * s)
    )
    return metrics.select(
        F.col(series_col),
        F.col(order_col),
        F.col(value_col).cast("long").alias("value"),
        prev.cast("long").alias("prev_value"),
        c.cast("long").alias("hist_n"),
        F.coalesce(rel, F.lit(False)).alias("rel_anomaly"),
        F.coalesce(z, F.lit(False)).alias("z_anomaly"),
    )
