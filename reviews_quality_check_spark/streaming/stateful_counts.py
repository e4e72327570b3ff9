"""Custom stateful streaming operator via applyInPandasWithState.

The task brief names applyInPandasWithState as the tool for custom
stateful operators the built-in windowed aggregations can't express.
This module implements a per-key RUNNING QUALITY MONITOR: for each
category (e.g. lang), maintain cumulative (rows_seen, violations_seen)
across micro-batches and emit the updated running violation rate each
time the key receives data — something append-mode window aggs cannot
do (they emit once per closed window, not a continuously-updated
per-key state).

State is a simple (long, long) tuple per key: bounded, mergeable,
restart-safe via the checkpoint location.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, rows_seen long, violations_seen long, violation_rate double"
)
STATE_SCHEMA = "rows long, violations long"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows, violations = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        rows += len(pdf)
        violations += int(pdf["is_violation"].sum())
    state.update((rows, violations))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "rows_seen": [rows],
            "violations_seen": [violations],
            "violation_rate": [violations / rows if rows else 0.0],
        }
    )


def running_violation_rate(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """stream must have columns (key string, is_violation boolean/int).

    Returns the update-mode stream of per-key running totals."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_monitor(
    stream: DataFrame,
    checkpoint_dir: str,
    out_path: str,
    key_col: str = "key",
):
    """Wire the stateful monitor to a parquet sink (update rows appended
    per micro-batch via foreachBatch — parquet has no native update mode)."""
    updates = running_violation_rate(stream, key_col)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_path)

    return (
        updates.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
