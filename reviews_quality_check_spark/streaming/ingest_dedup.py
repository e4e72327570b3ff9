"""Streaming ingest dedup: exactly-once url admission with BOUNDED state.

The batch engine dedups a landed corpus (operators/dedup.py
dedup_keep_first — its exact batch twin); an ingest pipeline needs the
same guarantee ON ARRIVAL, before anything lands. Plain
``dropDuplicates`` on a stream keeps every key ever seen — unbounded
state at crawl scale (10^12 urls). ``dropDuplicatesWithinWatermark``
bounds state to the watermark horizon: a key's state is evicted once
the event-time watermark passes its timestamp + delay, so memory is
O(urls per horizon), not O(urls ever). The trade is the published
streaming-dedup contract: a duplicate arriving AFTER the horizon is
re-admitted (crawl re-fetch after a day is usually a legitimate
re-crawl, so this matches intent).

Reference parity: the reference dedups reviews per file eagerly
(analyzers/duplicates.py builds in-memory seen-sets); this is the
stream-shaped re-expression with bounded memory and checkpoint-restart
exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "warc_ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins dedup over a streaming DataFrame.

    Within ``horizon`` of event time, only the first row per key is
    emitted; state for a key is dropped once the watermark passes
    (bounded by rows-per-horizon). Deterministic under replay: the
    micro-batch log replays the same batch contents, so "first" is
    stable across checkpoint restarts.
    """
    keys = key_cols if key_cols is not None else ["url"]
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(keys)
