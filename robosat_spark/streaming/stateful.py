"""Custom stateful streaming operator: running per-tile page counters.

The engine extension for the task brief's "applyInPandasWithState for
custom stateful operators": a streaming groupBy(tile) that keeps a running
(count, first_seen, last_seen) state per tile across micro-batches and
emits the updated row whenever a batch touches the tile. With ``ttl_ms``
set, state is bounded by a processing-time timeout so idle tiles age out
— at 10^12 pages the touched-tile universe is ~10^8 z18 keys, and an
unbounded state store is the classic streaming OOM (the streaming analog
of the reference's incremental rerun bookkeeping,
/root/reference/robosat/tools/download.py:48-49).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG, first_ts TIMESTAMP, last_ts TIMESTAMP"
OUTPUT_SCHEMA = "tile_id LONG, count LONG, first_ts TIMESTAMP, last_ts TIMESTAMP"


def _make_update_fn(ttl_ms: int | None):
    def _update_tile_state(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle key aged out: drop the counters; a later page for this
            # tile simply starts a fresh epoch (same contract as the
            # reference's re-download of evicted tiles)
            state.remove()
            return
        total = 0
        first = None
        last = None
        for pdf in pdfs:
            total += len(pdf)
            ts_min = pdf["warc_ts"].min()
            ts_max = pdf["warc_ts"].max()
            first = ts_min if first is None else min(first, ts_min)
            last = ts_max if last is None else max(last, ts_max)
        if state.exists:
            c0, f0, l0 = state.get
            total += c0
            first = f0 if first is None else min(first, f0)
            last = l0 if last is None else max(last, l0)
        state.update((total, first, last))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"tile_id": [key[0]], "count": [total], "first_ts": [first],
             "last_ts": [last]}
        )

    return _update_tile_state


def streaming_tile_state(points: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """points(tile_id, warc_ts, ...) stream -> running per-tile counters.

    Output mode must be ``update``; each micro-batch emits one row per
    touched tile with the accumulated totals. ``ttl_ms`` bounds the state
    store: a tile untouched for that long (processing time) is evicted
    and restarts from zero on its next page. Use the TTL only with a
    CONTINUOUS trigger (processingTime) — under ``availableNow`` the
    drained query waits on processing-time timers that never fire and
    hangs (measured), which is also why the parity test runs the
    unbounded variant."""
    return points.groupBy("tile_id").applyInPandasWithState(
        _make_update_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
