"""Streaming TTL state + dedup (SURVEY.md §2-H stream-ttl).

The reference's cache rows die after 24 h and a sweeper deletes the
expired (cache_manager.py:141-142,179-196). In a stream that becomes:

- `dedup_within_watermark`: drop duplicate keys while their event time
  is within the watermark — bounded-state streaming dedup
  (`dropDuplicatesWithinWatermark`), the streaming twin of the
  keep-latest upsert.
- `ttl_latest_state`: explicit keyed state with a processing-time TTL
  via `applyInPandasWithState` — keeps the latest value per key, emits
  expirations when the timeout fires (the cache-expiry sweep as a
  streaming operator).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "latest_value double, n_seen long, latest_ts_us long"
OUTPUT_SCHEMA = "user_id long, latest_value double, n_seen long, expired boolean"


def dedup_within_watermark(
    events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state for old keys is reclaimed
    automatically once the watermark passes."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def _ttl_fn(ttl_ms: int):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            latest, n_seen, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "latest_value": [latest], "n_seen": [n_seen], "expired": [True]}
            )
            return
        latest, n_seen, latest_ts_us = state.get if state.exists else (0.0, 0, -1)
        for pdf in pdfs:
            if len(pdf):
                # Arrival order is not event-time order — "latest" means
                # max event ts, tracked across batches in the state row.
                idx = pdf["ts"].idxmax()
                ts_us = int(pdf["ts"].loc[idx].value // 1_000)
                if ts_us >= latest_ts_us:
                    latest_ts_us = ts_us
                    latest = float(pdf["value"].loc[idx])
                n_seen += len(pdf)
        state.update((latest, n_seen, latest_ts_us))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "latest_value": [latest], "n_seen": [n_seen], "expired": [False]}
        )

    return fn


def ttl_latest_state(events: DataFrame, ttl_ms: int = 24 * 3600 * 1000) -> DataFrame:
    """Keep latest value per user with TTL expiry (update mode).

    State per key is two scalars — at any corpus size the state store
    holds |active keys| rows, and the TTL bound reclaims idle keys the
    way the reference's cleanup sweep does.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _ttl_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
