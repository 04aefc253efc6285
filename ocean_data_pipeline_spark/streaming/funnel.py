"""Stateful streaming funnel (SURVEY.md §2-H/I: custom keyed state):
a per-user view → click → purchase stage machine maintained across
micro-batches with `applyInPandasWithState` — the streaming twin of
`queries/event_analytics.event_funnel_conversion`.

Semantics: within the events visible so far, t_view is the first view,
t_click the first click STRICTLY AFTER t_view, t_purchase the first
purchase STRICTLY AFTER t_click — identical to the batch funnel when
events arrive in event-time order (each micro-batch is sorted by ts
before folding into the state machine). Late data that would lower
t_view after a click was already accepted is NOT retroactively
re-evaluated — the standard streaming-funnel tradeoff; a deployment
needing exactness under disorder bounds it with the watermark and
re-derives affected users in a batch backfill.

Scale posture: state is three int64 timestamps per user — |active
users| rows in the state store, nothing proportional to event volume;
emission is one row per (user, batch), Arrow-batched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STATE_SCHEMA = "t_view long, t_click long, t_purchase long"
FUNNEL_OUTPUT_SCHEMA = "user_id long, stage integer"

_UNSET = -1


def _funnel_fn(key, pdfs, state: GroupState):
    (user_id,) = key
    tv, tc, tp = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    frames = [pdf[["ts", "event_type"]] for pdf in pdfs if len(pdf)]
    if frames:
        batch = pd.concat(frames).sort_values("ts", kind="mergesort")
        for ts, et in zip(batch["ts"], batch["event_type"]):
            ts_us = int(ts.value // 1_000)
            if et == "view" and tv == _UNSET:
                tv = ts_us
            elif et == "click" and tv != _UNSET and tc == _UNSET and ts_us > tv:
                tc = ts_us
            elif et == "purchase" and tc != _UNSET and tp == _UNSET and ts_us > tc:
                tp = ts_us
    state.update((tv, tc, tp))
    stage = 3 if tp != _UNSET else 2 if tc != _UNSET else 1 if tv != _UNSET else 0
    yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})


def funnel_stages(events: DataFrame) -> DataFrame:
    """Per-user funnel stage (0 none, 1 viewed, 2 clicked-after,
    3 purchased-after) as keyed streaming state, emitted in update
    mode. Stage is monotone non-decreasing across batches, so the
    final stage per user is max(stage) over the emission log."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
