"""transformWithStateInPandas operator (Spark 4.1 arbitrary state v2).

Spark 4.1's successor to `applyInPandasWithState` (which
streaming/ttl.py uses and tests green): typed state variables
(ValueState/ListState/MapState), timers, and TTL on a per-key
StatefulProcessor. This module implements a bounded per-key top-k
processor against that API.

ENV-GATED: the TWS state protocol runs a protobuf-backed state server
in the Python worker, and this container has no `google.protobuf`
(ImportError probed live: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
→ "cannot import name 'descriptor' from 'google.protobuf'"). Like the
multimodal pixel-decode codec gate (operators/multimodal.py), the
implementation is real and complete; `tws_available()` reports whether
the runtime can execute it, and the unit test runs the equivalence
check when it can, asserts the honest gate when it can't. Custom
stateful streaming itself stays covered by the v1 API in
streaming/ttl.py.

Semantics of the operator: per key, retain the top-k (value DESC,
event_id ASC) rows plus a monotone n_seen counter. Top-k-merge is
order- and slicing-invariant, so the final state equals the batch
window-rank twin regardless of micro-batch boundaries — the same
streaming==batch law the stream_twins queries pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TOPK_OUTPUT_SCHEMA = (
    "user_id BIGINT, rank INT, value DOUBLE, event_id BIGINT, n_seen BIGINT"
)
_STATE_SCHEMA = (
    "vals ARRAY<STRUCT<value DOUBLE, event_id BIGINT>>, n_seen BIGINT"
)


def tws_available() -> bool:
    """True iff the runtime can execute transformWithStateInPandas
    (needs google.protobuf for the worker's state-server protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_processor(k: int):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        """Keep the k largest (value, event_id) per key; emit the
        current top-k with the running n_seen each time the key sees
        rows (Update mode — the consumer keeps each key's rows at
        max n_seen, i.e. the final state)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.topk = handle.getValueState("topk", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            cur: list[tuple[float, int]] = []
            n_seen = 0
            if self.topk.exists():
                vals, n = self.topk.get()
                cur = [(float(v), int(e)) for v, e in vals]
                n_seen = int(n)
            for pdf in rows:
                for v, e in zip(pdf["value"], pdf["event_id"]):
                    cur.append((float(v), int(e)))
                    n_seen += 1
            cur.sort(key=lambda t: (-t[0], t[1]))
            cur = cur[:k]
            self.topk.update((cur, n_seen))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(cur),
                    "rank": list(range(1, len(cur) + 1)),
                    "value": [v for v, _ in cur],
                    "event_id": [e for _, e in cur],
                    "n_seen": [n_seen] * len(cur),
                }
            )

        def close(self) -> None:
            pass

    return TopKProcessor()


def topk_per_user(stream: DataFrame, k: int = 3) -> DataFrame:
    """Attach the top-k stateful processor to a stream of
    (user_id, event_id, value). Raises NotImplementedError with the
    exact env constraint when the runtime can't execute TWS."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf for its "
            "state-server protocol; not present in this environment. "
            "Use streaming/ttl.py (applyInPandasWithState) meanwhile."
        )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
