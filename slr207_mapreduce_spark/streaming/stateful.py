"""Custom stateful streaming operator via applyInPandasWithState — the
generalization of the reference's eager per-key accumulator reduce
(/root/reference/ListenerReducer.java:123-139: counts update as records
arrive, state lives across the whole stream).

``running_user_totals`` keeps (count, sum) per user across micro-batches —
the arbitrary-stateful-op surface (GroupState + Arrow-batched pandas).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum) maintained in GroupState across
    micro-batches; emits the updated totals for every user seen in a batch.
    Works on a streaming DataFrame; state is partitioned by user (shuffle on
    the group key once, then local updates — the scalable stateful shape).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- Event-time timeout: closed-session finalization ----------------------

SESSION_GAP_MS = 30 * 60 * 1000

CLOSED_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def _finalize_sessions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # No input for this key and the watermark passed its timeout: the
        # session is CLOSED — emit the summary exactly once and drop state.
        start_ms, last_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start_ms": [start_ms],
                "session_end_ms": [last_ms],
                "n_events": [n],
            }
        )
        return
    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms, last_ms, n = None, None, 0
    for pdf in pdfs:
        ts_ms = pdf["ts"].astype("int64") // 1_000_000
        lo, hi = int(ts_ms.min()), int(ts_ms.max())
        start_ms = lo if start_ms is None else min(start_ms, lo)
        last_ms = hi if last_ms is None else max(last_ms, hi)
        n += len(pdf)
    state.update((start_ms, last_ms, n))
    # Close when event time passes last activity + gap. The engine requires
    # a timeout strictly beyond the current watermark; a session already
    # older than the watermark closes at the next watermark tick.
    state.setTimeoutTimestamp(
        max(last_ms + SESSION_GAP_MS, state.getCurrentWatermarkMs() + 1)
    )
    yield pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "session_start_ms": pd.Series([], dtype="int64"),
            "session_end_ms": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )


def closed_user_sessions(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-user session finalization with EVENT-TIME TIMEOUT — the stateful
    pattern session_window cannot express: nothing is emitted while a
    session is live; when the watermark passes (last event + 30 min gap)
    the operator's timeout fires with no input rows, emits the closed
    session summary exactly once, and clears the key's state. State per
    key is three longs — bounded by active users, pruned on close."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _finalize_sessions,
            outputStructType=CLOSED_SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- transformWithState (Spark 4 arbitrary-state API) ---------------------
#
# The successor surface to applyInPandasWithState: typed state primitives
# (ValueState / ListState / MapState) + event/processing-time timers on a
# StatefulProcessor object. Same scale shape — state partitioned by the
# group key, shuffled once, updated locally with Arrow batches.
#
# Runtime note: the operator's state server speaks protobuf; running it
# needs google.protobuf on the Python workers (absent in this container,
# so the end-to-end test is skipif-gated — the applyInPandasWithState
# operator above is the fully-exercised stateful path here).

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
    ]
)


try:  # Spark ≥4.0 only; keep the module importable everywhere
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]


class EventTypeCounts(StatefulProcessor):
    """Per-user MapState[event_type → count], emitted (full map) on every
    batch the user appears in — the reference's eager per-key HashMap
    accumulator (ListenerReducer.java:123-139) with a two-level key,
    rebuilt on the typed-state API."""

    def init(self, handle) -> None:
        self.counts = handle.getMapState(
            "counts",
            StructType([StructField("event_type", StringType())]),
            StructType([StructField("n", LongType())]),
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        for pdf in rows:
            for et, cnt in pdf["event_type"].value_counts().items():
                k = (et,)
                prev = self.counts.getValue(k)[0] if self.counts.containsKey(k) else 0
                self.counts.updateValue(k, (prev + int(cnt),))
        items = sorted((k[0], v[0]) for k, v in self.counts.iterator())
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(items),
                "event_type": [k for k, _ in items],
                "n_events": [v for _, v in items],
            }
        )

    def close(self) -> None:
        pass


def user_event_type_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Running per-(user, event_type) counts via transformWithStateInPandas
    with MapState. Update-mode output; state lives per user partition."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=EventTypeCounts(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
