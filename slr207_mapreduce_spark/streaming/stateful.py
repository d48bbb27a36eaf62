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
