"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.2 "streaming: stateful ops").

The reference's only stateful constructs are the producer-version
fencing token and the consumer registry (``src/stream_manager.ts:
240-263,88``); both are engine-internal.  This module supplies the
user-facing class of stateful operator an analytics engine needs —
arbitrary per-key running state across micro-batches — using the
Pandas-state API so state lives in Spark's state store (checkpointed,
partitioned by key, survives restarts; scale = O(distinct keys), not
O(events)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("mx", T.LongType()),  # µs since epoch
    ]
)


def _update_user_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events into (count, sum, max_ts) state and emit
    the updated running totals for the key."""
    n, s, mx = state.get() if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            batch_mx = int(pdf["ts"].max().value // 1_000)  # ns → µs
            mx = max(mx, batch_mx)
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_ts": [pd.Timestamp(mx, unit="us")],
        }
    )


def running_user_stats(events_df):
    """Per-user running (count, sum, last-seen) over a stream of events
    with columns (user_id, ts, value).  Emits one updated row per user
    per micro-batch; the latest row per user equals the batch aggregate
    over everything ingested so far — which is how the tests oracle it.
    """
    return events_df.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
