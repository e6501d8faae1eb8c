"""Stream-stream joins with watermarks (SURVEY.md §2.2 "joins: as-of
(stream-stream by time)").

The reference has no joins at all; this is the streaming half of the
as-of/interval family (the batch half lives in
``analytics.relational.join_asof_purchase_prior_click``).  Watermarks
on BOTH sides + an event-time range condition let Spark bound the join
state: each side keeps only rows newer than the other side's watermark
minus the range — without the range condition the state grows forever,
which is the canonical stream-join OOM at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same ``on`` key whose
    timestamp falls in ``[left_ts - max_lag, left_ts]`` — "the right
    event at most max_lag BEFORE the left one", the streaming as-of
    candidate set.  (True as-of = latest such row; in pure streaming
    that needs a downstream per-key max, done batch-side after the
    join emits.)

    ``how='left_outer'`` additionally emits left rows with NO in-range
    right match, with nulls on the right side — but only once the
    watermark passes the row's join window (the engine must be sure no
    matching right row can still arrive).  Consequence at end-of-input:
    left rows inside the final watermark lag are withheld forever
    unless something advances the watermark past them — see the
    sentinel pattern in
    ``operators.streaming_queries.streaming_interval_join_left_outer``."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {max_lag}")
        )
    )
    return lw.join(rw, cond, how)
