"""Micro-batch group-commit ingest: any streaming DataFrame → a
durable stream, exactly once.

The reference buffers producer requests and flushes them as ONE
segment per 200 ms alarm (``src/stream_manager.ts:270-281,384-500``);
a Structured Streaming micro-batch IS that group commit (SURVEY.md
§2.1 #5) — ``trigger(processingTime="200ms")`` reproduces the cadence,
``foreachBatch`` is the flush function, and one manifest commit per
batch is the durability/ack point.

Exactly-once across failures: Structured Streaming replays an
unacknowledged micro-batch after restart, so the flush must be
idempotent.  Each commit records ``(app_id → batch_id)`` in the
manifest (the Delta ``txnAppId``/``txnVersion`` pattern); a replayed
batch with ``batch_id <= committed`` is skipped before writing
anything.  This generalizes the reference's producer fencing token
(``src/stream_manager.ts:240-267``) from "reject stale producers" to
"reject stale micro-batches".
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ..ingest import produce_bulk
from ..stream import Stream

#: Below this row count the flush is a driver-side point produce (one
#: small file, no Spark job) — the same observation as SURVEY.md §2.1
#: #7: launching a distributed write for a 200 ms trickle batch is the
#: wrong physical plan.  Above it, the distributed bulk path takes over.
SMALL_BATCH_ROWS = 10_000


def flush_batch(
    stream: Stream,
    batch_df: DataFrame,
    batch_id: int,
    app_id: str,
    order_by: list[str] | None = None,
) -> bool:
    """Commit one micro-batch; returns False if it was a replay (skip).

    Small batches collect to the driver and go through the point
    ``produce`` (one segment per flush, like the reference's alarm);
    large batches go through the distributed ``produce_bulk``.
    """
    state = stream.refresh()
    if state.txns.get(app_id, -1) >= batch_id:
        return False  # replayed batch — already durable, ack and move on
    # Strategy decision must NOT ship rows to the driver: a count() is
    # O(1) result size regardless of batch width, and the persist
    # ensures the decision scan is reused by whichever flush path runs
    # (rows stay in executors until the point-produce path — which
    # needs them driver-side by design — pulls its <=10k rows).
    batch_df.persist()
    try:
        n = batch_df.count()
        if n == 0:
            # Guarded like the data paths: a concurrent replayer that
            # already advanced the watermark past batch_id must not
            # regress it (the guard aborts; _apply's max-merge is the
            # second line of defense).  Watermark already there ⇒ this
            # was a replay: ack-and-skip, same as the pre-check above.
            from ..manifest import CommitConflict

            try:
                stream._commit(
                    {"txn": {"app": app_id, "batch": batch_id}},
                    guard=lambda st: st.txns.get(app_id, -1) < batch_id,
                )
            except CommitConflict:
                if stream.refresh().txns.get(app_id, -1) >= batch_id:
                    return False  # replay — already durable
                raise
        elif n <= SMALL_BATCH_ROWS:
            # toJSON keeps payload serialization on the Spark side
            # (timestamps, nesting).  The sort runs ONLY here: on the
            # collect path row order determines offsets; the bulk path
            # below re-sorts inside assign_offsets anyway, so a global
            # orderBy before the size decision would be a wasted
            # range-shuffle of every large batch.
            small = batch_df.orderBy(*order_by) if order_by else batch_df
            stream.produce(
                [json.loads(s) for s in small.toJSON().collect()],
                txn=(app_id, batch_id),
            )
        else:
            produce_bulk(
                stream,
                batch_df,
                order_by=order_by or batch_df.columns[:1],
                txn=(app_id, batch_id),
            )
    finally:
        batch_df.unpersist()
    return True


def start_ingest(
    stream: Stream,
    source_df: DataFrame,
    checkpoint_dir: str,
    app_id: str,
    trigger_ms: int = 200,
    order_by: list[str] | None = None,
    available_now: bool = False,
):
    """Start the group-commit ingest query; returns the StreamingQuery.

    ``trigger_ms=200`` matches the reference's flush interval
    (``src/stream_manager.ts:14``).  ``available_now=True`` drains the
    source and stops — the backfill/test mode.
    """
    writer = source_df.writeStream.foreachBatch(
        lambda df, bid: flush_batch(stream, df, bid, app_id, order_by)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_ms} milliseconds")
    return writer.start()
