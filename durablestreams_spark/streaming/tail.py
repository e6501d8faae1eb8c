"""Tail-follow a durable stream with Structured Streaming.

The reference's long-poll consumer registers a waiter that the next
flush pokes with every record after its snapshot offset
(``src/stream_manager.ts:295-326,454-467``).  The Spark-native
equivalent is a file-source streaming read over the segment directory:
the source's own offset tracking (files already seen) subsumes the
poke-offset trick, and ``offset > cursor`` reproduces the exclusive
-start semantics (``src/stream_manager.ts:358``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..stream import Stream


def tail_df(spark, stream: Stream, after_offset: str | None = None):
    """Streaming DataFrame of records strictly after ``after_offset``
    (None ⇒ every record still present as a raw produced/bulk segment
    plus all future data; see ``Stream.read_stream`` for the exact
    delivery/isolation contract around compaction and bulk ingest)."""
    df = stream.read_stream(spark)
    if after_offset:
        df = df.where(F.col("offset") > F.lit(after_offset))
    return df


def tail_query(
    spark,
    stream: Stream,
    checkpoint_dir: str,
    after_offset: str | None = None,
    sink_table: str = "tail_sink",
    trigger_ms: int = 200,
):
    """Start a tail query appending new records to an in-memory table
    (read it with ``spark.sql(f"SELECT * FROM {sink_table}")``).
    Returns the StreamingQuery; ``.stop()`` it when done."""
    return (
        tail_df(spark, stream, after_offset)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )


def seeded_tail(spark, stream: Stream):
    """Close the late-tail visibility gap: full history + live tail,
    each record exactly once, for a consumer arriving AFTER compaction
    rewrote (and tombstone GC possibly deleted) the raw segments its
    records lived in.

    ``Stream.read_stream`` alone can't serve that consumer — it globs
    raw ``*.parquet`` only (compaction rewrites are deliberately
    invisible to it, see its docstring), so history older than the
    tombstone retention is simply absent from the stream.

    The seam: snapshot the manifest's max offset as a cursor, serve
    everything ≤ cursor from the manifest-backed batch reader (which
    DOES see compacted segments), and serve > cursor from the live
    tail.  The cursor filter removes the overlap — raw files still on
    disk contain ≤-cursor records the batch side already delivered.
    A record produced between snapshot and stream start sorts >
    cursor and arrives on the tail side exactly once.

    Returns ``(history_df, tail_stream_df, cursor)``: a batch
    DataFrame, an unstarted streaming DataFrame, and the cursor offset
    (None for an empty stream).  Spark cannot union batch with stream,
    so callers process history first, then run the tail — the standard
    backfill-then-follow shape.
    """
    state = stream.refresh()
    cursor = state.max_offset()
    history = stream.to_df(spark)
    tail = tail_df(spark, stream, after_offset=cursor)
    return history, tail, cursor
