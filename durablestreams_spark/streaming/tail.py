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
