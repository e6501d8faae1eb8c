"""Partitioned-stream operators inside the graded query gate.

The reference's scale-out story is explicit: one stream is "a single
Kafka partition with its own timestamp oracle", and you scale
horizontally by adding streams (``README.md:128-130,161``).
``partitioned.PartitionedStream`` makes that first-class (N independent
logs, hash-routed by key, per-partition manifests/clocks/fencing).
This module puts it under the duckdb-oracle gate: hash-route the
events table by user_id, bulk-ingest every partition, read the union
back, and have pure SQL re-derive both the routing and each
partition's offset sequence.

Routing parity: ``partitioned._route`` is
``int.from_bytes(md5(key)[:8], 'big') % n``.  Both engines reproduce
it exactly — Spark via ``conv(substr(md5(k),1,16),16,10)`` (unsigned
64-bit capable, returns a decimal string) and DuckDB via
``CAST('0x'||substr(md5(k),1,16) AS UBIGINT)``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from ..analytics.core import query, table
from .cache_marker import marker_current, write_marker
from ..ingest import produce_bulk
from ..maintenance import compact
from ..partitioned import PartitionedStream
from ..stream import StreamCatalog

N_PARTS = 4
BATCH = 1000

_ROUTE_SQL = (
    "CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) "
    f"AS UBIGINT) % {N_PARTS} AS BIGINT)"
)


def _route_col():
    """Spark twin of ``partitioned._route`` (md5-prefix mod N) as a
    column expression, so routing happens executor-side in one pass —
    never a per-record driver call."""
    hex16 = F.substring(F.md5(F.col("user_id").cast("string")), 1, 16)
    return (
        F.conv(hex16, 16, 10).cast("decimal(20,0)") % N_PARTS
    ).cast("long")


def _ingest_events_partitioned(spark, sf_dir: str) -> PartitionedStream:
    """Deterministically (re)build a 4-partition stream from events.

    Each partition is an independent log: its slice of events (hash of
    user_id) bulk-ingested in (ts, event_id) order with a fresh logical
    clock, then one compaction pass so the read spans compacted + raw
    segments.  Offsets are therefore a pure per-partition function of
    the slice's sort order — exactly what the SQL oracle recomputes.
    """
    root = os.path.join(
        "/tmp/durablestreams_partops_v3", os.path.basename(os.path.normpath(sf_dir))
    )
    marker = os.path.join(root, "_ingested")
    cat = StreamCatalog(root)
    pstream = PartitionedStream(cat, "events_plog", N_PARTS)
    if marker_current(marker, sf_dir):
        return pstream
    shutil.rmtree(root, ignore_errors=True)
    cat = StreamCatalog(root)
    pstream = PartitionedStream(cat, "events_plog", N_PARTS)
    # Route once, persist, then each partition's bulk job filters the
    # cached routed set instead of rescanning the source N_PARTS times.
    # (At hundreds of partitions you would instead run ONE write job
    # and commit each partition's manifest from its file stats; the
    # per-partition produce_bulk keeps this fixture builder simple.)
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", _route_col().alias("__part"))
        .persist()
    )
    try:
        for i in range(N_PARTS):
            produce_bulk(
                pstream.partition(i),
                ev.where(F.col("__part") == i).drop("__part"),
                order_by=["ts", "event_id"],
                batch_records=BATCH,
                payload_cols=["event_id"],
                # 2500-row segments (same as the logops fixture): the
                # union read-back is a handful of scan tasks per
                # partition instead of the 50 tiny files/partition the
                # old 500-row sizing produced (which made the graded
                # query time measure file-open overhead, not the scan).
                # At sf0.1 each partition gets ~10 segments and the
                # compaction pass merges the first window, so the read
                # spans compacted + raw; at sf0.01 a slice fits one
                # segment and compaction is a no-op.
                segment_rows=2500,
            )
            compact(pstream.partition(i))  # no-op when < 2 segments
    finally:
        ev.unpersist()
    write_marker(marker, sf_dir)
    return pstream


@query(
    "partitioned_roundtrip_offsets",
    f"""
    SELECT event_id, part,
           lpad(CAST(((rn - 1) // {BATCH}) + 1 AS VARCHAR), 16, '0') ||
           lpad(CAST((rn - 1) % {BATCH} AS VARCHAR), 16, '0') AS offset
    FROM (SELECT event_id, part,
                 row_number() OVER (PARTITION BY part
                                    ORDER BY ts, event_id) AS rn
          FROM (SELECT event_id, ts, {_ROUTE_SQL} AS part FROM events))
    """,
    doc="Partitioned produce→consume round-trip (the reference's "
    "scale-out story, README.md:128-130): events hash-routed by "
    "user_id over 4 independent logs, each with its own manifest, "
    "clock and compaction; the union scan must reproduce every "
    "partition's offset sequence exactly as the oracle re-derives it "
    "from the routing hash + per-partition sort order.",
)
def partitioned_roundtrip_offsets(spark, sf_dir):
    pstream = _ingest_events_partitioned(spark, sf_dir)
    df = pstream.to_df(spark, with_partition=True)
    return df.select(
        F.get_json_object("data", "$.event_id").cast("long").alias("event_id"),
        F.col("partition").cast("long").alias("part"),
        "offset",
    )
