"""Partitioned streams: N independent ordered logs under one name.

This is the reference's own scale-out story made first-class: *"a
single Kafka partition with its own timestamp oracle"* scales
horizontally by adding streams (``README.md:128-130,161``) — ordering
is per-partition, throughput is partitions × per-stream rate, and no
coordination ever crosses a partition boundary (each has its own
manifest, clock, and fencing token).

Routing is by key hash (md5 — stable across processes and engines,
unlike Python's seeded ``hash``); records without a key round-robin.
Analytics read the union of partition tables — Spark unions manifests'
pruned file lists, so a partitioned scan costs the same as N/Nth scans
in parallel.
"""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import functions as F

from .stream import Record, Stream, StreamCatalog

PARTITION_SEP = "--p"


def _route(key: str, n: int) -> int:
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") % n


class PartitionedStream:
    """One logical stream fanned over ``n_partitions`` physical logs."""

    def __init__(self, catalog: StreamCatalog, name: str, n_partitions: int):
        if n_partitions < 1:
            raise ValueError("n_partitions must be >= 1")
        self.name = name
        self.n_partitions = n_partitions
        self._parts = [
            catalog.stream(f"{name}{PARTITION_SEP}{i}") for i in range(n_partitions)
        ]
        self._rr = itertools.count()

    def partition(self, i: int) -> Stream:
        return self._parts[i]

    # -- produce --------------------------------------------------------

    def produce(self, records: list, key_of=None) -> list[tuple[int, str]]:
        """Append records, routed by ``key_of(record)`` (same key ⇒ same
        partition ⇒ relative order preserved, the Kafka contract);
        keyless records round-robin.  Returns (partition, offset) per
        record, in input order."""
        buckets: dict[int, list[tuple[int, object]]] = {}
        for idx, rec in enumerate(records):
            key = key_of(rec) if key_of else None
            p = (
                _route(str(key), self.n_partitions)
                if key is not None
                else next(self._rr) % self.n_partitions
            )
            buckets.setdefault(p, []).append((idx, rec))
        out: list[tuple[int, str] | None] = [None] * len(records)
        for p, items in buckets.items():
            res = self._parts[p].produce([r for _, r in items])
            for (idx, _), off in zip(items, res.offsets):
                out[idx] = (p, off)
        return out  # type: ignore[return-value]

    # -- consume --------------------------------------------------------

    def consume(self, partition: int, offset: str = "-", limit: int = 10) -> list[Record]:
        """Offset-addressed scan of ONE partition — offsets are only
        meaningful per-partition (there is no global order; that's the
        point of partitioning)."""
        return self._parts[partition].consume(offset, limit)

    # -- Spark surface ----------------------------------------------------

    def to_df(self, spark, with_partition: bool = True):
        """The whole logical stream as one DataFrame (union of the
        partitions' manifest-pruned scans)."""
        dfs = []
        for i, part in enumerate(self._parts):
            df = part.to_df(spark)
            if with_partition:
                df = df.withColumn("partition", F.lit(i))
            dfs.append(df)
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def destroy(self) -> None:
        for part in self._parts:
            part.destroy()
