"""Bulk, Spark-native produce: assign offsets to a whole DataFrame and
write it into a stream as batched segments — one distributed job.

The reference's produce path is a point operation (buffer → 200 ms
flush → one segment, ``src/stream_manager.ts:384-500``); backfilling a
large table through it would serialize everything through the driver.
This module is the scale path: the same offset semantics (epoch ‖
counter, 16+16 zero-padded digits, monotonic epochs —
``src/stream_manager.ts:76-85,401-427``) computed as column
expressions, with the global total order established WITHOUT a
single-partition sort:

1. ``repartitionByRange(order_by)`` — range shuffle, each partition
   holds a contiguous key range;
2. per-partition ``row_number`` over ``Window.partitionBy(pid)`` —
   parallel, no skew beyond the range partitioner's;
3. partition row-counts (a tiny agg) → driver-side prefix sums →
   broadcast-joined back to turn local row numbers into global ones.

That is the textbook distributed zip-with-index; the only global
barrier is the O(partitions) count collect.  Records land in segment
files of ``batch_records`` rows each; every file is then registered in
ONE manifest commit (group commit taken to its logical extreme).
"""

from __future__ import annotations

import os
import sys
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .manifest import SegmentMeta, offset_bounds_from_footer
from .stream import Stream, _now_ms


def assign_offsets(
    df: DataFrame,
    order_by: list[str],
    batch_records: int = 1000,
    base_epoch: int = 1,
) -> DataFrame:
    """Add ``offset``/``ts``/``batch`` columns: rows sorted by
    ``order_by`` get offsets ``(base_epoch + rn // batch_records,
    rn % batch_records)`` — batch *i* behaves like the *i*-th flush of
    a producer with a logical clock, exactly reproducible by SQL
    arithmetic (which is what the duckdb oracle does)."""
    ranged = df.repartitionByRange(*order_by)
    pid = F.spark_partition_id()
    local = (
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(*order_by)
        )
        - 1
    )
    # Persist so the count job and the write job see the SAME range
    # partitioning (the partitioner samples; recomputation could shift
    # boundary rows between partitions and corrupt the prefix sums).
    with_local = (
        ranged.withColumn("__pid", pid).withColumn("__local", local).persist()
    )
    counts = (
        with_local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    sizes = {r["__pid"]: r["__n"] for r in counts}
    prefix: dict[int, int] = {}
    acc = 0
    for p in sorted(sizes):
        prefix[p] = acc
        acc += sizes[p]
    pref_df = df.sparkSession.createDataFrame(
        [(p, n) for p, n in prefix.items()], "__pid int, __prefix long"
    )
    rn = (F.col("__prefix") + F.col("__local")).alias("__rn")
    epoch = (F.lit(base_epoch) + (F.col("__rn") / batch_records).cast("long")).alias(
        "__epoch"
    )
    counter = (F.col("__rn") % batch_records).alias("__counter")
    out = (
        with_local.join(F.broadcast(pref_df), "__pid")
        .select("*", rn)
        .select("*", epoch, counter)
        .withColumn(
            "offset",
            F.concat(
                F.lpad(F.col("__epoch").cast("string"), 16, "0"),
                F.lpad(F.col("__counter").cast("string"), 16, "0"),
            ),
        )
        .withColumn("ts", F.timestamp_millis(F.col("__epoch")))
        .withColumn("batch", F.col("__epoch"))
        .drop("__pid", "__local", "__rn", "__epoch", "__counter", "__prefix")
    )
    # Hand the persisted intermediate + total row count to the caller
    # (unpersist-after-write; file-count planning without a second scan).
    out._ds_persisted = with_local  # type: ignore[attr-defined]
    out._ds_total = acc  # type: ignore[attr-defined]
    out._ds_nparts = max(1, len(sizes))  # type: ignore[attr-defined]
    return out


def produce_bulk(
    stream: Stream,
    df: DataFrame,
    order_by: list[str],
    batch_records: int = 1000,
    payload_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    segment_rows: int | None = None,
    exact_segments: bool = False,
) -> int:
    """Write a whole DataFrame into ``stream`` as offset-assigned
    segments; returns the number of segment files committed.

    ``df`` columns are JSON-encoded into the schemaless ``data`` payload
    (reference record shape ``{offset, data}``,
    ``src/stream_manager.ts:56-59``).  Epochs continue after the
    stream's current clock, so bulk loads interleave correctly with
    point produces.  Durability order matches the reference: all data
    files first, then one metadata commit = the ack point
    (``src/stream_manager.ts:498,516``).

    ``batch_records`` sets the offset arithmetic (records per logical
    epoch); ``segment_rows`` sets the physical file size.  The two are
    independent: the manifest invariant is only that segment offset
    ranges are DISJOINT.  With ``segment_rows=None`` (default) the
    write reuses the range partitioning ``assign_offsets`` already
    established: offsets are monotonic in the order key, so each
    existing partition holds a CONTIGUOUS offset range and one
    locally-sorted file per partition is disjoint BY CONSTRUCTION —
    no second full-data shuffle (at 100 TB that shuffle doubles the
    ingest I/O; file count = shuffle partitions, which is the knob
    that sizes them).  Passing ``segment_rows`` explicitly sizes files
    without ever SAMPLING: every row's global position is already
    arithmetic in its offset, so the target file id is the column
    expression ``rn div segment_rows`` — when existing partitions are
    at least segment-sized the write just splits in-task via
    ``maxRecordsPerFile`` (NO second shuffle — the 100 TB path); when
    they are smaller (many tiny partitions from a wide shuffle) a
    deterministic hash repartition on the file id merges them into
    exactly ceil(total/segment_rows) files.  Unlike
    ``repartitionByRange`` this never runs a sampling job over the
    data, and files stay disjoint by construction: within a task, rows
    sort by offset, file-id groups are contiguous in that order, and
    every group except the global tail is exactly ``segment_rows``
    rows, so the ``maxRecordsPerFile`` splits land precisely on group
    boundaries.  Either way the write is a plain sequential parquet
    write, never a dynamic ``partitionBy`` (measured 3-10× slower and
    high-variance for many small partitions).
    """
    trace = os.environ.get("DS_TIMING")

    def _t(label: str, t0: float) -> float:
        t1 = time.perf_counter()
        if trace:
            print(f"## produce_bulk {label}: {t1 - t0:.2f}s", file=sys.stderr)
        return t1

    t0 = time.perf_counter()
    state = stream.refresh()
    if txn is not None and state.txns.get(str(txn[0]), -1) >= txn[1]:
        # Replay detection (Delta txnAppId/txnVersion): this (app,
        # batch) is already durably committed — a replayed bulk batch
        # is a NO-OP success, never a duplicate write.  The commit
        # guard in _finish_bulk revalidates on the fresh fold, closing
        # the window between this check and the commit.
        return 0
    base_epoch = state.last_epoch_ms + 1
    payload = F.to_json(
        F.struct(*[F.col(c) for c in (payload_cols or df.columns)])
    ).alias("data")
    with_offsets = assign_offsets(df, order_by, batch_records, base_epoch)
    t0 = _t("assign", t0)
    assigned = with_offsets.select("offset", "ts", payload)
    total = with_offsets._ds_total  # type: ignore[attr-defined]
    max_records_per_file = 0
    if segment_rows is None:
        # Partition-contiguous fast path: broadcast-join + projections
        # preserved assign_offsets' range partitioning, so offsets are
        # contiguous per partition — local sort, no second shuffle.
        writer_df = assigned.sortWithinPartitions("offset")
    else:
        n_files = max(1, -(-total // segment_rows))
        n_parts = with_offsets._ds_nparts  # type: ignore[attr-defined]
        max_records_per_file = segment_rows
        if n_files >= n_parts and not exact_segments:
            # Partitions are at least segment-sized: keep the existing
            # range partitioning and let the writer split each task's
            # sorted run at segment_rows boundaries.  Zero extra
            # shuffle — the plan a 100 TB ingest needs.  (File count
            # is ceil per partition, so up to n_parts files more than
            # the exact target; sizes never exceed segment_rows.  The
            # seam file at each partition boundary is SHORT, so callers
            # needing arithmetically-predictable segment geometry —
            # e.g. the retention audit's oracle — pass
            # ``exact_segments=True`` to force the repartition path
            # below at the cost of its extra shuffle.)
            writer_df = assigned.sortWithinPartitions("offset")
        else:
            # Many small partitions → merge into exactly n_files.  The
            # file id is pure offset arithmetic (global row number div
            # segment_rows), so a hash repartition on it needs NO
            # sampling pass, unlike repartitionByRange.  Sorting by
            # offset inside each task restores contiguity; the
            # maxRecordsPerFile cap splits colliding file-id groups
            # (hash collisions put 2+ ids in one task) exactly at
            # their boundaries because every non-tail group is exactly
            # segment_rows rows and the tail group sorts last.
            rn = (
                (F.col("offset").substr(1, 16).cast("long") - base_epoch)
                * batch_records
                + F.col("offset").substr(17, 16).cast("long")
            )
            file_id = F.expr(f"rn_tmp div {int(segment_rows)}")
            writer_df = (
                assigned.withColumn("rn_tmp", rn)
                .withColumn("__file", file_id)
                .repartition(n_files, "__file")
                .sortWithinPartitions("offset")
                .drop("rn_tmp", "__file")
            )

    run_dir = f"bulk-{uuid.uuid4().hex}"
    out = os.path.join(stream.segments_dir, run_dir)
    # In-flight marker: purge_orphans spares this run's files — however
    # old they get — until the marker disappears.  The grace period
    # alone can't cover a bulk job whose write outlives it (slow
    # cluster, long fsync loop): without the marker, purge could reap
    # files the imminent manifest commit then references.  Removed in
    # the finally below on EVERY exit: success makes the files
    # referenced; failure makes them ordinary aged orphans.
    os.makedirs(stream.segments_dir, exist_ok=True)
    marker = f"{out}._inflight"
    with open(marker, "w") as f:
        f.write(str(_now_ms()))
    try:
        return _finish_bulk(
            stream, writer_df, with_offsets, out, marker, state, base_epoch,
            txn, _t, t0, max_records_per_file,
        )
    finally:
        # EVERY exit — including a failed write or a metadata-scan
        # error — drops the marker: success makes the files referenced,
        # failure makes them ordinary aged orphans (reaped after the
        # normal grace, not pinned for the 24 h abandon timeout).
        try:
            os.unlink(marker)
        except OSError:
            pass


def _finish_bulk(
    stream, writer_df, with_offsets, out, marker, state, base_epoch, txn, _t, t0,
    max_records_per_file=0,
):
    try:
        w = writer_df.write.mode("error")
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(out)
        t0 = _t("write", t0)
    finally:
        with_offsets._ds_persisted.unpersist()  # type: ignore[attr-defined]
    # Refresh the marker after the write lands: the fsync+metadata scan
    # below can itself be long on a huge run, and the abandon timeout
    # (maintenance.BULK_INFLIGHT_ABANDON_MS) counts from the marker's
    # mtime.  Write jobs expected to exceed that timeout should
    # additionally touch the marker from a heartbeat.
    try:
        os.utime(marker)
    except FileNotFoundError:
        # A concurrent orphan purge reaped the marker: the write took
        # longer than BULK_INFLIGHT_ABANDON_MS with no heartbeat, so
        # the just-written files may already be purge candidates.
        # Committing anyway could reference deleted files — fail with
        # the real cause instead of a confusing downstream error.
        raise RuntimeError(
            "bulk ingest exceeded the in-flight abandon timeout "
            "(BULK_INFLIGHT_ABANDON_MS) and its marker was reaped; "
            "re-run, or touch the marker from a heartbeat for long jobs"
        ) from None

    metas = []
    now = _now_ms()
    paths = [
        os.path.join(root, fn)
        for root, _dirs, files in os.walk(out)
        for fn in files
        if fn.endswith(".parquet")
    ]

    # Spark's committer renames, it does not fsync: flush bytes + dir
    # entry before the manifest references any file (same
    # durability-before-ack invariant as _write_segment).  The per-file
    # fsync + footer read both release the GIL, so a thread pool turns
    # N serial disk round-trips into ~N/16 (a serial loop over hundreds
    # of part files at tens-of-ms tail fsync latency was the slowest
    # phase of large runs); each DIRECTORY entry is flushed once after
    # all its files, not once per file.
    def _sync_and_scan(path: str):
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        return path, pq.read_metadata(path)

    from concurrent.futures import ThreadPoolExecutor

    if paths:
        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
            scanned = list(ex.map(_sync_and_scan, paths))
        for d in sorted({os.path.dirname(p) for p in paths}):
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
    else:
        scanned = []

    for path, md in scanned:
        if md.num_rows == 0:
            # Empty input ⇒ Spark still writes a 0-row part file; it
            # has no offsets and must not enter the manifest.
            os.unlink(path)
            continue
        rel = os.path.relpath(path, stream.segments_dir)
        # Shared footer fold (manifest.offset_bounds_from_footer): the
        # same O(row groups) stats read key compaction uses, and it
        # raises a clear error on stats-less row groups instead of the
        # AttributeError a bare ``st.min`` would hit.
        first, last, n = offset_bounds_from_footer(md, rel)
        metas.append(
            SegmentMeta(
                name=rel,
                first_offset=first,
                last_offset=last,
                created_ms=now,
                records=n,
                bytes=os.path.getsize(path),
            )
        )
    metas.sort(key=lambda m: m.first_offset)
    t0 = _t("fsync+scan", t0)
    last_epoch = int(metas[-1].last_offset[:16]) if metas else state.last_epoch_ms
    actions = {
        "add": [m.to_json() for m in metas],
        "set": {"last_epoch_ms": last_epoch},
    }
    if txn is not None:
        actions["txn"] = {"app": txn[0], "batch": txn[1]}
    # Offsets derive from base_epoch: if a point producer claimed an
    # epoch >= ours mid-job, committing would interleave ranges — abort
    # loudly instead (bulk loads re-run; they don't silently corrupt).
    # The txn watermark is validated INSIDE the guard (same contract as
    # _produce_locked.fresh_enough): a zombie replayer whose batch a
    # failover already committed must abort here, not double-append.
    from .manifest import CommitConflict

    try:
        stream._commit(
            actions,
            guard=lambda st: st.last_epoch_ms < base_epoch
            and (txn is None or st.txns.get(str(txn[0]), -1) < txn[1]),
        )
    except CommitConflict:
        if (
            txn is not None
            and stream.refresh().txns.get(str(txn[0]), -1) >= txn[1]
        ):
            # Lost to a concurrent replayer that committed OUR batch:
            # the records are durable, so this is a no-op success; our
            # written files become ordinary aged orphans (the inflight
            # marker drops in produce_bulk's finally).
            return 0
        raise
    return len(metas)
