"""Compaction planner unit tests — the reference's seven cases
(reference ``tests/index.test.ts:351-655``; thresholds
``src/segment.ts:61-65``), plus GC / orphan-purge coverage."""

import os
import uuid

from durablestreams_spark import SegmentMeta
from durablestreams_spark.maintenance import (
    MAX_BYTES,
    MAX_RECORDS,
    clean_tombstones,
    compact,
    plan_compaction,
    purge_orphans,
)


def seg(i: int, records: int = 1, nbytes: int = 1) -> SegmentMeta:
    off = f"{i:016d}" + "0" * 16
    return SegmentMeta(
        name=f"seg-{i}",
        first_offset=off,
        last_offset=f"{i:016d}" + "9" * 16,
        created_ms=i,
        records=records,
        bytes=nbytes,
    )


def names(window):
    return [s.name for s in window]


def test_all_valid_window():
    segs = [seg(1), seg(2), seg(3)]
    assert names(plan_compaction(segs)) == ["seg-1", "seg-2", "seg-3"]


def test_oversize_bytes_mid_excluded():
    segs = [seg(1), seg(2), seg(3, nbytes=MAX_BYTES + 1), seg(4)]
    assert names(plan_compaction(segs)) == ["seg-1", "seg-2"]


def test_oversize_records_mid_excluded():
    segs = [seg(1), seg(2), seg(3, records=MAX_RECORDS + 1), seg(4)]
    assert names(plan_compaction(segs)) == ["seg-1", "seg-2"]


def test_threshold_tripping_bytes_included():
    segs = [seg(1), seg(2), seg(3, nbytes=MAX_BYTES), seg(4)]
    assert names(plan_compaction(segs)) == ["seg-1", "seg-2", "seg-3"]


def test_threshold_tripping_records_included():
    segs = [seg(1), seg(2), seg(3, records=MAX_RECORDS), seg(4)]
    assert names(plan_compaction(segs)) == ["seg-1", "seg-2", "seg-3"]


def test_leading_oversize_skipped_window_resets():
    segs = [seg(1, nbytes=MAX_BYTES + 1), seg(2), seg(3)]
    assert names(plan_compaction(segs)) == ["seg-2", "seg-3"]


def test_single_segment_no_op():
    assert plan_compaction([seg(1)]) == []


def test_max_segments_cap():
    segs = [seg(i) for i in range(1, 15)]
    assert names(plan_compaction(segs)) == [f"seg-{i}" for i in range(1, 11)]


def test_empty_input():
    assert plan_compaction([]) == []


# -- executor-adjacent maintenance ------------------------------------------


def test_tombstone_gc_deletes_old_files(catalog):
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "a"}])
    s.produce([{"value": "b"}])
    compact(s)
    state = s.refresh()
    assert len(state.tombstones) == 2
    tomb_paths = [os.path.join(s.segments_dir, n) for n in state.tombstones]
    assert all(os.path.exists(p) for p in tomb_paths)

    # within retention → untouched
    assert clean_tombstones(s) == []
    # past retention → files deleted, entries purged
    future = max(ts for (_m, ts) in state.tombstones.values()) + 24 * 3600 * 1000 + 1
    purged = clean_tombstones(s, now_ms=future)
    assert sorted(purged) == sorted(state.tombstones)
    assert not any(os.path.exists(p) for p in tomb_paths)
    assert s.refresh().tombstones == {}
    # data still fully readable from the compacted segment
    assert [r.data["value"] for r in s.consume("-", 10)] == ["a", "b"]


def test_orphan_purge(catalog):
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "a"}])
    orphan = os.path.join(s.segments_dir, "9999999999999999-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a real segment")
    assert purge_orphans(s) == ["9999999999999999-deadbeef.parquet"]
    assert not os.path.exists(orphan)
    # referenced files untouched
    assert [r.data["value"] for r in s.consume("-", 10)] == ["a"]
