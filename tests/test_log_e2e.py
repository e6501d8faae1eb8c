"""End-to-end log-engine tests — ports of the reference's vitest suite
(reference ``tests/index.test.ts``), same scenarios and assertions,
against the PySpark engine's API (SURVEY.md §5).

Every test uses a fresh stream name for isolation, like the reference
(``tests/index.test.ts:29``).
"""

import threading
import time
import uuid

import pytest

from durablestreams_spark import FencingError
from durablestreams_spark.maintenance import compact, plan_compaction


def _values(records):
    return [r.data["value"] for r in records]


def test_produce_batch_returns_offsets(catalog):
    """Port of 'publish batch' (tests/index.test.ts:28-49): 8 records →
    8 offsets, 32 chars, strictly increasing."""
    s = catalog.stream(uuid.uuid4().hex)
    res = s.produce([{"value": f"msg-{i}"} for i in range(8)])
    assert len(res.offsets) == 8
    for o in res.offsets:
        assert len(o) == 32 and o.isdigit()
    assert res.offsets == sorted(res.offsets)
    assert len(set(res.offsets)) == 8


def test_consume_from_oldest_with_limit(catalog):
    """Port of consume-from-'-' (tests/index.test.ts:56-90): produce 3,
    consume from '-' limit 2 → msg-1, msg-2 in order."""
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "msg-1"}, {"value": "msg-2"}, {"value": "msg-3"}])
    recs = s.consume("-", limit=2)
    assert _values(recs) == ["msg-1", "msg-2"]
    assert recs[0].offset < recs[1].offset


def test_consume_since_time_travel(catalog):
    """The reference's 'now-30d' story (README.md:105-108): a synthetic
    offset built purely from a point in time addresses the log without
    any timestamp index."""
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "early"}], epoch_ms=1_000)
    s.produce([{"value": "mid"}], epoch_ms=5_000)
    s.produce([{"value": "late"}], epoch_ms=9_000)
    assert _values(s.consume_since(5_000, 10)) == ["mid", "late"]
    assert _values(s.consume_since(5_001, 10)) == ["late"]
    assert _values(s.consume_since(0, 10)) == ["early", "mid", "late"]
    assert s.consume_since(10_000, 10) == []


def test_consume_from_offset_exclusive_start(catalog):
    """Port of consume-from-offset (tests/index.test.ts:92-128): consuming
    from the offset of 'first' yields 'second' — exclusive start."""
    s = catalog.stream(uuid.uuid4().hex)
    res = s.produce([{"value": v} for v in ["first", "second", "third", "fourth"]])
    recs = s.consume(res.offsets[0], limit=2)
    assert _values(recs) == ["second", "third"]
    recs = s.consume(res.offsets[2], limit=10)
    assert _values(recs) == ["fourth"]
    assert s.consume(res.offsets[3], limit=10) == []


def test_long_poll_receives_concurrent_produce(catalog):
    """Port of long-poll (tests/index.test.ts:130-163): an open tail
    receives records produced while it waits."""
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "old"}])
    got = {}

    def tail():
        got["records"] = s.tail(limit=10, timeout_sec=5)

    t = threading.Thread(target=tail)
    t.start()
    time.sleep(0.2)
    s.produce([{"value": "live-1"}, {"value": "live-2"}])
    t.join(timeout=6)
    assert not t.is_alive()
    assert _values(got["records"]) == ["live-1", "live-2"]


def test_long_poll_sees_cross_process_produce(catalog, tmp_path):
    """A tail must observe records committed by a DIFFERENT process
    (simulated by a second Stream instance with its own state cache
    over the same directory): only the manifest connects them, so the
    poll loop must refold it rather than trust the cached fold
    (ADVICE: tail previously only refolded once on entry)."""
    from durablestreams_spark.stream import Stream

    name = uuid.uuid4().hex
    s1 = catalog.stream(name)
    s1.produce([{"value": "old"}])
    s2 = Stream(catalog.root, name)  # independent cache = other process
    got = {}

    def tail():
        got["records"] = s1.tail(limit=10, timeout_sec=5)

    t = threading.Thread(target=tail)
    t.start()
    time.sleep(0.2)
    s2.produce([{"value": "remote-1"}, {"value": "remote-2"}])
    t.join(timeout=6)
    assert not t.is_alive()
    assert _values(got["records"]) == ["remote-1", "remote-2"]


def test_long_poll_timeout_empty(catalog):
    """Port of long-poll timeout (tests/index.test.ts:165-177): tail on a
    never-written stream returns [] after the timeout."""
    s = catalog.stream(uuid.uuid4().hex)
    t0 = time.monotonic()
    assert s.tail(limit=10, timeout_sec=0.5) == []
    assert time.monotonic() - t0 >= 0.45


def test_compaction_preserves_order_and_contents(catalog):
    """Port of the merge test (tests/index.test.ts:181-222): two batches
    (a,b,c then d,e) → compaction → read-all returns all 5 in order."""
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": v} for v in ["a", "b", "c"]])
    s.produce([{"value": v} for v in ["d", "e"]])
    assert len(s.refresh().active) == 2
    meta = compact(s)
    assert meta is not None
    state = s.refresh()
    assert list(state.active) == [meta.name]
    assert len(state.tombstones) == 2
    assert meta.records == 5
    recs = s.consume("-", limit=100)
    assert _values(recs) == ["a", "b", "c", "d", "e"]
    assert [r.offset for r in recs] == sorted(r.offset for r in recs)


def test_producer_versioning(catalog):
    """Port of fencing tests (tests/index.test.ts:224-298): monotonic
    accept, equal accept, stale reject, versionless accept, non-numeric
    reject."""
    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "msg1"}], version=1)
    s.produce([{"value": "msg2"}], version=2)
    s.produce([{"value": "msg3"}], version=2)  # equal accepted
    with pytest.raises(FencingError):
        s.produce([{"value": "msg4"}], version=1)  # stale → 409-equivalent
    s.produce([{"value": "msg5"}])  # versionless always accepted
    with pytest.raises(ValueError):
        s.produce([{"value": "msg6"}], version="abc")  # non-numeric → 400
    vals = _values(s.consume("-", limit=100))
    assert vals == ["msg1", "msg2", "msg3", "msg5"]


def test_version_bump_only(catalog):
    """Empty records + version ⇒ version bump only, no data written
    (reference src/stream_manager.ts:265-268)."""
    s = catalog.stream(uuid.uuid4().hex)
    res = s.produce([], version=7)
    assert res.offsets == [] and res.version == 7
    assert s.consume("-", limit=10) == []
    with pytest.raises(FencingError):
        s.produce([{"value": "x"}], version=6)


def test_destroy_and_recreate(catalog):
    """Port of destroy test (tests/index.test.ts:300-348): data gone
    after destroy; same name recreatable."""
    name = uuid.uuid4().hex
    s = catalog.stream(name)
    s.produce([{"value": "doomed"}])
    s.destroy()
    assert s.consume("-", limit=10) == []
    s2 = catalog.stream(name)
    s2.produce([{"value": "reborn"}])
    assert _values(s2.consume("-", limit=10)) == ["reborn"]


def test_offsets_monotonic_across_batches_with_clock_regression(catalog):
    """Offsets strictly increase even if the caller-supplied clock goes
    backwards (reference monotonic guard, src/stream_manager.ts:407-411)."""
    s = catalog.stream(uuid.uuid4().hex)
    r1 = s.produce([{"value": "a"}], epoch_ms=1000)
    r2 = s.produce([{"value": "b"}], epoch_ms=500)  # regression
    r3 = s.produce([{"value": "c"}], epoch_ms=500)
    offs = r1.offsets + r2.offsets + r3.offsets
    assert offs == sorted(offs) and len(set(offs)) == 3
    assert _values(s.consume("-", limit=10)) == ["a", "b", "c"]


def test_cross_process_recovery(catalog, tmp_path):
    """A fresh catalog over the same root folds the manifest and sees
    identical state (reference cold-start recovery,
    src/stream_manager.ts:130-179)."""
    from durablestreams_spark import StreamCatalog

    name = uuid.uuid4().hex
    s = catalog.stream(name)
    s.produce([{"value": "a"}], version=3, epoch_ms=1000)
    s.produce([{"value": "b"}], epoch_ms=2000)

    fresh = StreamCatalog(catalog.root).stream(name)
    assert _values(fresh.consume("-", limit=10)) == ["a", "b"]
    st = fresh.refresh()
    assert st.producer_version == 3
    assert st.last_epoch_ms == 2000
    # monotonic guard survives recovery
    r = fresh.produce([{"value": "c"}], epoch_ms=1500)
    assert r.offsets[0] > "0000000000002000" + "9" * 16 or int(r.offsets[0][:16]) > 2000


def test_schemaless_heterogeneous_payloads(catalog):
    """Heterogeneous records in one stream are legal (reference
    src/stream_manager.ts:58 — data: any)."""
    s = catalog.stream(uuid.uuid4().hex)
    payloads = [{"value": "s"}, 42, [1, 2], "bare", None, {"nested": {"x": 1}}]
    s.produce(payloads)
    recs = s.consume("-", limit=10)
    assert [r.data for r in recs] == payloads


def test_retention_trims_whole_segments_only(catalog):
    """apply_retention drops segments wholly below the cutoff as
    tombstones (no rewrite), leaves partial segments intact, and is
    idempotent at the same cutoff."""
    from durablestreams_spark.maintenance import apply_retention

    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": "a"}, {"value": "b"}])
    s.produce([{"value": "c"}, {"value": "d"}])
    s.produce([{"value": "e"}])
    state = s.refresh()
    assert len(state.active) == 3
    segs = state.active_sorted()
    # cutoff strictly above segment 1's last offset but inside seg 2's
    # range: only seg 1 is wholly below it.
    cutoff = segs[1].last_offset
    victims = apply_retention(s, cutoff)
    assert [v.name for v in victims] == [segs[0].name]
    state = s.refresh()
    assert len(state.active) == 2
    assert segs[0].name in state.tombstones
    assert _values(s.consume("-", limit=100)) == ["c", "d", "e"]
    # idempotent: same cutoff again trims nothing
    assert apply_retention(s, cutoff) == []


def test_fork_stream_is_independent_zero_copy(catalog):
    """fork_stream hardlinks segments (no data copy), carries clock +
    fencing forward, and the branches evolve independently: appends to
    the fork are invisible to the source, and destroying the fork
    leaves the source's data intact (shared inodes survive unlink)."""
    import os

    from durablestreams_spark.maintenance import fork_stream

    s = catalog.stream(uuid.uuid4().hex)
    s.produce([{"value": v} for v in ["a", "b", "c"]])
    fork_name = uuid.uuid4().hex
    f = fork_stream(catalog, s.name, fork_name)
    # zero-copy: same inode behind both directory entries
    seg = s.refresh().active_sorted()[0].name
    st_src = os.stat(os.path.join(s.segments_dir, seg))
    st_dst = os.stat(os.path.join(f.segments_dir, seg))
    assert st_src.st_ino == st_dst.st_ino
    # fork sees history; append diverges; source unchanged
    assert _values(f.consume("-", limit=10)) == ["a", "b", "c"]
    f.produce([{"value": "fork-only"}])
    assert _values(f.consume("-", limit=10)) == ["a", "b", "c", "fork-only"]
    assert _values(s.consume("-", limit=10)) == ["a", "b", "c"]
    # offsets on the fork continued past the shared history
    offs = [r.offset for r in f.consume("-", limit=10)]
    assert offs == sorted(offs) and len(set(offs)) == 4
    # destroying the fork must not damage the source
    f.destroy()
    assert _values(s.consume("-", limit=10)) == ["a", "b", "c"]
    # fencing token carried forward: stale version rejected on the fork
    s2 = catalog.stream(uuid.uuid4().hex)
    s2.produce([{"value": "x"}], version=5)
    f2 = fork_stream(catalog, s2.name, uuid.uuid4().hex)
    with pytest.raises(FencingError):
        f2.produce([{"value": "y"}], version=4)


def test_version_as_of_snapshot_reads(catalog):
    """VERSION AS OF: each historical manifest version replays exactly
    its prefix of produces — including across a checkpoint boundary,
    where the checkpoint newer than the pinned version must be
    ignored."""
    from durablestreams_spark.manifest import CHECKPOINT_INTERVAL

    s = catalog.stream(uuid.uuid4().hex)
    versions = []
    n = CHECKPOINT_INTERVAL + 5
    for i in range(n):
        s.produce([{"value": f"v{i}"}])
        versions.append(s.refresh().version)
    for pick in (0, 2, CHECKPOINT_INTERVAL - 1, CHECKPOINT_INTERVAL + 2, n - 1):
        st = s.manifest.load(as_of=versions[pick])
        total = sum(m.records for m in st.active.values())
        assert total == pick + 1, (pick, total)
    # nonexistent versions raise (the Delta VERSION AS OF contract) —
    # a typo'd version must fail, not silently read a nearby snapshot
    import pytest

    with pytest.raises(ValueError, match="VERSION AS OF"):
        s.manifest.load(as_of=versions[-1] + 100)
    with pytest.raises(ValueError, match="VERSION AS OF"):
        s.manifest.load(as_of=-3)
