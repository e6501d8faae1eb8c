"""Cross-instance concurrency: the manifest's optimistic put-if-absent
commit must serialize independent writers without losing updates
(the reference gets this from the Durable Object's single-threaded
execution; we must earn it with the commit protocol —
SURVEY.md §3.4 "single-writer commit protocol or optimistic retry")."""

import threading

from durablestreams_spark import StreamCatalog
from durablestreams_spark.offsets import offset_for_time


def test_concurrent_producers_two_handles(tmp_path):
    """Two Stream handles over the same directory (≈ two processes)
    produce concurrently: every record survives, offsets are unique and
    the manifest folds to a consistent state for a third reader."""
    root = str(tmp_path / "streams")
    n_threads, per_thread = 4, 25
    handles = [StreamCatalog(root).stream("contended") for _ in range(n_threads)]
    errs = []

    def work(h, tag):
        try:
            for i in range(per_thread):
                h.produce([{"tag": tag, "i": i}])
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [
        threading.Thread(target=work, args=(h, t)) for t, h in enumerate(handles)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs

    fresh = StreamCatalog(root).stream("contended")
    recs = fresh.consume("-", limit=10_000)
    assert len(recs) == n_threads * per_thread
    offsets = [r.offset for r in recs]
    assert len(set(offsets)) == len(offsets)
    assert offsets == sorted(offsets)
    # per-producer record order is preserved (each produce is one commit)
    for tag in range(n_threads):
        seq = [r.data["i"] for r in recs if r.data["tag"] == tag]
        assert seq == list(range(per_thread))


def test_concurrent_producer_and_compactor(tmp_path):
    """Compaction racing a producer: optimistic retry keeps both commit
    streams consistent; nothing is lost, ranges stay disjoint."""
    from durablestreams_spark.maintenance import compact

    root = str(tmp_path / "streams")
    producer = StreamCatalog(root).stream("race")
    compactor = StreamCatalog(root).stream("race")
    for b in range(8):
        producer.produce([{"b": b, "i": i} for i in range(100)])

    stop = threading.Event()
    errs = []

    def keep_producing():
        try:
            for b in range(8, 20):
                producer.produce([{"b": b, "i": i} for i in range(100)])
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)
        finally:
            stop.set()

    t = threading.Thread(target=keep_producing)
    t.start()
    compacted = 0
    while not stop.is_set():
        if compact(compactor) is not None:
            compacted += 1
    t.join()
    assert not errs and compacted >= 1

    fresh = StreamCatalog(root).stream("race")
    recs = fresh.consume("-", limit=10_000)
    assert len(recs) == 20 * 100
    offs = [r.offset for r in recs]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    segs = fresh.refresh().active_sorted()
    for a, b in zip(segs, segs[1:]):  # disjoint, ordered ranges
        assert a.last_offset < b.first_offset


def test_point_in_time_consume(tmp_path):
    """Offsets double as a time index (reference README.md:105-108):
    consuming from offset_for_time(t)-style cursors returns exactly the
    records at-or-after t."""
    from durablestreams_spark.offsets import end_of_epoch

    s = StreamCatalog(str(tmp_path / "streams")).stream("timed")
    for epoch in (1000, 2000, 3000):
        s.produce([{"at": epoch, "i": i} for i in range(3)], epoch_ms=epoch)

    # everything strictly after epoch 1000's flush:
    after_1000 = s.consume(end_of_epoch(1000), limit=100)
    assert [r.data["at"] for r in after_1000] == [2000] * 3 + [3000] * 3
    # everything at-or-after t=2000 (exclusive cursor just below epoch 2000):
    at_or_after_2000 = s.consume(end_of_epoch(1999), limit=100)
    assert [r.data["at"] for r in at_or_after_2000] == [2000] * 3 + [3000] * 3
    # a mid-epoch cursor honors the counter half too:
    first_of_2000 = [r for r in at_or_after_2000 if r.data["at"] == 2000][0]
    rest = s.consume(first_of_2000.offset, limit=100)
    assert len(rest) == 5  # 2 remaining of epoch 2000 + 3 of epoch 3000
    assert offset_for_time(3000) > rest[0].offset  # sanity: ordering holds


def test_concurrent_version_bumps_never_regress(tmp_path):
    """Version-bump-only produces from racing handles: the fencing
    token must end at the MAX bump ever committed — a lost manifest
    race must not let a lower concurrent bump overwrite a higher one
    (the bump path commits with a producer_version guard, like the
    data path)."""
    root = str(tmp_path / "streams")
    handles = [StreamCatalog(root).stream("fenced") for _ in range(4)]
    errs = []

    def bump(h, versions):
        from durablestreams_spark.manifest import FencingError

        for v in versions:
            try:
                h.produce([], version=v)
            except FencingError:
                pass  # a higher bump already landed — correct rejection
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

    # interleaved ascending ranges so low and high bumps race each other
    plans = [range(t + 1, 40 + t + 1) for t in range(4)]
    threads = [
        threading.Thread(target=bump, args=(h, p))
        for h, p in zip(handles, plans)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    final = StreamCatalog(root).stream("fenced").refresh().producer_version
    assert final == 43  # max bump across all plans
