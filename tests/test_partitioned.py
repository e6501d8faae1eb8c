"""Partitioned-stream scale-out: routing, per-key ordering, union scan."""

from durablestreams_spark.partitioned import PartitionedStream, _route


def test_keyed_routing_preserves_per_key_order(spark, catalog):
    ps = PartitionedStream(catalog, "clicks", 4)
    recs = [{"user": u, "seq": i} for i in range(10) for u in ("a", "b", "c")]
    placed = ps.produce(recs, key_of=lambda r: r["user"])
    assert len(placed) == 30 and all(p is not None for p in placed)

    # same key -> same partition, always
    by_user = {}
    for rec, (p, _off) in zip(recs, placed):
        by_user.setdefault(rec["user"], set()).add(p)
    assert all(len(parts) == 1 for parts in by_user.values())
    assert {list(v)[0] for v in by_user.values()} == {
        _route(u, 4) for u in ("a", "b", "c")
    }

    # per-key order preserved within its partition
    for u in ("a", "b", "c"):
        p = _route(u, 4)
        seqs = [
            r.data["seq"]
            for r in ps.consume(p, "-", limit=100)
            if r.data["user"] == u
        ]
        assert seqs == sorted(seqs) == list(range(10))


def test_roundrobin_and_union_scan(spark, catalog):
    ps = PartitionedStream(catalog, "rr", 3)
    ps.produce([{"i": i} for i in range(9)])  # keyless -> round-robin
    df = ps.to_df(spark)
    rows = df.collect()
    assert len(rows) == 9
    assert set(r.partition for r in rows) == {0, 1, 2}
    # every partition got an equal share
    from collections import Counter

    assert set(Counter(r.partition for r in rows).values()) == {3}


def test_destroy_all_partitions(spark, catalog):
    ps = PartitionedStream(catalog, "gone", 2)
    ps.produce([{"x": 1}, {"x": 2}])
    ps.destroy()
    assert catalog.list_streams() == []
