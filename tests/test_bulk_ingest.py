"""Bulk-ingest equivalence: the distributed offset assignment must be
indistinguishable from feeding the same rows, in the same order, in
``batch_records``-sized batches through the serial point-produce path
(which is itself the reference's semantics)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from durablestreams_spark import StreamCatalog, produce_bulk
from durablestreams_spark.ingest import assign_offsets
from durablestreams_spark.offsets import serialize_offset


@pytest.mark.parametrize("n,batch", [(1, 10), (10, 3), (1000, 1000), (2500, 100)])
def test_bulk_offsets_equal_serial_point_produce(spark, catalog, n, batch):
    rows = [(i, f"k{i}") for i in range(n)]

    bulk = catalog.stream(f"bulk_{n}_{batch}")
    produce_bulk(
        bulk,
        spark.createDataFrame(rows, "i long, k string"),
        order_by=["i"],
        batch_records=batch,
    )

    serial = catalog.stream(f"serial_{n}_{batch}")
    for start in range(0, n, batch):
        serial.produce(
            [{"i": i, "k": k} for i, k in rows[start : start + batch]],
            epoch_ms=start // batch + 1,
        )

    got = [(r.offset, r.data["i"]) for r in bulk.consume("-", limit=n + 1)]
    want = [(r.offset, r.data["i"]) for r in serial.consume("-", limit=n + 1)]
    assert got == want and len(got) == n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    batch=st.integers(min_value=1, max_value=50),
    base=st.integers(min_value=1, max_value=10**9),
)
def test_assign_offsets_arithmetic_property(spark, n, batch, base):
    """offset(row k of the order) == serialize(base + k//batch, k%batch),
    for arbitrary (n, batch, base) — and offsets are strictly
    increasing in the order key even when keys arrive shuffled."""
    df = spark.range(n).selectExpr("(id * 37) % 997 AS shuffled", "id")
    out = assign_offsets(df, ["id"], batch_records=batch, base_epoch=base)
    rows = sorted(out.select("id", "offset", "batch").collect(), key=lambda r: r.id)
    out._ds_persisted.unpersist()
    for r in rows:
        k = r.id
        assert r.offset == serialize_offset(base + k // batch, k % batch)
        assert r.batch == base + k // batch
    offs = [r.offset for r in rows]
    assert offs == sorted(offs)
