"""Z-order layout: interleaved clustering must make file-level min/max
stats selective on EVERY participating column, where a linear sort is
selective on its leading column only.  This is the property that
decides whether a 2-predicate scan reads 1% or 100% of a 100 TB table.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import table
from durablestreams_spark.operators.layout import zorder_write

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 16


def _files(path):
    import os

    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def _fraction_pruned(path, col, lo, hi):
    """Fraction of files a [lo, hi] predicate on col can SKIP from
    footer stats alone (what any engine's scan planner does)."""
    total = kept = 0
    for f in _files(path):
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index(col)
        fmin = min(
            md.row_group(rg).column(idx).statistics.min
            for rg in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(rg).column(idx).statistics.max
            for rg in range(md.num_row_groups)
        )
        total += 1
        if not (fmax < lo or fmin > hi):
            kept += 1
    return 1 - kept / total


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("layouts")
    ev = table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsu"), "value"
    )
    linear = str(root / "linear")
    zed = str(root / "zorder")
    # linear: the log's native layout — time-sorted
    (
        ev.repartitionByRange(N_FILES, "tsu")
        .sortWithinPartitions("tsu")
        .write.parquet(linear)
    )
    zorder_write(ev, ["tsu", "user_id"], zed, N_FILES)
    return spark, ev, linear, zed


def test_zorder_roundtrip_is_lossless(layouts):
    spark, ev, linear, zed = layouts
    want = ev.count()
    got = spark.read.parquet(zed)
    assert got.count() == want
    assert set(r.event_id for r in got.select("event_id").collect()) == set(
        r.event_id for r in ev.select("event_id").collect()
    )


def test_zorder_prunes_on_both_dimensions(layouts):
    spark, ev, linear, zed = layouts
    stats = ev.agg(
        F.min("tsu"), F.max("tsu"), F.min("user_id"), F.max("user_id")
    ).collect()[0]
    t_lo, t_hi, u_lo, u_hi = stats
    # ~10% range on each dimension
    t_a = t_lo + (t_hi - t_lo) * 45 // 100
    t_b = t_lo + (t_hi - t_lo) * 55 // 100
    u_a = u_lo + (u_hi - u_lo) * 45 // 100
    u_b = u_lo + (u_hi - u_lo) * 55 // 100

    # time predicate: linear is perfect, z-order must still prune some
    assert _fraction_pruned(linear, "tsu", t_a, t_b) >= 0.8
    z_time = _fraction_pruned(zed, "tsu", t_a, t_b)
    assert z_time >= 0.25, z_time

    # user predicate: linear layout prunes (almost) nothing, z-order must
    lin_user = _fraction_pruned(linear, "user_id", u_a, u_b)
    z_user = _fraction_pruned(zed, "user_id", u_a, u_b)
    assert z_user >= lin_user + 0.25, (lin_user, z_user)
    assert z_user >= 0.25, z_user


def test_zvalue_morton_properties(spark):
    """The interleave expression must be a true Morton code: bijective
    on the bucket grid and monotone in each coordinate when the other
    is fixed (that is what makes min/max ranges tight per dimension)."""
    from durablestreams_spark.operators.layout import z_value_expr

    df = (
        spark.range(64)
        .selectExpr("CAST(id % 8 AS LONG) AS a", "CAST(id DIV 8 AS LONG) AS b")
        .selectExpr("a", "b", z_value_expr(["a", "b"], 2) + " AS z")
    )
    rows = df.collect()
    zmap = {(r.a, r.b): r.z for r in rows}
    assert len(set(zmap.values())) == 64  # bijective on the grid
    for b in range(8):
        col = [zmap[(a, b)] for a in range(8)]
        assert col == sorted(col)  # monotone in a for fixed b
    for a in range(8):
        row = [zmap[(a, b)] for b in range(8)]
        assert row == sorted(row)  # monotone in b for fixed a
    # spot-check the bit layout (col j's bit i at position i*ncols+j):
    # a=0b11 -> positions 0,2; b=0b10 -> position 3 => 0b1101
    assert zmap[(3, 2)] == 0b1101
