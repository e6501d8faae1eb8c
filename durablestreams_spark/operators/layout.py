"""Multi-dimensional data layout: Z-order clustering for segment files.

A log compacted in offset order prunes perfectly on time but not at
all on a second column (a user_id range predicate touches EVERY file).
Z-ordering interleaves the bits of several columns into one sort key,
so files/row-groups become min/max-tight on ALL participating columns
at once — the standard lakehouse technique (Delta ``OPTIMIZE ZORDER``,
Iceberg sort orders) for 100 TB scans with more than one selective
predicate.  Everything here is column expressions: bucketize each
column to a 16-bit rank, interleave bits with a fixed fold, range-
partition + locally sort on the z-value, write.  The only driver-side
work is the O(cols) min/max bounds aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the interleaved key (16 -> 2 cols fit a long).
Z_BITS = 16


def _bucketize(col: str, lo, hi) -> F.Column:
    """Scale a numeric column to an integer rank in [0, 2^Z_BITS - 1].
    Constant columns (hi == lo) collapse to bucket 0."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    return F.least(
        F.lit((1 << Z_BITS) - 1),
        ((F.col(col).cast("double") - float(lo)) * ((1 << Z_BITS) - 1) / span)
        .cast("long"),
    )


def z_value_expr(cols_buckets: list[str], ncols: int) -> str:
    """SQL expression interleaving pre-bucketized long columns (names
    in ``cols_buckets``): bit i of column j -> position i*ncols + j."""
    terms = []
    for j, name in enumerate(cols_buckets):
        terms.append(
            f"aggregate(sequence(0, {Z_BITS - 1}), 0L, "
            f"(acc, i) -> acc + shiftleft((shiftright({name}, i) & 1L), "
            f"i * {ncols} + {j}))"
        )
    return " + ".join(terms)


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``cols``: range-partition on the z-value (co-locates
    z-adjacent rows) and sort within each file so row-group min/max
    stats are tight on every participating column."""
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    with_buckets = df
    bucket_names = []
    for c in cols:
        bn = f"__zb_{c}"
        with_buckets = with_buckets.withColumn(
            bn, _bucketize(c, bounds[f"lo_{c}"], bounds[f"hi_{c}"])
        )
        bucket_names.append(bn)
    zed = with_buckets.withColumn(
        "__z", F.expr(z_value_expr(bucket_names, len(cols)))
    ).drop(*bucket_names)
    (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
