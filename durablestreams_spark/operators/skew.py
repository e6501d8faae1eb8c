"""Skew mitigation: salted two-stage aggregation.

A groupBy on a skewed key sends every row of the hot key to one
reducer; at 100 TB one straggler task holds the job.  Salting splits
each key into ``n_salts`` synthetic sub-keys, pre-aggregates per
(key, salt) — spreading the hot key over n reducers — then combines
the partials.  Works for any algebraic aggregate (sum/count/min/max,
avg via sum+count).  AQE's skew-join handling covers JOIN skew at
runtime; aggregation skew still wants this rewrite, so the engine
ships it as a first-class helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analytics.core import query, table

N_SALTS = 16


def salted_agg(
    df: DataFrame,
    key: str,
    salt_col,
    aggs: dict[str, tuple],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage salted aggregation for algebraic aggregates.

    ``aggs`` maps output name → (source column, partial fn, combine fn),
    e.g. ``{"n": ("*", F.count, F.sum), "mx": ("x", F.max, F.max)}``.
    ``salt_col`` must be a deterministic expression (a hash of row
    identity), never rand() — reproducibility is part of the contract.
    """
    stage1 = df.withColumn("__salt", F.abs(salt_col) % n_salts).groupBy(
        key, "__salt"
    )
    partials = stage1.agg(
        *[
            (part(F.lit(1)) if src == "*" else part(src)).alias(f"__p_{name}")
            for name, (src, part, _comb) in aggs.items()
        ]
    )
    return partials.groupBy(key).agg(
        *[
            comb(f"__p_{name}").alias(name)
            for name, (_src, _part, comb) in aggs.items()
        ]
    )


@query(
    "skew_salted_agg_quantity",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Salted two-stage aggregate on a 3-value (maximally skewed) key: "
    f"stage 1 groups by (key, salt%{N_SALTS}) spreading each hot key "
    "over 16 reducers, stage 2 combines partials per key. Results are "
    "identical to the direct groupBy (the oracle IS the direct "
    "groupBy) — only the shuffle distribution changes. Salt = "
    "deterministic row hash, so both stages are reproducible.",
)
def skew_salted_agg_quantity(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key="l_returnflag",
        salt_col=F.hash(F.col("l_orderkey") * 7 + F.col("l_linenumber")),
        aggs={
            "qty": ("l_quantity", F.sum, F.sum),
            "n": ("*", F.count, F.sum),
            "mx": ("l_extendedprice", F.max, F.max),
        },
    )
    return out.select(
        "l_returnflag",
        F.round("qty", 2).alias("sum_qty"),
        "n",
        F.round("mx", 2).alias("max_price"),
    )
