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

from ..analytics.core import query, spread, table

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


#: Near-dup blocking verify window: candidate pairs must be within
#: this many characters of each other (the cheap length prefilter
#: every near-dup pipeline applies before expensive similarity).
BLOCK_LEN_WINDOW = 32


@query(
    "skew_join_block_candidates",
    f"""
    WITH d AS (SELECT doc_id, lang, length(text) AS tlen FROM documents)
    SELECT a.lang,
           count(*) AS n_pairs,
           CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_left_docs
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
         AND abs(a.tlen - b.tlen) <= {BLOCK_LEN_WINDOW}
    GROUP BY a.lang
    """,
    doc="Deliberately skewed fact-fact join: near-dup candidate "
    "blocking by language over the documents corpus — the boilerplate "
    "shape where one hot key ('en', ~41% of rows) quadratically "
    "dominates the join (~70% of all candidate pairs).  The join "
    "shuffles both sides on lang, so the hot key lands in one "
    "partition: the known 100 TB join failure mode.  Mitigation is "
    "layered and plan-audited in tests/test_plan_audit.py on this "
    "exact query shape with fact-scaled thresholds: the candidate "
    "JOIN stage (what feeds per-pair verification at scale) gets "
    "AQE's OptimizeSkewedJoin split naturally; when a same-key "
    "aggregate directly consumes the join — as this graded rollup "
    "does — the join's output partitioning is load-bearing, so the "
    "split needs spark.sql.adaptive.forceOptimizeSkewedJoin=true "
    "(audited too).  The salted-agg helper covers aggregation-side "
    "skew.  The length window is the cheap verify prefilter every "
    "near-dup pipeline runs before real similarity scoring.",
)
def skew_join_block_candidates(spark, sf_dir):
    pairs = block_candidate_pairs(spark, sf_dir)
    return pairs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("doc_a").cast("bigint").alias("n_left_docs"),
    )


def block_candidate_pairs(spark, sf_dir):
    """The skewed blocking JOIN stage alone: (lang, doc_a, doc_b,
    len_a, len_b) candidate pairs.  Exposed separately because this —
    not the demo rollup above — is what a near-dup pipeline consumes
    (per-pair verification follows), and it is the stage whose hot-key
    partition AQE must split.

    ``spread`` matters here beyond CPU: AQE splits a skewed reduce
    partition by regrouping MAP outputs, so a single-mapper scan (the
    one-file local fixture) is unsplittable no matter the skew.  At
    100 TB the scan has thousands of mappers and spread is a no-op."""
    d = spread(
        table(spark, sf_dir, "documents").select(
            "doc_id", "lang", F.length("text").alias("tlen")
        )
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.col("tlen").alias("len_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        F.col("tlen").alias("len_b"),
    )
    return a.join(b, "lang").where(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= BLOCK_LEN_WINDOW)
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
