"""Exactness pins for the r15 Arrow-vectorized embedding kernels:
the SRP signature and the sequential pair-dot must be BIT-IDENTICAL
to the interpreted higher-order folds they replaced, over the real
fixture embeddings — the equality that lets every embedding query
keep its oracle hash."""

import sys

from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import table
from durablestreams_spark.operators.dedup import (
    COSINE_TIGHT_BAND_BITS,
    COSINE_TIGHT_BANDS,
    DIM_T,
    _tight_planes,
    _tight_sig_expr,
)
from durablestreams_spark.operators.similarity import (
    _PLANES,
    _bucket_spark,
    _dot,
    seq_pair_dot_arrow,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


def test_srp_sig_arrow_matches_fold(spark):
    """Both geometries: the Arrow signature equals the original
    higher-order fold character-for-character on every fixture
    vector."""
    emb = _emb(spark)

    # loose 16-plane reference: the pre-r15 _bucket_spark, verbatim
    loose_ref = F.concat(
        *[
            F.when(
                _dot(
                    "emb",
                    "array("
                    + ", ".join(f"CAST({w} AS DOUBLE)" for w in _PLANES[i])
                    + ")",
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for i in range(len(_PLANES))
        ]
    )
    # tight 256-plane reference: the pre-r15 _tight_sig_expr, verbatim
    planes_arr = "array(" + ", ".join(f"'{p}'" for p in _tight_planes()) + ")"
    n = COSINE_TIGHT_BANDS * COSINE_TIGHT_BAND_BITS
    tight_ref = F.expr(
        f"""
        concat_ws('', transform(sequence(0, {n - 1}), i ->
          IF(aggregate(sequence(0, {DIM_T - 1}), CAST(0.0 AS DOUBLE),
               (acc, j) -> acc + emb[j] *
                 IF(substring(element_at({planes_arr}, i + 1),
                              j + 1, 1) = '1',
                    CAST(1.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)))
             >= 0, '1', '0')))
        """
    )

    rows = emb.select(
        "vec_id",
        loose_ref.alias("loose_want"),
        _bucket_spark().alias("loose_got"),
        tight_ref.alias("tight_want"),
        _tight_sig_expr().alias("tight_got"),
    ).collect()
    assert rows
    for r in rows:
        assert r.loose_got == r.loose_want, r.vec_id
        assert r.tight_got == r.tight_want, r.vec_id


def test_seq_pair_dot_arrow_matches_fold(spark):
    """The Arrow pair-dot equals the sequential fold bit-for-bit on
    adjacent fixture vector pairs (including sign-mixed sums)."""
    emb = _emb(spark)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("emb").alias("va"))
    b = emb.select((F.col("vec_id") - 1).alias("ia"), F.col("emb").alias("vb"))
    pairs = a.join(b, "ia")
    fold = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    rows = pairs.select(
        "ia",
        fold.alias("want"),
        seq_pair_dot_arrow(F.col("va"), F.col("vb")).alias("got"),
    ).collect()
    assert rows
    for r in rows:
        assert r.got == r.want, (r.ia, r.got, r.want)
