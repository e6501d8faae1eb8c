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


def test_srp_sig_arrow_null_emb_matches_fold(spark):
    """A NULL embedding must produce the all-'0' signature in BOTH
    geometries — exactly what the replaced folds emitted
    (IF(NULL >= 0, '1', '0') evaluates to '0' per plane; r15 ADVICE:
    the kernel used to emit NULL, which would band/bucket NULL-emb
    rows differently from the fold)."""
    df = spark.createDataFrame(
        [(1, None), (2, [float(j) - 31.5 for j in range(DIM_T)])],
        "vec_id long, emb array<double>",
    )
    rows = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            _bucket_spark().alias("loose"),
            _tight_sig_expr().alias("tight"),
        ).collect()
    }
    assert rows[1].loose == "0" * len(_PLANES)
    assert rows[1].tight == "0" * (COSINE_TIGHT_BANDS * COSINE_TIGHT_BAND_BITS)
    # the live row still gets a real signature
    assert set(rows[2].loose) <= {"0", "1"} and "1" in rows[2].tight


def test_simhash_and_nb_logit_null_propagation(spark):
    """NULL text -> NULL simhash (the replaced SQL aggregate over a
    NULL array returns NULL) and NULL feats -> NULL nb_logit (the
    replaced decimal fold propagated NULL); zero-token/empty rows
    keep their old values (simhash 0 / prior-only logit)."""
    from durablestreams_spark.operators.dedup import simhash_expr
    from durablestreams_spark.operators.streaming_queries import (
        _nb_logit_col,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "alpha beta alpha")],
        "doc_id long, text string",
    )
    sh = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", simhash_expr("text").alias("sh")
        ).collect()
    }
    assert sh[1] is None
    assert sh[2] == 0
    assert sh[3] is not None and sh[3] != 0

    feats = spark.createDataFrame(
        [(1, None), (2, []), (3, ["alpha", "beta"])],
        "doc_id long, feats array<string>",
    )
    lam = {0: 0.5}
    got = {
        r.doc_id: r.logit
        for r in feats.select(
            "doc_id", _nb_logit_col(F.col("feats"), lam, 1.25).alias("logit")
        ).collect()
    }
    assert got[1] is None
    assert got[2] == 1.25  # prior-only for genuinely empty arrays
    assert got[3] is not None


def test_dot_unrolled_matches_fold(spark):
    """The r16 unrolled dot variant (explicit 64-term sum — measured
    SLOWER and kept OUT of production, see _dot's docstring) must
    still be BIT-IDENTICAL to the interpreted sequential fold on
    every fixture pair — the same op sequence ((0.0 + p0) + p1) + ...
    — including NULL-array and NULL-element propagation.  This pins
    the equivalence claim the negative-result record relies on."""
    import os

    os.environ["SPARK_GRAFT_DOT"] = "unroll"
    try:
        _run_dot_pin(spark)
    finally:
        os.environ.pop("SPARK_GRAFT_DOT", None)


def _run_dot_pin(spark):
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
        _dot("va", "vb", dim=DIM_T).alias("got"),
        F.sqrt(_dot("va", "va", dim=DIM_T)).alias("norm_got"),
        F.sqrt(
            F.expr(
                "aggregate(zip_with(va, va, (x, y) -> x * y), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        ).alias("norm_want"),
    ).collect()
    assert rows
    for r in rows:
        assert r.got == r.want, (r.ia, r.got, r.want)
        assert r.norm_got == r.norm_want, r.ia

    # NULL array and NULL element both propagate to NULL, like the fold
    nulls = spark.createDataFrame(
        [
            (1, None, [1.0] * DIM_T),
            (2, [1.0] * DIM_T, [0.5] * 32 + [None] + [0.5] * 31),
        ],
        "i long, va array<double>, vb array<double>",
    )
    got = {
        r.i: (r.got, r.want)
        for r in nulls.select(
            "i",
            _dot("va", "vb", dim=DIM_T).alias("got"),
            F.expr(
                "aggregate(zip_with(va, vb, (x, y) -> x * y), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("want"),
        ).collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (None, None)


def test_l2sq_unrolled_matches_fold(spark):
    """The r16 unrolled PQ subspace L2 variant (kept OUT of
    production — same negative result as _dot) must equal the
    interpreted fold bit-for-bit on fixture subvector pairs."""
    import os

    from durablestreams_spark.operators.similarity import PQ_SUB, _l2sq

    os.environ["SPARK_GRAFT_DOT"] = "unroll"

    emb = _emb(spark)
    sub = emb.selectExpr(
        "vec_id", f"slice(emb, 1, {PQ_SUB}) AS sa",
        f"slice(emb, {PQ_SUB + 1}, {PQ_SUB}) AS sb"
    )
    fold = F.expr(
        "aggregate(zip_with(sa, sb, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    try:
        rows = sub.select(
            "vec_id",
            fold.alias("want"),
            _l2sq("sa", "sb", dim=PQ_SUB).alias("got"),
        ).collect()
    finally:
        os.environ.pop("SPARK_GRAFT_DOT", None)
    assert rows
    for r in rows:
        assert r.got == r.want, (r.vec_id, r.got, r.want)
