"""Exactness pins for the r16 Arrow-vectorized PQ kernels: codes and
per-query ADC lookup tables must be BIT-IDENTICAL to the
explode → broadcast-join → window chain they replaced (the d2 values
feed the graded adist sums; the codes pick the lookup slots), over the
real fixture embeddings — the equality that lets the PQ/IVFPQ queries
keep their oracle hashes."""

import math
import os

from pyspark.sql import functions as F

from durablestreams_spark.operators.similarity import (
    PQ_M,
    _pq_artifacts_build,
    pq_codes_arrow,
    pq_dtable_arrow,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pq_artifacts_arrow_matches_join(spark):
    """codes and qdt from the Arrow kernels equal the replaced
    join/window chain row-for-row and bit-for-bit on the fixture."""
    os.environ["SPARK_GRAFT_PQENC"] = "join"
    try:
        codes_j, qdt_j = _pq_artifacts_build(spark, SF_DIR)
        want_codes = {
            r.vec_id: list(r.codes) for r in codes_j.collect()
        }
        want_qdt = {r.query_id: r.dt for r in qdt_j.collect()}
    finally:
        os.environ.pop("SPARK_GRAFT_PQENC", None)
    codes_a, qdt_a = _pq_artifacts_build(spark, SF_DIR)
    got_codes = {r.vec_id: list(r.codes) for r in codes_a.collect()}
    got_qdt = {r.query_id: r.dt for r in qdt_a.collect()}

    assert got_codes.keys() == want_codes.keys() and want_codes
    for vid, want in want_codes.items():
        assert got_codes[vid] == want, vid
    assert got_qdt.keys() == want_qdt.keys() and want_qdt
    for qid, want in want_qdt.items():
        got = got_qdt[qid]
        assert len(got) == len(want), qid
        for m, (ga, wa) in enumerate(zip(got, want)):
            # exact float equality — the kernel replays the fold's
            # IEEE op order, so bits must match, not just values
            assert list(ga) == list(wa), (qid, m)


def test_pq_codes_arrow_ties_nan_null(spark):
    """Selection semantics pinned against the window chain's rules:
    exact d2 ties fall to the LOWEST cent_id (row_number tie-break),
    NaN distances lose to every number (Spark orders NaN above all;
    all-NaN falls to cent 0), and a NULL embedding yields [0]*M codes
    and an all-NULL lookup table (NULL d2 → NULLS FIRST tie →
    cent 0 in the chain)."""
    # 2 subspaces × width 2; sub 0 has duplicate centroids (tie) and
    # sub 1 puts the true argmin at cent 1.
    codebook = [
        [[1.0, 1.0], [1.0, 1.0], [0.0, 0.0]],
        [[9.0, 9.0], [2.0, 2.0]],
    ]
    df = spark.createDataFrame(
        [
            (1, [1.0, 1.0, 2.0, 2.0]),   # sub0 tie between cents 0,1
            (2, [0.1, 0.1, 8.0, 8.0]),   # sub0 → cent 2, sub1 → cent 0
            (3, [float("nan"), 0.0, 2.0, 2.0]),  # sub0 all-NaN → cent 0
            (4, None),
        ],
        "vec_id long, emb array<double>",
    )
    rows = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            pq_codes_arrow(F.col("emb"), codebook).alias("codes"),
            pq_dtable_arrow(F.col("emb"), codebook).alias("dt"),
        ).collect()
    }
    assert list(rows[1].codes) == [0, 1]
    assert list(rows[2].codes) == [2, 0]
    assert list(rows[3].codes) == [0, 1]
    assert list(rows[4].codes) == [0, 0]
    # dtable: exact values for the live rows, NULLs for the NULL emb
    assert list(rows[1].dt[0]) == [0.0, 0.0, 2.0]
    assert list(rows[1].dt[1]) == [98.0, 0.0]
    assert all(math.isnan(x) for x in rows[3].dt[0])
    assert rows[4].dt == [[None, None, None], [None, None]]
    assert len(rows[1].dt) == 2


def test_pq_query_surface_arrow_matches_join(spark):
    """End-to-end pin on the graded surface: similarity_pq_topk rows
    are identical under both encoder paths (ANN cache off in tests,
    so both run the live build)."""
    from durablestreams_spark.analytics.core import all_queries

    fn = all_queries()["similarity_pq_topk"].fn
    os.environ["SPARK_GRAFT_PQENC"] = "join"
    try:
        want = sorted(
            tuple(r) for r in fn(spark, SF_DIR).collect()
        )
    finally:
        os.environ.pop("SPARK_GRAFT_PQENC", None)
    got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert want and got == want


def test_pq_adc_arrow_matches_join_fixture(spark):
    """The mapInArrow ADC scorer returns the identical graded rows as
    the replaced crossJoin × broadcast scoring on the real fixture
    (both encoder paths already pinned above, so this isolates the
    scorer)."""
    from durablestreams_spark.analytics.core import all_queries

    fn = all_queries()["similarity_pq_topk"].fn
    os.environ["SPARK_GRAFT_PQADC"] = "join"
    try:
        want = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    finally:
        os.environ.pop("SPARK_GRAFT_PQADC", None)
    got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert want and got == want


def test_pq_adc_arrow_nulls_ties_nan(spark):
    """Adversarial scorer parity: exact adist ties at the top-K
    boundary (neighbor_id tie-break), NULL codes rows / NULL code
    elements / short arrays / out-of-range codes (all NULL adist →
    NULLS FIRST), NULL-bearing and fully-NULL lookup tables (the
    per-row Python fold path), NaN cells (rank last), and self-pair
    exclusion — join vs Arrow must agree row-for-row."""
    from durablestreams_spark.operators.similarity import (
        PQ_M,
        _pq_adc_search,
    )

    clean = [[0.0, 1.0]] * PQ_M
    with_null = [[None, 1.0]] + [[0.0, 1.0]] * (PQ_M - 1)
    with_nan = [[float("nan"), 2.0]] + [[0.0, 1.0]] * (PQ_M - 1)
    codes_rows = (
        [(i, [0] * PQ_M) for i in range(1, 8)]     # 7-way exact tie
        + [
            (8, [1] * PQ_M),
            (9, None),                              # NULL codes row
            (10, [0] * (PQ_M - 1) + [None]),        # NULL element
            (100, [0] * PQ_M),                      # self of q100
        ]
    )
    # (a short codes array or out-of-range code is an ANSI
    # INVALID_ARRAY_INDEX error in BOTH paths — not representable in
    # real artifacts, and the Arrow scorer raises the same way)
    qdt_rows = [
        (100, clean),
        (101, with_null),
        (102, None),                                # NULL table
        (103, with_nan),
    ]
    codes = spark.createDataFrame(
        codes_rows, "vec_id long, codes array<int>"
    )
    qdt = spark.createDataFrame(
        qdt_rows, "query_id long, dt array<array<double>>"
    )

    def run():
        return sorted(
            (
                r.query_id,
                r.neighbor_id,
                r.rank,
                None if r.adist is None else repr(r.adist),
            )
            for r in _pq_adc_search(codes, qdt).collect()
        )

    os.environ["SPARK_GRAFT_PQADC"] = "join"
    try:
        want = run()
    finally:
        os.environ.pop("SPARK_GRAFT_PQADC", None)
    got = run()
    assert want and got == want
    # sanity on the semantics themselves: q100's top-5 is NULL-adist
    # candidates first (9, 10), then the lowest-id tied rows; self
    # (vec 100) excluded
    q100 = sorted((t for t in got if t[0] == 100), key=lambda t: t[2])
    assert [t[1] for t in q100] == [9, 10, 1, 2, 3]


def test_pq_codebook_shape():
    """The kernels must keep accepting ragged codebooks (the dense
    re-key can leave different centroid counts per subspace)."""
    assert PQ_M == 16  # the graded geometry the artifacts persist
