"""IVF with a learned (k-means) coarse quantizer: the centroids must
actually be learned — not the seeded init — and the probe-limited
search must recover a floor fraction of the exact brute-force answer.
Reference capability: approximate-nearest-neighbor over the embedding
column (SURVEY.md §2.2 similarity search, scale path)."""

from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import all_queries, table
from durablestreams_spark.operators.similarity import (
    IVF_ASSIGN,
    IVF_K,
    IVF_NPROBE,
    IVF_TRAIN_CAP,
    SAMPLE_HASH_A,
    SAMPLE_HASH_B,
    SAMPLE_HASH_M,
    TOP_K,
    _ivf_ranked,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ivf_recall_floor_vs_brute(spark):
    """recall@5 against the exact baseline: multi-probe + multi-assign
    k-means IVF measured 0.92 at sf0.001 AND sf0.01 on this fixture
    (near-orthogonal random vectors — the hard case for ANN); 0.8 is
    the regression floor."""
    qs = all_queries()
    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        brute = _pairs(qs["similarity_knn_brute"].fn(spark, sf_dir))
        ivf = _pairs(qs["similarity_ivf_topk"].fn(spark, sf_dir))
        recall = len(brute & ivf) / len(brute)
        assert recall >= 0.8, f"{sf_dir}: recall@{TOP_K} {recall:.3f} < 0.8"


def test_ivf_returns_full_topk_per_query(spark):
    df = all_queries()["similarity_ivf_topk"].fn(spark, SF_DIR)
    per_q = df.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] == TOP_K for r in per_q)


def _seq_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _py_reference_ivf(sf_dir):
    """Third-engine reference: the same seeded Lloyd + multi-probe
    search in pure Python, with every float op in the same order as
    the Spark expressions (sequential folds, ascending-id means), so
    the result must match BIT-FOR-BIT.  Catches a silent regression
    back to the modulo stand-in quantizer, which the DuckDB oracle
    cannot (oracle and query would regress in sync)."""
    import math

    import pyarrow.parquet as pq

    from durablestreams_spark.operators.similarity import IVF_KMEANS_ITERS

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    rows = sorted(
        zip(
            t.column("vec_id").to_pylist(),
            [[float(x) for x in v] for v in t.column("embedding").to_pylist()],
        )
    )
    norms = {i: math.sqrt(_seq_dot(v, v)) for i, v in rows}

    def h(i):
        return (i * SAMPLE_HASH_A + SAMPLE_HASH_B) % SAMPLE_HASH_M

    sample = sorted(rows, key=lambda t: (h(t[0]), t[0]))[:IVF_TRAIN_CAP]
    cents = {c: list(v) for c, (_i, v) in enumerate(sample[:IVF_K])}
    train = sample
    for _ in range(IVF_KMEANS_ITERS):
        cnorm = {c: math.sqrt(_seq_dot(e, e)) for c, e in cents.items()}
        assign = {}
        for i, v in train:
            best = min(
                cents,
                key=lambda c: (
                    -(_seq_dot(v, cents[c]) / (norms[i] * cnorm[c])),
                    c,
                ),
            )
            assign.setdefault(best, []).append((i, v))
        new = {}
        for c, members in assign.items():
            acc = [0.0] * len(members[0][1])
            for _i, v in sorted(members):
                for d, x in enumerate(v):
                    acc[d] = acc[d] + x
            n = float(len(members))
            new[c] = [s / n for s in acc]
        cents = new
    cnorm = {c: math.sqrt(_seq_dot(e, e)) for c, e in cents.items()}

    def ranked_cells(i, v):
        return sorted(
            cents,
            key=lambda c: (
                -(_seq_dot(v, cents[c]) / (norms[i] * cnorm[c])),
                c,
            ),
        )

    # multiple assignment: every vector is indexed under its
    # IVF_ASSIGN nearest cells
    cells_of = {i: set(ranked_cells(i, v)[:IVF_ASSIGN]) for i, v in rows}
    out = set()
    for qi, qv in rows:
        if qi % 100 != 0:
            continue
        probes = set(ranked_cells(qi, qv)[:IVF_NPROBE])
        scored = [
            (_seq_dot(v, qv) / (norms[i] * norms[qi]), i)
            for i, v in rows
            if i != qi and cells_of[i] & probes
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, i) in enumerate(scored[:TOP_K], start=1):
            out.add((qi, i, rank, round(sim, 4)))
    return out


def test_ivf_matches_pure_python_reference(spark):
    got = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in all_queries()["similarity_ivf_topk"].fn(spark, SF_DIR).collect()
    }
    want = _py_reference_ivf(SF_DIR)
    assert got == want, f"missing={want - got} extra={got - want}"


def test_ivf_probe_set_is_bounded(spark):
    """Multi-probe must search NPROBE cells of an index that stores
    each vector ASSIGN times — the scanned fraction of the corpus is
    ASSIGN·NPROBE/K by construction, and must stay materially below
    a full scan."""
    assert IVF_K >= 2
    expected_frac = IVF_ASSIGN * IVF_NPROBE / IVF_K
    assert expected_frac < 0.75


def test_ivf_capacity_is_corpus_independent(spark):
    """The round-5 scale-killer regression guard: the quantizer's
    capacity (number of centroids, training-sample size) must NOT
    scale with the corpus.  sf0.001 has 500 vectors, sf0.1 has 2000 —
    a 4x corpus must still learn exactly IVF_K centroids from at most
    IVF_TRAIN_CAP sample rows, so the Lloyd-stage broadcast is O(K)
    rows at any scale."""
    for sf_dir in (SF_DIR, "/root/testdata/sf0.1"):
        ranked = _ivf_ranked(spark, sf_dir)
        n_cents = ranked.select("cent_id").distinct().count()
        assert n_cents == IVF_K, (sf_dir, n_cents)
    n_01 = table(spark, "/root/testdata/sf0.1", "embeddings").count()
    n_001 = table(spark, SF_DIR, "embeddings").count()
    assert n_01 >= 4 * n_001  # the fixtures really do differ in size


def test_ivfpq_recall_floor_vs_brute(spark):
    """With the FAISS-style exact-refine stage (ADC top-REFINE pool
    re-ranked by exact cosine), IVFPQ's recall is candidate-limited —
    the ADC quantization error no longer reaches the final top-k — so
    it matches the standalone IVF searcher's measured 0.92 on this
    fixture (probes x multi-assign decide the candidate set in both).
    0.8 is the regression floor, same as IVF's; pre-refine this
    operator measured 0.3."""
    qs = all_queries()
    brute = _pairs(qs["similarity_knn_brute"].fn(spark, SF_DIR))
    ivfpq = _pairs(qs["similarity_ivfpq_topk"].fn(spark, SF_DIR))
    recall = len(brute & ivfpq) / len(brute)
    assert recall >= 0.8, f"recall@{TOP_K} {recall:.3f} < 0.8"
    df = qs["similarity_ivfpq_topk"].fn(spark, SF_DIR)
    per_q = df.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] == TOP_K for r in per_q)


def test_rank_centroids_null_cosine_sorts_last(spark):
    """ADVICE r8: a NULL cosine (zero-norm vector or degenerate
    centroid) must rank LAST, matching the windowed form's NULLS-LAST
    and the DuckDB oracle — un-coalesced, NULL sorts FIRST in Spark's
    struct ordering and the degenerate pairing would grab cr=1."""
    from pyspark.sql import functions as F

    from durablestreams_spark.operators.similarity import (
        _dot,
        _rank_centroids_inrow,
    )

    cents = [
        {"cent_id": 0, "cemb": [1.0, 0.0], "cnorm": 1.0},
        # degenerate centroid: cosine is NULL
        {"cent_id": 1, "cemb": [0.0, 0.0], "cnorm": 0.0},
        {"cent_id": 2, "cemb": [0.0, 1.0], "cnorm": 1.0},
    ]
    v = (
        spark.createDataFrame(
            [(1, "a", [0.0, 1.0]), (2, "b", [0.0, 0.0])],
            "vec_id long, label string, emb array<double>",
        )
        .withColumn("norm", F.sqrt(_dot("emb", "emb")))
    )
    out = _rank_centroids_inrow(v, cents)
    ranks = {
        (r["vec_id"], r["cent_id"]): r["cr"] for r in out.collect()
    }
    # normal vector: nearest real centroid first, degenerate centroid LAST
    assert ranks[(1, 2)] == 1
    assert ranks[(1, 1)] == 3
    # zero-norm vector: every cosine NULL -> ties broken by cent_id asc
    assert ranks[(2, 0)] == 1 and ranks[(2, 1)] == 2 and ranks[(2, 2)] == 3


def test_ivf_upsert_delta_is_searchable_and_flagged(spark):
    """The upsert contract: vectors OUTSIDE the base training snapshot
    (the ~20% md5 delta) must surface as neighbors through the frozen
    base-trained quantizer — assignment alone makes them searchable —
    and the from_delta flag must agree with the split rule on every
    row.  Recall floor: the upsert index's top-K must recover a
    sensible fraction of brute force despite the quantizer never
    having seen the delta."""
    import hashlib

    qs = all_queries()
    rows = qs["similarity_ivf_upsert"].fn(spark, SF_DIR).collect()
    assert rows

    def is_delta(vid):
        return (
            hashlib.md5(f"{vid}:ivfup".encode()).hexdigest()[:2] >= "cc"
        )

    assert all(r.from_delta == is_delta(r.neighbor_id) for r in rows)
    flags = {r.from_delta for r in rows}
    assert flags == {True, False}, (
        f"expected both base and delta neighbors, got {flags}"
    )
    # recall floor vs exact brute force on the same query stride
    brute = _pairs(qs["similarity_knn_brute"].fn(spark, SF_DIR))
    got = _pairs(qs["similarity_ivf_upsert"].fn(spark, SF_DIR))
    recall = len(got & brute) / len(brute)
    assert recall >= 0.8, recall


def test_ivf_remove_retires_and_promotes(spark):
    """remove_ids semantics: (a) no removed vector appears in the
    post-removal result — as neighbor OR as query; (b) the structural
    former-top-1 case promotes: the smallest pre-removal query's
    rank-1 neighbor is removed, so post-removal that query's rank-1
    must be its pre-removal rank-2 (the next-best survivor); (c) the
    post-removal result equals the same frozen-quantizer search over
    the surviving rows (rebuild equivalence)."""
    from durablestreams_spark.operators.similarity import (
        _ivf_index,
        _ivf_removed_ids,
        _ivf_search_topk,
    )

    qs = all_queries()
    out = qs["similarity_ivf_remove"].fn(spark, SF_DIR)
    rows = out.collect()
    assert rows
    removed = {
        r["vec_id"] for r in _ivf_removed_ids(spark, SF_DIR).collect()
    }
    assert removed, "empty removal set — the composition is vacuous"
    for r in rows:
        assert r["neighbor_id"] not in removed, r
        assert r["query_id"] not in removed, r
    pre = (
        _ivf_search_topk(_ivf_index(spark, SF_DIR))
        .orderBy("query_id", "rank")
        .collect()
    )
    q0 = pre[0]["query_id"]
    pre_q0 = [r for r in pre if r["query_id"] == q0]
    assert pre_q0[0]["neighbor_id"] in removed, "top-1 case not planted"
    if q0 not in removed:
        post_q0 = sorted(
            (r for r in rows if r["query_id"] == q0),
            key=lambda r: r["rank"],
        )
        survivors = [
            r["neighbor_id"]
            for r in pre_q0
            if r["neighbor_id"] not in removed
        ]
        assert post_q0[0]["neighbor_id"] == survivors[0], (
            pre_q0,
            post_q0,
        )
    # (c) rebuild equivalence: same quantizer, surviving rows only
    surv = _ivf_index(spark, SF_DIR).where(
        ~F.col("vec_id").isin(list(removed))
    )
    rebuilt = {
        tuple(r) for r in _ivf_search_topk(surv).collect()
    }
    assert {tuple(r) for r in rows} == rebuilt


def test_ivf_remove_never_rereads_the_corpus(spark, tmp_path):
    """refresh_ivf_remove is O(|removed| + |index rows|): seed a
    private index copy, DELETE the corpus parquet it was built from,
    and the refresh must still succeed — the corpus is never
    re-read."""
    import os
    import shutil

    from durablestreams_spark.operators.similarity import (
        _ivf_index,
        refresh_ivf_remove,
    )

    sf_copy = tmp_path / "sf"
    shutil.copytree(SF_DIR, sf_copy)
    idx_p = str(tmp_path / "index.parquet")
    _ivf_index(spark, str(sf_copy)).write.parquet(idx_p)
    some = [
        r["vec_id"]
        for r in spark.read.parquet(idx_p).select("vec_id").distinct().limit(3).collect()
    ]
    os.remove(sf_copy / "embeddings.parquet")
    removed = spark.createDataFrame([(v,) for v in some], "vec_id long")
    out = refresh_ivf_remove(spark, idx_p, removed)
    assert out is not None
    left = {r["vec_id"] for r in out.select("vec_id").distinct().collect()}
    assert left and not (left & set(some))


def test_ivf_remove_does_not_mutate_the_shared_artifact(spark):
    """The graded removal query serves from a PRIVATE artifact copy:
    similarity_ivf_topk must return identical rows before and after a
    similarity_ivf_remove run."""
    qs = all_queries()
    before = sorted(map(tuple, qs["similarity_ivf_topk"].fn(spark, SF_DIR).collect()))
    qs["similarity_ivf_remove"].fn(spark, SF_DIR).collect()
    after = sorted(map(tuple, qs["similarity_ivf_topk"].fn(spark, SF_DIR).collect()))
    assert before == after


def test_pq_remove_shares_the_removal_set_and_spares_the_artifact(spark):
    """The PQ removal must retire EXACTLY the same vectors as the IVF
    removal (one dedup decision, every artifact), never emit a removed
    vector as neighbor or query, and leave the shared pq_codes
    artifact unmutated for similarity_pq_topk."""
    from durablestreams_spark.operators.similarity import (
        _ivf_removed_ids,
    )

    qs = all_queries()
    before = sorted(
        map(tuple, qs["similarity_pq_topk"].fn(spark, SF_DIR).collect())
    )
    out = qs["similarity_pq_remove"].fn(spark, SF_DIR).collect()
    assert out
    removed = {
        r["vec_id"] for r in _ivf_removed_ids(spark, SF_DIR).collect()
    }
    for r in out:
        assert r["neighbor_id"] not in removed, r
        assert r["query_id"] not in removed, r
    after = sorted(
        map(tuple, qs["similarity_pq_topk"].fn(spark, SF_DIR).collect())
    )
    assert before == after
