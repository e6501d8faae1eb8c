"""MMR diverse re-ranking: structural properties of the greedy
selection.  Reference capability: similarity search / RAG retrieval
(SURVEY.md §2.2), diversity-aware variant."""

from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import all_queries
from durablestreams_spark.operators.similarity import (
    MMR_CAND,
    MMR_K,
    MMR_LAMBDA,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mmr_full_distinct_picks_per_query(spark):
    rows = all_queries()["similarity_mmr_rerank"].fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q
    for q, rs in by_q.items():
        assert sorted(x.pick for x in rs) == list(range(1, MMR_K + 1)), q
        assert len({x.neighbor_id for x in rs}) == MMR_K, q


def test_mmr_first_pick_is_top1(spark):
    """Pick 1 must be the plain cosine top-1 (empty selected set ⇒ no
    diversity penalty yet), and its score must be exactly λ·cosine of
    that neighbor.  (Later picks' scores are NOT monotone on this
    fixture: near-orthogonal random vectors have negative
    candidate-candidate cosines, so the −(1−λ)·max-sim penalty can
    legitimately ADD — standard MMR behavior when similarities go
    negative.)"""
    qs = all_queries()
    mmr = {
        (r.query_id, r.pick): (r.neighbor_id, r.mmr_score)
        for r in qs["similarity_mmr_rerank"].fn(spark, SF_DIR).collect()
    }
    brute = {
        r.query_id: (r.neighbor_id, r.cosine)
        for r in qs["similarity_knn_brute"].fn(spark, SF_DIR).collect()
        if r.rank == 1
    }
    for q, (top1, cos1) in brute.items():
        nid, score = mmr[(q, 1)]
        assert nid == top1, (q, nid, top1)
        assert abs(score - MMR_LAMBDA * cos1) < 1e-3, (q, score, cos1)


def test_mmr_constants_are_fixed():
    assert isinstance(MMR_CAND, int) and isinstance(MMR_K, int)
    assert MMR_K <= MMR_CAND
    assert 0.0 < MMR_LAMBDA < 1.0
