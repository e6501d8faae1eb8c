"""Data-selection operators (round 8): DSIR hashed-n-gram importance
resampling and seed-centroid embedding selection.  Value parity vs
DuckDB is covered by the all-queries oracle sweep; this module pins
the SCALE properties — bounded broadcast sides, JVM-side expressions,
TakeOrdered instead of global sorts — plus the selection semantics
the sweep's hash can't explain on its own."""

from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import all_queries
from durablestreams_spark.operators import pipeline_llm as P
from durablestreams_spark.operators import similarity as S
from durablestreams_spark.plans import (
    formatted_plan,
    has_python_eval,
)

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_importance_table_is_bucket_bounded(spark):
    """The broadcast side of the scoring join is the hashed-feature
    importance table: its cardinality must be <= DSIR_BUCKETS (a
    CONSTANT), never corpus-proportional — that bound is the entire
    reason the hashing trick is 100 TB-safe where a raw vocabulary
    table is not."""
    df = all_queries()["sample_dsir_importance"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert not has_python_eval(df), "DSIR must stay JVM-side"
    assert "TakeOrderedAndProject" in plan, plan


def test_dsir_selects_only_raw_pool(spark):
    """Target-domain docs are the reference distribution, not
    candidates: no lang='en' row may appear, and the output is capped
    at DSIR_TOPK with weights in descending rounded order."""
    rows = (
        all_queries()["sample_dsir_importance"].fn(spark, SF_DIR).collect()
    )
    assert 0 < len(rows) <= P.DSIR_TOPK
    assert all(r.lang != P.DSIR_TARGET_LANG for r in rows)
    weights = [r.dsir_logweight for r in rows]
    assert weights == sorted(weights, reverse=True)
    assert all(r.n_feats > 0 for r in rows)


def test_dsir_bigrams_formed_array_side(spark):
    """Bigram formation must not introduce a per-doc window (the
    text_bigram_logprob shuffle): the whole feature expansion happens
    inside the scan stage's project."""
    df = all_queries()["sample_dsir_importance"].fn(spark, SF_DIR)
    assert "Window" not in formatted_plan(df)


def test_seed_centroid_is_single_row_broadcast(spark):
    """The seed centroid must broadcast as one row against a single
    corpus pass, stay JVM-side, and top-k via TakeOrdered — never a
    global sort of all scored vectors."""
    df = all_queries()["sample_embedding_seed"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert not has_python_eval(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_seed_selection_excludes_seeds(spark):
    """Seeds are the reference set, not candidates; the pool is the
    CONSTANT-size lowest-sample-hash set (bounded by construction at
    any corpus size, unlike a corpus-proportional modulo); scores are
    valid cosines in descending rounded order."""
    from durablestreams_spark.analytics.core import table

    seed_ids = {
        r.vec_id
        for r in table(spark, SF_DIR, "embeddings")
        .orderBy(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":seed"))),
            "vec_id",
        )
        .limit(S.SEED_CAP)
        .select("vec_id")
        .collect()
    }
    assert len(seed_ids) <= S.SEED_CAP
    rows = all_queries()["sample_embedding_seed"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= S.SEED_TOPK
    assert all(r.vec_id not in seed_ids for r in rows)
    scores = [r.seed_cos for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


def test_dsir_resample_is_weighted_sample_not_rank(spark):
    """The Gumbel-top-k draw must (a) share the importance weights
    with the rank-based query, (b) produce a DIFFERENT selection than
    pure rank (that difference is the point: diversity vs mode
    collapse), and (c) stay deterministic (hash-derived Gumbels, no
    rand())."""
    qs = all_queries()
    rank_rows = qs["sample_dsir_importance"].fn(spark, SF_DIR).collect()
    rs1 = qs["sample_dsir_resample"].fn(spark, SF_DIR).collect()
    rs2 = qs["sample_dsir_resample"].fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in rs1] == [tuple(r) for r in rs2]  # no rand()
    assert 0 < len(rs1) <= P.DSIR_TOPK
    keys = [r.gumbel_key for r in rs1]
    assert keys == sorted(keys, reverse=True)
    # same weight definition for docs appearing in both outputs
    w_rank = {r.doc_id: r.dsir_logweight for r in rank_rows}
    for r in rs1:
        if r.doc_id in w_rank:
            assert r.dsir_logweight == w_rank[r.doc_id]
    # the stochastic draw must not equal the deterministic rank order
    assert [r.doc_id for r in rs1] != [r.doc_id for r in rank_rows]
