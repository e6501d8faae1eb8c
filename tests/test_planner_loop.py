"""The round-12 planner loop: epoch plan -> batch curation with
decontamination -> live budget burn-down.  The oracle sweep proves
hash-parity; these pin the properties the hashes alone don't make
visible (branch coverage, stage bite, arithmetic invariants)."""

from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_epoch_plan_exercises_both_branches_and_invariants(spark):
    """The budget multiplier is chosen so the fixture's demands
    straddle the repeat cap: both constrained and unconstrained
    sources must occur, and the planner's integer arithmetic must be
    self-consistent row by row."""
    from durablestreams_spark.operators.pipeline_llm import (
        EPOCH_MAX_REPEATS,
    )

    rows = all_queries()["pipeline_epoch_plan"].fn(spark, SF_DIR).collect()
    assert len(rows) > 1
    classes = {r["data_constrained"] for r in rows}
    assert classes == {True, False}, "cap never (or always) binding"
    for r in rows:
        cap = EPOCH_MAX_REPEATS * r["n_tokens"]
        assert r["alloc_tokens"] == min(r["requested_tokens"], cap), r
        assert r["shortfall_tokens"] == max(
            0, r["requested_tokens"] - cap
        ), r
        assert r["data_constrained"] == (r["requested_tokens"] > cap), r
        assert 0 < r["repeat_factor"] <= EPOCH_MAX_REPEATS, r


def test_curate_v4_decontamination_stage_bites(spark):
    """v4's decon stage must actually change the result vs v3 on the
    fixture (the corpus has contaminated docs), and no contaminated
    doc may survive into v4's canonical set — checked through the
    composed datasheet totals."""
    qs = all_queries()
    v3 = {
        (r["split"], r["source"]): (r["n_docs"], r["sum_tokens"])
        for r in qs["pipeline_curate_v3"].fn(spark, SF_DIR).collect()
    }
    v4 = {
        (r["split"], r["source"]): (r["n_docs"], r["sum_tokens"])
        for r in qs["pipeline_curate_v4"].fn(spark, SF_DIR).collect()
    }
    assert v4, "empty datasheet"
    assert v3 != v4, "decontamination stage had no effect on the fixture"
    # v4 never admits MORE docs than v3 in any cell it shares
    # (decon only removes; the per-source cut can only move up or
    # keep docs whose ranks improve, but totals across the datasheet
    # must not grow)
    assert sum(v[0] for v in v4.values()) <= sum(
        v[0] for v in v3.values()
    )


def test_budget_monitor_tracks_the_plan(spark):
    """Per-source invariants of the live burn-down: alloc matches the
    plan, remaining = alloc - admitted, utilization is the snapped
    ratio, and at least one source has burned budget."""
    qs = all_queries()
    plan = {
        r["source"]: r["alloc_tokens"]
        for r in qs["pipeline_epoch_plan"].fn(spark, SF_DIR).collect()
    }
    rows = (
        qs["streaming_token_budget_monitor"].fn(spark, SF_DIR).collect()
    )
    assert len(rows) > 0
    assert any(r["admitted_tokens"] > 0 for r in rows)
    for r in rows:
        assert r["alloc_tokens"] == plan[r["source"]], r
        assert (
            r["remaining_tokens"]
            == r["alloc_tokens"] - r["admitted_tokens"]
        ), r
        want_util = (
            int(
                r["admitted_tokens"] / r["alloc_tokens"] * 1000000 + 0.5
            )
            / 1000000
        )
        assert abs(r["utilization"] - want_util) < 1e-12, r
        # one corpus replay cannot exceed a 4x-budget allocation
        assert 0 <= r["utilization"] < 1, r


def test_budgeted_writer_delivers_exactly_the_plan(spark):
    """The actuator's core identity: per-source delivered whitespace
    tokens == the plan's alloc_tokens for EVERY source (the boundary
    doc is truncated, so this is integer equality, not tolerance),
    with both constrained (no fractional epoch) and unconstrained
    (truncating fractional epoch) sources present in the fixture."""
    qs = all_queries()
    plan = {
        r["source"]: r["alloc_tokens"]
        for r in qs["pipeline_epoch_plan"].fn(spark, SF_DIR).collect()
    }
    rows = qs["pipeline_budgeted_delivery"].fn(spark, SF_DIR).collect()
    assert {r["source"] for r in rows} == set(plan)
    for r in rows:
        assert r["budget_met"], r
        assert r["delivered_tokens"] == plan[r["source"]], r
    frac_classes = {r["n_frac_docs"] == 0 for r in rows}
    assert frac_classes == {True, False}, (
        "fixture must exercise both the rem=0 (constrained) and the "
        "truncating-fractional paths"
    )


def test_budgeted_writer_rerun_is_byte_identical(spark, tmp_path):
    """Two independent builds (separate artifact roots, no shared
    cache) must produce the identical budgeted shard set — the
    seeded-shuffle reproducibility contract extended to the
    epoch-repeated corpus."""
    from durablestreams_spark.operators.pipeline_llm import (
        _write_shards_budgeted,
    )

    cols = ["shard_out", "rank", "key", "shard", "seq_id", "n_tokens_in"]
    a = sorted(
        map(
            tuple,
            _write_shards_budgeted(spark, SF_DIR, root=str(tmp_path / "a"))
            .select(*cols)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            _write_shards_budgeted(spark, SF_DIR, root=str(tmp_path / "b"))
            .select(*cols)
            .collect(),
        )
    )
    assert a == b
    assert len(a) > 0


def test_budgeted_writer_repeats_epoch_major(spark):
    """A constrained source's docs appear exactly full_epochs times in
    the delivered rows, an unconstrained source's boundary doc is
    truncated (0 < delivered < its full n_tok), and total delivered
    across sources equals the plan's total allocation."""
    from pyspark.sql import functions as F

    from durablestreams_spark.operators.pipeline_llm import (
        _budgeted_doc_rows,
        pipeline_epoch_plan,
    )

    rows = _budgeted_doc_rows(spark, SF_DIR)
    plan = pipeline_epoch_plan(spark, SF_DIR).collect()
    alloc = {r["source"]: r["alloc_tokens"] for r in plan}
    full = {
        r["source"]: r["alloc_tokens"] // r["n_tokens"] for r in plan
    }
    rem = {r["source"]: r["alloc_tokens"] % r["n_tokens"] for r in plan}
    per_doc = (
        rows.groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .collect()
    )
    for r in per_doc:
        # every doc appears at least full_epochs times, at most +1
        # (the fractional epoch), and for rem=0 sources exactly
        # full_epochs times
        assert full[r["source"]] <= r["n_copies"] <= full[r["source"]] + 1, r
        if rem[r["source"]] == 0:
            assert r["n_copies"] == full[r["source"]], r
    total = rows.agg(F.sum("n_tok")).collect()[0][0]
    assert total == sum(alloc.values())


def test_bpe_counts_match_token_ids(spark):
    """_bpe_doc_counts' separator-count formula must equal the payload
    path's len(token ids) for every doc — the parity that lets the
    BPE plan and the BPE payload writer share one token unit."""
    from durablestreams_spark.operators.pipeline_llm import (
        _bpe_doc_counts,
        _bpe_token_ids,
    )

    cnt = {
        r["doc_id"]: r["n_tok"]
        for r in _bpe_doc_counts(spark, SF_DIR).collect()
    }
    ids = {
        r["doc_id"]: len(r["ids"])
        for r in _bpe_token_ids(spark, SF_DIR).collect()
    }
    assert cnt == ids and len(cnt) > 0


def test_bpe_plan_is_a_different_plan(spark):
    """The unit is part of the plan's identity: BPE merges compress
    sources non-uniformly, so the BPE plan's allocations must differ
    from the whitespace plan's (if they coincided, the 'declared
    contract made executable' claim would be vacuous)."""
    from durablestreams_spark.operators.pipeline_llm import (
        pipeline_epoch_plan,
        pipeline_epoch_plan_bpe,
    )

    wp = {
        r["source"]: r["alloc_tokens"]
        for r in pipeline_epoch_plan(spark, SF_DIR).collect()
    }
    bp = {
        r["source"]: r["alloc_tokens"]
        for r in pipeline_epoch_plan_bpe(spark, SF_DIR).collect()
    }
    assert set(wp) == set(bp)
    assert any(wp[s] != bp[s] for s in wp), (wp, bp)


def test_bpe_budgeted_payload_delivers_the_plan(spark):
    """BPE-unit done-criterion (r13 task 4): budget_met TRUE for every
    source, BOTH plan branches present (constrained rem=0 sources and
    truncating ones), the written payload shards carry exactly the
    allocated token total, and the boundary-doc slice is real (some
    delivered row ships fewer ids than its doc has)."""
    from durablestreams_spark.operators.pipeline_llm import (
        _bpe_plan_and_rows,
        _bpe_doc_counts,
        pipeline_budgeted_delivery_bpe,
        pipeline_write_shards_budgeted_payload,
    )

    deliv = pipeline_budgeted_delivery_bpe(spark, SF_DIR).collect()
    assert len(deliv) > 0
    assert all(r["budget_met"] for r in deliv), deliv
    assert any(r["n_frac_docs"] == 0 for r in deliv), "no constrained source"
    assert any(r["n_frac_docs"] > 0 for r in deliv), "no truncating source"
    man = pipeline_write_shards_budgeted_payload(spark, SF_DIR).collect()
    assert sum(r["n_tokens"] for r in man) == sum(
        r["alloc_tokens"] for r in deliv
    )
    full = {
        r["doc_id"]: r["n_tok"]
        for r in _bpe_doc_counts(spark, SF_DIR).collect()
    }
    rows = _bpe_plan_and_rows(spark, SF_DIR)[1].collect()
    assert any(r["n_tok"] < full[r["doc_id"]] for r in rows), (
        "no boundary doc was actually truncated"
    )
