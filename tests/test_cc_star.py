"""Large-star/small-star connected components: label parity with
min-propagation and the round-count advantage on chain-shaped graphs
(the 100 TB motivation — near-dup chains A~B~C~...~Z with no shortcut
edges need diameter rounds under plain propagation)."""

from pyspark.sql import functions as F

from durablestreams_spark.analytics.core import all_queries
from durablestreams_spark.operators.dedup import connected_components_star

SF_DIR = "/root/testdata/sf0.001"


def _chain(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


def test_star_chain_labels_and_log_rounds(spark):
    """A diameter-16 chain must collapse to one component labelled by
    its minimum in ~log(diameter) rounds — min-propagation needs 16."""
    labels, rounds = connected_components_star(_chain(spark, 16))
    got = {(r.node, r.label) for r in labels.collect()}
    assert got == {(i, 0) for i in range(17)}
    assert rounds <= 6, f"expected O(log diameter) rounds, took {rounds}"


def test_star_two_components(spark):
    pairs = _chain(spark, 3).union(
        _chain(spark, 2).select(
            (F.col("doc_a") + 100).alias("doc_a"),
            (F.col("doc_b") + 100).alias("doc_b"),
        )
    )
    labels, _ = connected_components_star(pairs)
    got = {(r.node, r.label) for r in labels.collect()}
    assert got == {(i, 0) for i in range(4)} | {(100 + i, 100) for i in range(3)}


def test_star_matches_min_propagation_on_lsh_graph(spark):
    """Bit-identical labels to the graded min-propagation variant on
    the real LSH candidate graph (both converge to the component
    minimum)."""
    qs = all_queries()
    star = {
        (r.doc_id, r.cluster_id)
        for r in qs["dedup_connected_components_star"].fn(spark, SF_DIR).collect()
    }
    prop = {
        (r.doc_id, r.cluster_id)
        for r in qs["dedup_connected_components"].fn(spark, SF_DIR).collect()
    }
    assert star == prop and len(star) > 0


def _run_cc_oracle_on_chain(n_nodes, levels, monkeypatch):
    """Run the unrolled CC oracle CTE chain in DuckDB over a pure
    chain graph 0-1-2-...-n, with CC_ORACLE_LEVELS patched."""
    import duckdb

    from durablestreams_spark.operators import dedup as dmod

    monkeypatch.setattr(dmod, "CC_ORACLE_LEVELS", levels)
    edges = " UNION ALL ".join(
        f"SELECT {i} AS a, {i + 1} AS b UNION ALL "
        f"SELECT {i + 1} AS a, {i} AS b"
        for i in range(n_nodes - 1)
    )
    sql = f"""
    WITH edges AS MATERIALIZED ({edges}),
    {dmod._cc_unrolled_levels()}
    SELECT node, label FROM ccl{levels} ORDER BY node
    """
    return duckdb.sql(sql).fetchall()


def test_cc_oracle_converged_chain_labels(monkeypatch):
    """Positive case: a chain the unroll covers converges to label 0
    everywhere and the convergence check passes silently."""
    rows = _run_cc_oracle_on_chain(20, 8, monkeypatch)
    assert rows == [(i, 0) for i in range(20)]


def test_cc_oracle_under_unroll_self_reports(monkeypatch):
    """r10 ADVICE: an under-unrolled oracle must raise its own
    error(), not hand back unconverged labels that would red-flag a
    correct engine as a hash mismatch."""
    import pytest as _pytest

    with _pytest.raises(Exception, match="CC oracle under-unrolled"):
        _run_cc_oracle_on_chain(60, 2, monkeypatch)
