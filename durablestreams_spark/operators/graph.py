"""Link-analysis over the near-dup candidate graph (SURVEY.md §2.2
"LLM-pipeline: near-dup / similarity" — the ranking step downstream of
candidate generation).

Corpus-curation pipelines don't stop at finding duplicate *pairs*:
once the LSH candidate graph exists, centrality over it picks the
canonical representative per neighborhood (the doc most-connected to
its near-dups) and exposes template/boilerplate hubs — the same role
harmonic-centrality / PageRank plays in CommonCrawl-derived corpus
curation.  This module runs fixed-iteration PageRank over the
symmetrized ``dedup_minhash_lsh_pairs`` edge set.

Scale design (the reason this is iterative DataFrame code, not one
SQL): each iteration is one join (edges ⋈ ranks on src) plus one
aggregation (sum of contributions by dst) — both shuffle on the SAME
key family, so at cluster scale the edge table is hash-partitioned
once and every round's join co-locates.  ``localCheckpoint`` after
every round truncates lineage so round N's plan never replays rounds
1..N-1 (the classic iterative-Spark failure mode).  Iteration count is
FIXED (not convergence-tested): the oracle must replay the exact same
computation, and a fixed unroll keeps the DuckDB side expressible as a
plain CTE chain.

The symmetrized candidate graph has no dangling nodes by construction
(every node has out-degree ≥ 1), so no dangling-mass redistribution
term is needed — the textbook update rule applies exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..analytics.core import query
from .dedup import (
    CC_ORACLE_LEVELS,
    _cc_unrolled_levels,
    _PAIRS_SQL,
    dedup_minhash_lsh_pairs,
)

#: Damping factor — the standard 0.85 from the original paper.
PR_DAMPING = 0.85
#: Fixed iteration count; near-dup neighborhoods are near-cliques with
#: tiny diameter, so ranks are effectively converged well before 5.
PR_ITERS = 5
#: Graded output size (total order: rounded rank desc, doc_id asc).
PR_TOPK = 100


def _pagerank_chain(p: str = "") -> str:
    """The unrolled fixed-iteration PageRank update as a CTE fragment
    (expects a ``pairs(doc_a, doc_b)`` CTE in scope; final ranks land
    in ``{p}r{PR_ITERS}(node, r)``).  ``p`` prefixes every CTE name so
    the chain composes with other pair-graph chains (e.g. the
    connected-components closure) in one oracle."""
    d = PR_DAMPING
    # Render the BASE term as the Python-computed double literal:
    # DuckDB would evaluate `1 - 0.85` in exact DECIMAL (0.15) while
    # Spark starts from the Python double 1.0 - 0.85
    # (0.15000000000000002...), a 2-ulp divergence that propagates
    # through all iterations and can flip a round(,6) boundary (the
    # same class as the -0.0 MMR fix).  One literal, both engines
    # start from the identical double.
    one_minus_d = repr(1.0 - PR_DAMPING)
    parts = [
        f"""{p}edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    {p}deg AS (SELECT src, count(*) AS d FROM {p}edges GROUP BY src),
    {p}nodes AS (SELECT DISTINCT src AS node FROM {p}edges),
    {p}nn AS (SELECT count(*) AS n FROM {p}nodes),
    {p}r0 AS (SELECT node, 1.0 / {p}nn.n AS r FROM {p}nodes, {p}nn)"""
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""{p}c{i} AS (
        SELECT e.dst AS node, sum({p}r{i - 1}.r / {p}deg.d) AS s
        FROM {p}edges e
        JOIN {p}r{i - 1} ON e.src = {p}r{i - 1}.node
        JOIN {p}deg ON e.src = {p}deg.src
        GROUP BY e.dst
    ),
    {p}r{i} AS (
        SELECT n.node, {one_minus_d} / {p}nn.n + {d} * coalesce({p}c{i}.s, 0.0) AS r
        FROM {p}nodes n CROSS JOIN {p}nn LEFT JOIN {p}c{i} ON {p}c{i}.node = n.node
    )"""
        )
    return ",\n    ".join(parts)


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as a DuckDB CTE chain over the
    same LSH candidate pairs the Spark side computes."""
    return f"""
    WITH pairs AS ({_PAIRS_SQL}),
    {_pagerank_chain()}
    SELECT node AS doc_id, round(r, 6) AS pagerank
    FROM r{PR_ITERS}
    ORDER BY round(r, 6) DESC, node
    LIMIT {PR_TOPK}
    """


@query(
    "graph_pagerank_dup_centrality",
    _pagerank_oracle(),
    doc=f"Fixed-{PR_ITERS}-iteration PageRank (d={PR_DAMPING}) over the "
    "symmetrized LSH near-dup candidate graph — centrality-based "
    "canonical-doc ranking / boilerplate-hub detection for corpus "
    "curation. Iterative joins with per-round localCheckpoint "
    "(lineage truncation); edge+degree table materialized ONCE and "
    "reused by all rounds, so per-round cost is one co-partitionable "
    "join + one partial-aggregated sum. Oracle: the same update rule "
    f"unrolled {PR_ITERS}× as a CTE chain.",
)
def graph_pagerank_dup_centrality(spark, sf_dir):
    ranks = _pagerank_ranks(spark, sf_dir)
    return (
        ranks.select(
            F.col("node").alias("doc_id"), F.round("r", 6).alias("pagerank")
        )
        .orderBy(F.col("pagerank").desc(), "doc_id")
        .limit(PR_TOPK)
    )


def _pagerank_ranks(spark, sf_dir, pairs=None):
    """Full (node, r) rank table after PR_ITERS rounds — shared by the
    graded top-k and the canonical-keeper composition (which injects a
    materialized ``pairs`` so the LSH pipeline runs once for both)."""
    if pairs is None:
        pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # Materialize (src, dst, deg) once: the expensive LSH pipeline and
    # the degree aggregation run a single time, and all PR_ITERS rounds
    # join against this cached table instead of replaying it.
    ew = edges.join(deg, "src").localCheckpoint()
    nodes = ew.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = nodes.count()  # bounded scalar (candidate-graph node count)
    if n == 0:
        # No candidate pairs at all (e.g. a dup-free fixture): the
        # oracle's CTE chain yields zero rows; match its schema exactly.
        return spark.createDataFrame([], "node long, r double")
    base = (1.0 - PR_DAMPING) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("d")).alias("s"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit(base) + F.lit(PR_DAMPING) * F.coalesce("s", F.lit(0.0))
            ).alias("r"),
        )
    # ONE checkpoint after the fixed unroll: a 5-deep join tree over the
    # (already-materialized) edge table executes as one job, measured
    # 1.6x faster at sf1 than eagerly materializing every round.
    # Per-round checkpoints stay necessary only for CONVERGENCE loops
    # (see connected components), where the depth is unbounded and each
    # round needs its own action anyway.
    return ranks.localCheckpoint()


@query(
    "dedup_canonical_by_centrality",
    f"""
    WITH pairs AS MATERIALIZED ({_PAIRS_SQL}),
    cc_edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    {_cc_unrolled_levels(edges="cc_edges")},
    clusters AS (
        SELECT node AS doc_id, label AS cluster_id
        FROM ccl{CC_ORACLE_LEVELS}
    ),
    {_pagerank_chain("pr_")},
    ranked AS (
        SELECT c.cluster_id, c.doc_id, r.r,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY round(r.r, 6) DESC, c.doc_id) AS rn
        FROM clusters c JOIN pr_r{PR_ITERS} r ON r.node = c.doc_id
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keeper_doc,
           round(min(CASE WHEN rn = 1 THEN round(r, 6) END), 6) AS keeper_rank
    FROM ranked
    GROUP BY cluster_id ORDER BY cluster_id
    """,
    doc="The end-to-end dedup decision: connected components turn the "
    "LSH candidate pairs into clusters, PageRank ranks every member, "
    "and the highest-centrality doc becomes each cluster's canonical "
    "keeper (tie → lowest id) — replacing the min-id keeper heuristic "
    "with 'the doc most-connected to its near-dups', the pick that "
    "best represents a boilerplate family. Composes the two iterative "
    "graph operators (shared edge base, each with per-round "
    "localCheckpoint); the oracle composes the recursive-CTE closure "
    "with the prefixed PageRank chain over one shared pairs CTE.",
)
def dedup_canonical_by_centrality(spark, sf_dir):
    from .dedup import dedup_connected_components, dedup_minhash_lsh_pairs

    # ONE LSH candidate pass feeds both graph operators: without the
    # shared materialization, the closure and the PageRank each replay
    # the 8x-md5 shingle scan + banding + pair explosion — doubling
    # the dominant upstream cost of this composed query.
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).localCheckpoint()
    clusters = dedup_connected_components(spark, sf_dir, pairs=pairs)
    ranks = _pagerank_ranks(spark, sf_dir, pairs=pairs)
    joined = clusters.join(ranks, clusters.doc_id == ranks.node).select(
        "cluster_id", "doc_id", F.round("r", 6).alias("r6")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("cluster_id").orderBy(F.col("r6").desc(), "doc_id")
    ranked = joined.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("long")
            .alias("keeper_doc"),
            F.round(
                F.min(F.when(F.col("rn") == 1, F.col("r6"))), 6
            ).alias("keeper_rank"),
        )
        .orderBy("cluster_id")
    )
