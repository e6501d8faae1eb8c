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
from .dedup import _PAIRS_SQL, dedup_minhash_lsh_pairs

#: Damping factor — the standard 0.85 from the original paper.
PR_DAMPING = 0.85
#: Fixed iteration count; near-dup neighborhoods are near-cliques with
#: tiny diameter, so ranks are effectively converged well before 5.
PR_ITERS = 5
#: Graded output size (total order: rounded rank desc, doc_id asc).
PR_TOPK = 100


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as a DuckDB CTE chain over the
    same LSH candidate pairs the Spark side computes."""
    d = PR_DAMPING
    parts = [
        f"""
    WITH pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn)
        """
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f""",
    c{i} AS (
        SELECT e.dst AS node, sum(r{i - 1}.r / deg.d) AS s
        FROM edges e
        JOIN r{i - 1} ON e.src = r{i - 1}.node
        JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT n.node, (1 - {d}) / nn.n + {d} * coalesce(c{i}.s, 0.0) AS r
        FROM nodes n CROSS JOIN nn LEFT JOIN c{i} ON c{i}.node = n.node
    )
            """
        )
    parts.append(
        f"""
    SELECT node AS doc_id, round(r, 6) AS pagerank
    FROM r{PR_ITERS}
    ORDER BY round(r, 6) DESC, node
    LIMIT {PR_TOPK}
        """
    )
    return "".join(parts)


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
        return spark.createDataFrame([], "doc_id long, pagerank double")
    base = (1.0 - PR_DAMPING) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("d")).alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(PR_DAMPING) * F.coalesce("s", F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.select(
            F.col("node").alias("doc_id"), F.round("r", 6).alias("pagerank")
        )
        .orderBy(F.col("pagerank").desc(), "doc_id")
        .limit(PR_TOPK)
    )
