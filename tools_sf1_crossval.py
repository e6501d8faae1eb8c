"""sf1 cross-validation for the queries whose DuckDB ORACLES are
infeasible at sf1 (the graded Spark plans are fine — it's the oracle
side that explodes):

- dedup_connected_components / _star: the recursive-CTE transitive
  closure over the 276k-edge sf1 LSH graph does not terminate in
  useful time in DuckDB.  Replacement evidence: the two INDEPENDENT
  Spark algorithms (min-label propagation vs large-star/small-star)
  must produce bit-identical label sets.
- dedup_embedding_cosine: the oracle is intentionally the EXACT
  all-pairs SQL (12.5M list_cosine pairs at sf1 — hours in DuckDB).
  Replacement: the graded banded-LSH plan vs an in-Spark all-pairs
  broadcast-NLJ reference (whole-stage codegen — seconds).  Checked
  as precision == 1.0 (every banded pair is a true pair, bit-equal
  cosine) and recall >= 0.99: LSH candidates are approximate BY
  DESIGN — 8 x 2-bit bands give theoretical recall ~0.987 at the
  fixture's unusually loose θ=0.4 (measured 0.9956 at sf1, 1.0 at
  sf0.01); at a production near-dup threshold θ>=0.8 the same bands
  give recall ~1-1e-5.
- dedup_ngram_jaccard: the shingle-verify SQL over 276k candidate
  pairs x 50k-doc shingle sets is DuckDB-infeasible.  Replacement: an
  independent Spark reformulation (per-doc shingle ARRAYS +
  array_intersect instead of explode + keyed joins), exact equality.

All four queries remain fully oracle-verified at sf0.001/sf0.01 in
the main mirror; this file documents the sf1-scale check.

Usage: python tools_sf1_crossval.py [sf1_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"


def main() -> None:
    from pyspark.sql import functions as F

    from durablestreams_spark.analytics.core import table
    from durablestreams_spark.operators import dedup as D
    from durablestreams_spark.session import get_spark

    spark = get_spark("sf1_crossval")
    out = {"note": (
        "Spark-vs-Spark cross-validation at ~sf1 for queries whose SQL "
        "oracles are infeasible at this scale (oracle-side cost, not "
        "plan-side); all four stay oracle-verified at sf0.001/sf0.01."
    ), "sf1_dir": SF1, "results": {}}

    # 1) connected components: two independent algorithms must agree.
    cc = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_connected_components(spark, SF1).collect()
    }
    star = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_connected_components_star(spark, SF1).collect()
    }
    out["results"]["connected_components_prop_vs_star"] = {
        "rows": len(cc),
        "match": cc == star,
    }

    # 2) embedding cosine: banded-LSH graded plan vs all-pairs reference.
    banded = {
        (r.vec_a, r.vec_b, r.cos)
        for r in D.dedup_embedding_cosine(spark, SF1).collect()
    }
    emb = table(spark, SF1, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    wn = emb.withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x))
    ).repartition(spark.sparkContext.defaultParallelism)
    a = wn.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    b = wn.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda s, x: s + x,
    )
    allpairs = {
        (r.vec_a, r.vec_b, r.cos)
        for r in a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= D.COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
        .collect()
    }
    precision = len(banded & allpairs) / len(banded) if banded else 0.0
    recall = len(banded & allpairs) / len(allpairs) if allpairs else 0.0
    out["results"]["embedding_cosine_banded_vs_allpairs"] = {
        "rows": len(banded),
        "allpairs_rows": len(allpairs),
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        # precision must be perfect (every emitted pair is a true pair
        # with the bit-identical cosine); recall is the documented LSH
        # knob — >= 0.99 at this fixture's loose θ=0.4.
        "match": precision == 1.0 and recall >= 0.99,
    }

    # 3) n-gram Jaccard: explode+join graded plan vs array_intersect
    #    reformulation over the same LSH candidates.
    jacc = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.dedup_ngram_jaccard(spark, SF1).collect()
    }
    pairs = D.dedup_minhash_lsh_pairs(spark, SF1)
    docs = table(spark, SF1, "documents")
    sh = docs.select(
        "doc_id", F.split("text", r"\s+").alias("w")
    ).where(F.size("w") >= 3).select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, size(w) - 3),"
                " i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))"
            )
        ).alias("shs"),
    )
    ref = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / (
                    F.size("sa") + F.size("sb")
                    - F.size(F.array_intersect("sa", "sb"))
                ).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    refset = {(r.doc_a, r.doc_b, r.jaccard) for r in ref.collect()}
    out["results"]["ngram_jaccard_join_vs_array_intersect"] = {
        "rows": len(jacc),
        "match": jacc == refset,
    }

    out["ok"] = all(r["match"] for r in out["results"].values())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
