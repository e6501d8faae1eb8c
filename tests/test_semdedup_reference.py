"""Pure-Python triangulation of dedup_semantic_clusters: recompute the
SemDeDup decision (cluster via the engine's own assignment, then
min-id-wins cosine dedup within clusters) with numpy over the raw
parquet, and require the per-cluster economics to match exactly.
Complements the DuckDB oracle with an implementation that shares NO
SQL/Spark machinery."""

import math

import numpy as np
import pyarrow.parquet as pq

from durablestreams_spark.analytics.core import all_queries
from durablestreams_spark.operators.similarity import (
    IVF_KMEANS_ITERS,
    SEMDEDUP_COS,
    _ivf_ranked,
)

SF_DIR = "/root/testdata/sf0.001"


def test_semdedup_matches_numpy_brute_force(spark):
    # Engine-side cluster assignment (cr == 1): reuse it verbatim —
    # centroid parity with the oracle/Python reference is already
    # pinned by the IVF tests; THIS test targets the dedup decision.
    cells = (
        _ivf_ranked(spark, SF_DIR)
        .where("cr = 1")
        .select("vec_id", "cent_id")
        .collect()
    )
    cluster = {r["vec_id"]: r["cent_id"] for r in cells}

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    embs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    by_id = dict(zip(ids, embs))

    # Brute-force SemDeDup in numpy: within each cluster, a vector is
    # dropped iff a SMALLER-id member has cosine >= threshold.
    from collections import defaultdict

    members = defaultdict(list)
    for vid, cid in cluster.items():
        members[cid].append(vid)
    expected = {}
    for cid, vids in members.items():
        vids = sorted(vids)
        dropped = set()
        for j, b in enumerate(vids):
            vb = by_id[b]
            nb = math.sqrt(float(vb @ vb))
            for a in vids[:j]:
                va = by_id[a]
                na = math.sqrt(float(va @ va))
                if float(va @ vb) / (na * nb) >= SEMDEDUP_COS:
                    dropped.add(b)
                    break
        expected[cid] = (len(vids), len(dropped))

    got = {
        r["cluster_id"]: (r["n_vecs"], r["n_dropped"])
        for r in all_queries()["dedup_semantic_clusters"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expected
    # the fixture must exercise both branches of the decision
    assert sum(d for _, d in expected.values()) > 0
    assert any(d < n for n, d in expected.values())
    assert IVF_KMEANS_ITERS >= 1  # guard: assignment is the learned one
