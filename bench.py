"""Headline benchmark: runs representative queries from the graded
surface at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed to full materialization (count + a cheap checksum
collect of the aggregated result, never a full-result collect — the
driver must not become the bottleneck being measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from durablestreams_spark.analytics.core import all_queries  # noqa: E402
from durablestreams_spark.session import get_spark  # noqa: E402

# One per graded family: TPC-H-ish relational, top-k, window/event-time,
# as-of join, dedup (exact-hash + MinHash-LSH), similarity, text, log scan.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "topk_orders",
    "window_rank_top_orders_per_cust",
    "window_tumbling_daily",
    "join_asof_purchase_prior_click",
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "similarity_knn_brute",
    "text_quality",
    "log_consume_page",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    specs = all_queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
