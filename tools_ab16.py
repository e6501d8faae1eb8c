"""Round-16 interleaved A/B harness: time one declared query under
alternating environment-flag settings (the flags are read at
query-construction time, so both variants run in ONE Spark session —
same JVM, same box conditions, interleaved to cancel drift).

Usage:
    python tools_ab16.py <sf_dir> <k> <query> <ENVVAR> <valA> <valB>

Prints per-variant wall times (min/med) and the summed executor CPU
time of each timed run (from the status API), interleaved A B A B ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from durablestreams_spark.analytics.core import all_queries  # noqa: E402
from durablestreams_spark.session import get_spark  # noqa: E402



def _stage_cpu(spark) -> float:
    """Summed executor CPU (s) across all completed stages so far."""
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return 0.0
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9


def main() -> None:
    sf_dir, k, name, var = sys.argv[1:5]
    vals = sys.argv[5:7]
    k = int(k)
    spark = get_spark("ab16")
    specs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # codegen warm for both variants at the smallest SF
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for v in vals:
        os.environ[var] = v
        try:
            specs[name].fn(spark, warm_dir).count()
        except Exception as e:  # noqa: BLE001
            print(f"# warm failed {v}: {e}")

    wall: dict[str, list[float]] = {v: [] for v in vals}
    cpu: dict[str, list[float]] = {v: [] for v in vals}
    for i in range(k):
        for v in vals:
            os.environ[var] = v
            spark.sparkContext.setJobDescription(f"ab16:{name}:{var}={v}")
            c0 = _stage_cpu(spark)
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            wall[v].append(time.perf_counter() - t0)
            cpu[v].append(_stage_cpu(spark) - c0)
    for v in vals:
        w, c = wall[v], cpu[v]
        print(
            f"{name} {var}={v}: wall min={min(w):.3f}"
            f" med={statistics.median(w):.3f}"
            f" cpu med={statistics.median(c):.1f}"
            f" walls={[round(x, 2) for x in w]}"
            f" cpus={[round(x, 1) for x in c]} rows={n}"
        )


if __name__ == "__main__":
    main()
