"""Round-15 optimization harness: time individual declared queries
(min-of-k, same .count() action as bench.py) and capture
explain("formatted") plans, without paying for a full bench run.

Usage:
    python tools_optbench.py time <sf_dir> <k> <query> [query...]
    python tools_optbench.py explain <sf_dir> <outdir> <suffix> <query>...
    python tools_optbench.py noop <sf_dir> <k> <query> [query...]

`time` warms each plan once at sf0.001 (codegen) then runs k timed
.count() passes and prints min/median/max.  `noop` uses the noop sink
(guide §1.4) instead of .count() so column pruning can't hide work.
`explain` writes <outdir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from durablestreams_spark.analytics.core import all_queries  # noqa: E402
from durablestreams_spark.session import get_spark  # noqa: E402


def main() -> None:
    mode, sf_dir = sys.argv[1], sys.argv[2]
    spark = get_spark("optbench")
    specs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if mode == "explain":
        outdir, suffix, names = sys.argv[3], sys.argv[4], sys.argv[5:]
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = specs[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# wrote {path} ({len(plan)} bytes)")
        return

    k, names = int(sys.argv[3]), sys.argv[4:]
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    def run(name: str) -> int:
        df = specs[name].fn(spark, sf_dir)
        if mode == "noop":
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.count()

    for name in names:
        try:
            specs[name].fn(spark, warm_dir).count()  # codegen warm
        except Exception as e:  # noqa: BLE001
            print(f"# warm failed {name}: {e}")
        times = []
        n = -2
        for _ in range(k):
            spark.sparkContext.setJobDescription(f"optbench:{name}")
            t0 = time.perf_counter()
            n = run(name)
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(times):.3f} med={statistics.median(times):.3f}"
            f" max={max(times):.3f} rows={n} runs="
            f"{[round(t, 3) for t in times]}"
        )


if __name__ == "__main__":
    main()
