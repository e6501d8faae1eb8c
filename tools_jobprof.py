"""Round-16 job-timeline profiler: run one declared query and dump
the driver's job timeline — per-job duration, the positive gaps
between consecutive jobs (micro-batch planning/commit latency), and
per-stage executor CPU for the heaviest stages.

Usage:  SPARK_GRAFT_UI=1 python tools_jobprof.py <sf_dir> <query>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from durablestreams_spark.analytics.core import all_queries  # noqa: E402
from durablestreams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    spark = get_spark("jobprof")
    specs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    spark.sparkContext.setJobDescription(f"jobprof:{name}")
    t0 = time.perf_counter()
    n = specs[name].fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
            return json.load(r)

    jobs = sorted(get("jobs"), key=lambda j: j["submissionTime"])
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    total_job = 0.0
    gaps = 0.0
    prev_end = None
    rows = []
    for j in jobs:
        st, en = ts(j["submissionTime"]), ts(j.get("completionTime", j["submissionTime"]))
        dur = en - st
        total_job += dur
        gap = 0.0
        if prev_end is not None and st > prev_end:
            gap = st - prev_end
            gaps += gap
        prev_end = max(prev_end or en, en)
        rows.append((j["jobId"], round(dur, 3), round(gap, 3), j.get("description", "")[:60]))
    print(f"# {name}: wall={wall:.2f}s rows={n} jobs={len(jobs)} "
          f"summed_job={total_job:.2f}s inter_job_gaps={gaps:.2f}s")
    for r in rows[-80:]:
        print(f"job {r[0]:>5} dur={r[1]:>8.3f} gap_before={r[2]:>7.3f}  {r[3]}")
    stages = sorted(
        get("stages?status=complete"),
        key=lambda s: -s.get("executorCpuTime", 0),
    )[:15]
    print("# top stages by executor CPU:")
    for s in stages:
        print(
            f"stage {s['stageId']:>5} cpu={s['executorCpuTime']/1e9:>8.2f}s "
            f"run={s.get('executorRunTime',0)/1e3:>8.2f}s "
            f"tasks={s.get('numCompleteTasks')} {s.get('name','')[:70]}"
        )


if __name__ == "__main__":
    main()
