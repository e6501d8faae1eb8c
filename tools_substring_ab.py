"""Same-corpus A/B for the substring-dedup shuffle key (r7 follow-up).

Round 6 rewrote `dedup_exact_substring`'s heavy aggregation to shuffle
a fixed-width 16-char md5-prefix key instead of the ~50-byte gram
strings, but the intended win was never isolated: round 7 measured the
new plan on a *different* (perturbed) corpus, confounding the A/B.
This tool runs BOTH key shapes on the SAME corpus back-to-back and
records wall time plus shuffle bytes written (from the Spark UI REST
API, summed over each run's new stages), settling whether the shuffle
payload was the bottleneck or the explode CPU is.

Usage: python tools_substring_ab.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 (if present)
Prints one JSON line per (sf_dir, shape) and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from durablestreams_spark.operators.dedup import (
    SUBSTR_NGRAM,
    _substring_gh,
    _substring_grams,
    _substring_tokens,
)

UI_PORT = 4099


def get_spark_with_ui():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("substring_ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def completed_stages(spark):
    """stageId -> shuffle bytes written, from the UI REST API."""
    app_id = spark.sparkContext.applicationId
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        data = json.load(r)
    return {
        (s["stageId"], s["attemptId"]): (
            s.get("shuffleWriteBytes", 0),
            s.get("shuffleReadBytes", 0),
        )
        for s in data
    }


def hash_key_plan(spark, sf_dir):
    """The shipped shape: shuffle key = substr(md5(gram), 1, 16)."""
    d = _substring_tokens(spark, sf_dir)
    return (
        _substring_grams(d, ["doc_id"])
        .select("doc_id", _substring_gh().alias("gh"))
        .repartition("gh")
        .groupBy("gh", "doc_id")
        .agg(F.count(F.lit(1)).alias("occ"))
        .groupBy("gh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("occ").cast("long").alias("n_occurrences"),
            F.min("doc_id").alias("rep_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), "gh")
        .limit(100)
    )


def string_key_plan(spark, sf_dir):
    """The pre-r6 shape: identical structure, shuffle key = the raw
    gram string (~8 tokens, ~50 bytes)."""
    d = _substring_tokens(spark, sf_dir)
    return (
        _substring_grams(d, ["doc_id"])
        .select("doc_id", "gram")
        .repartition("gram")
        .groupBy("gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("occ"))
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("occ").cast("long").alias("n_occurrences"),
            F.min("doc_id").alias("rep_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(
            F.col("n_docs").desc(),
            F.col("n_occurrences").desc(),
            F.substring(F.md5("gram"), 1, 16),
        )
        .limit(100)
    )


def run_one(spark, sf_dir, shape, plan_fn, reps=2):
    times = []
    bytes_written = bytes_read = None
    for _ in range(reps):
        before = completed_stages(spark)
        t0 = time.monotonic()
        n = plan_fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        after = completed_stages(spark)
        new = {k: v for k, v in after.items() if k not in before}
        bw = sum(v[0] for v in new.values())
        br = sum(v[1] for v in new.values())
        times.append(dt)
        # keep the metrics of the *last* rep (warm JIT)
        bytes_written, bytes_read = bw, br
    rec = {
        "sf_dir": sf_dir,
        "shape": shape,
        "rows": n,
        "sec_min": round(min(times), 2),
        "sec_all": [round(t, 2) for t in times],
        "shuffle_write_bytes": bytes_written,
        "shuffle_read_bytes": bytes_read,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    dirs = sys.argv[1:] or [
        p
        for p in ("/root/testdata/sf0.1", "/tmp/spark_graft_sf1")
        if os.path.exists(os.path.join(p, "documents.parquet"))
    ]
    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("WARN")
    out = []
    for d in dirs:
        # alternate shapes to equalize cache/JIT effects
        out.append(run_one(spark, d, "hash_key", hash_key_plan))
        out.append(run_one(spark, d, "string_key", string_key_plan))
    summary = {}
    for d in dirs:
        h = next(r for r in out if r["sf_dir"] == d and r["shape"] == "hash_key")
        s = next(
            r for r in out if r["sf_dir"] == d and r["shape"] == "string_key"
        )
        summary[d] = {
            "hash_sec": h["sec_min"],
            "string_sec": s["sec_min"],
            "hash_shuffle_mb": round(h["shuffle_write_bytes"] / 1e6, 1),
            "string_shuffle_mb": round(s["shuffle_write_bytes"] / 1e6, 1),
            "shuffle_ratio": round(
                s["shuffle_write_bytes"] / max(1, h["shuffle_write_bytes"]), 2
            ),
        }
    print(json.dumps({"summary": summary}, indent=2))


if __name__ == "__main__":
    main()
