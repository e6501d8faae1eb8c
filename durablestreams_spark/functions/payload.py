"""Typed access to the schemaless ``data`` payload column.

The engine stores payloads as raw JSON strings (the reference's
``data: any``, ``src/stream_manager.ts:56-59``); queries opt into
structure per-read via ``from_json`` — schema-on-read, heterogenous
records stay legal (SURVEY.md §1.2-1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def typed_view(df: DataFrame, schema: StructType | str, keep: tuple = ("offset", "ts")) -> DataFrame:
    """Project the JSON payload into typed top-level columns.

    ``schema`` may be a StructType or a DDL string ("a INT, b STRING").
    Fields missing from a record come back NULL (schemaless tolerance);
    ``keep`` preserves engine columns alongside.
    """
    parsed = df.withColumn("__p", F.from_json("data", schema))
    cols = [F.col(k) for k in keep if k in df.columns]
    return parsed.select(*cols, "__p.*")


def infer_payload_schema(spark, df: DataFrame, sample: int = 1000) -> StructType:
    """Infer a payload schema from a sample of records (read-time
    sampling per SURVEY.md §1.3 — the dynamic-schema affordance).
    Inference cost is bounded by ``sample``; pin the result in code for
    production reads so plans stay stable.  The bounded sample is
    collected and re-distributed rather than hopping through
    ``df.rdd`` (a driver-side physical-plan conversion); Spark's own
    JSON schema inference then merges types across the sample."""
    strings = [r.data for r in df.select("data").limit(sample).collect()]
    return spark.read.json(
        spark.sparkContext.parallelize(strings or ["{}"], 2)
    ).schema
