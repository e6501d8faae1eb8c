"""Column-function library + NDJSON reference-format compatibility."""

import json

import pytest
from pyspark.sql import functions as F

from durablestreams_spark.functions import (
    infer_payload_schema,
    make_offset,
    offset_counter,
    offset_epoch,
    offset_ts,
    typed_view,
)
from durablestreams_spark.offsets import serialize_offset
from durablestreams_spark.sources import read_ndjson_segments, write_ndjson_segment


def test_offset_column_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [(1704067200123, 0), (1704067200123, 41), (2, 999)], "e long, c long"
    )
    out = (
        df.select(make_offset("e", "c").alias("o"), "e", "c")
        .select(
            "o",
            "e",
            "c",
            offset_epoch("o").alias("e2"),
            offset_counter("o").alias("c2"),
            offset_ts("o").alias("t"),
        )
        .collect()
    )
    for r in out:
        assert r.o == serialize_offset(r.e, r.c)
        assert (r.e2, r.c2) == (r.e, r.c)
        assert int(r.t.timestamp() * 1000) == r.e
    # lexicographic == numeric order
    offs = [r.o for r in out]
    assert sorted(offs) == [o for _, o in sorted((r.e, r.o) for r in out)]


def test_typed_view_and_inference(spark, catalog):
    s = catalog.stream("typed")
    s.produce([{"a": 1, "b": "x"}, {"a": 2, "b": "y", "extra": True}])
    df = s.to_df(spark)
    tv = typed_view(df, "a INT, b STRING, missing DOUBLE")
    rows = sorted(tv.collect(), key=lambda r: r.a)
    assert [r.b for r in rows] == ["x", "y"]
    assert all(r.missing is None for r in rows)  # schemaless tolerance
    assert "offset" in tv.columns and "ts" in tv.columns

    inferred = infer_payload_schema(spark, df)
    assert {f.name for f in inferred.fields} >= {"a", "b", "extra"}


def test_ndjson_reference_format_roundtrip(spark, tmp_path):
    """Write the reference's exact segment layout (32-char offset ++
    JSON ++ newline, 33 B framing), read it back through Spark."""
    recs = [
        (serialize_offset(1000, i), json.dumps({"value": f"msg-{i}"}))
        for i in range(5)
    ]
    path = str(tmp_path / "seg.ndjson")
    nbytes = write_ndjson_segment(recs, path)
    assert nbytes == sum(len(p) for _, p in recs) + 33 * len(recs)

    df = read_ndjson_segments(spark, path)
    rows = df.orderBy("offset").collect()
    assert [(r.offset, r.data) for r in rows] == recs
    assert all(int(r.ts.timestamp() * 1000) == 1000 for r in rows)
    # payload parses clean (offset prefix fully stripped)
    parsed = df.select(F.get_json_object("data", "$.value").alias("v")).collect()
    assert sorted(p.v for p in parsed) == [f"msg-{i}" for i in range(5)]
