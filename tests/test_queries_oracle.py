"""Driver-compare harness: run every registered query on Spark AND its
DuckDB oracle at sf0.001, then diff row counts and (column-name-sorted,
row-sorted) values — the same gate the driver applies at sf0.01
(SURVEY.md §5 item 4).
"""

import math

import duckdb
import pytest

from durablestreams_spark.analytics.core import all_queries, TABLES

SF_DIR = "/root/testdata/sf0.001"


def duck(sql: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        rel = con.sql(sql)
        return list(rel.columns), rel.fetchall()
    finally:
        con.close()


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            elif hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
                v = round(float(v), 9)  # Decimal
            vals.append((v is None, v))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


QUERIES = all_queries()


def test_events_table_reads_without_session_factory(spark):
    """Regression: the external grading harness uses a vanilla
    SparkSession (no session.py factory), where events.parquet's
    TIMESTAMP(NANOS) column threw PARQUET_TYPE_ILLEGAL.  table() must
    self-configure nanosAsLong at runtime."""
    from durablestreams_spark.analytics.core import table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = table(spark, SF_DIR, "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    # A 0-row result makes the value-hash comparison vacuous (round 1
    # shipped two such free passes) — every graded query must return
    # data on the fixture.
    assert len(srows) > 0, f"{name}: empty result — the oracle check proves nothing"

    if spec.oracle is None:
        return  # rows-only check (driver's weak path)

    dcols, drows = duck(spec.oracle)

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    s_norm = normalize(srows, scols)
    d_norm = normalize(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} differing rows; first 3: {mismatches[:3]}"
    )
