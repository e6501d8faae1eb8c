"""Stream → SQL registration: raw and typed views, full SQL surface
over the durable log."""

from durablestreams_spark.analytics.catalog import register_all, register_stream


def test_register_stream_raw_and_typed(spark, catalog):
    s = catalog.stream("metrics")
    s.produce([{"host": "a", "cpu": 10}, {"host": "b", "cpu": 90}])
    s.produce([{"host": "a", "cpu": 30}])

    register_stream(spark, s, payload_schema="host STRING, cpu INT")

    raw = spark.sql("SELECT count(*) AS n FROM metrics").collect()[0]
    assert raw.n == 3
    rows = spark.sql(
        """
        SELECT host, avg(cpu) AS avg_cpu, count(*) AS n
        FROM metrics_typed GROUP BY host ORDER BY host
        """
    ).collect()
    assert [(r.host, r.avg_cpu, r.n) for r in rows] == [("a", 20.0, 2), ("b", 90.0, 1)]

    # offsets are queryable alongside the typed payload
    first = spark.sql(
        "SELECT host FROM metrics_typed ORDER BY offset LIMIT 1"
    ).collect()[0]
    assert first.host == "a"


def test_register_all_streams(spark, catalog):
    catalog.stream("s1").produce([{"x": 1}])
    catalog.stream("s2").produce([{"x": 2}, {"x": 3}])
    names = register_all(spark, catalog, {"s2": "x INT"})
    assert sorted(names) == ["s1", "s2"]
    assert spark.sql("SELECT count(*) AS n FROM s1").collect()[0].n == 1
    assert spark.sql("SELECT sum(x) AS s FROM s2_typed").collect()[0].s == 5
