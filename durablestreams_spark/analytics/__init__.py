"""Analytics surface: the full relational/streaming operator matrix of
SURVEY.md §2.2 expressed as (PySpark query, DuckDB oracle SQL) pairs.

Every entry here is registered into ``__spark_entry__.queries()`` /
``oracle_sql()`` via :mod:`durablestreams_spark.registry`.
"""
