"""Stream → SQL catalog registration (SURVEY.md §7 M3: "register
streams as SQL tables; typed views via from_json").

A stream registered here is queryable with ``spark.sql`` like any
table: the raw view exposes (offset, ts, data), the typed view
projects the JSON payload through a schema.  Views are temp views over
the manifest-pruned file list — re-register (or call with
``refresh=True``) to pick up segments committed after registration;
at scale this becomes a metastore-backed external table whose file
listing is served by the manifest, which is exactly how Delta/Iceberg
integrate with engines.
"""

from __future__ import annotations

from pyspark.sql.types import StructType

from ..functions.payload import typed_view
from ..stream import Stream


def register_stream(
    spark,
    stream: Stream,
    view_name: str | None = None,
    payload_schema: StructType | str | None = None,
):
    """Expose ``stream`` as SQL views: ``<name>`` (raw) and — when a
    payload schema is given — ``<name>_typed``.  Returns the raw DF."""
    name = view_name or stream.name
    if not name.isidentifier():
        raise ValueError(f"view name must be a SQL identifier: {name!r}")
    df = stream.to_df(spark)
    df.createOrReplaceTempView(name)
    if payload_schema is not None:
        typed_view(df, payload_schema).createOrReplaceTempView(f"{name}_typed")
    return df


def register_all(spark, catalog, payload_schemas: dict | None = None) -> list[str]:
    """Register every stream in a StreamCatalog; ``payload_schemas``
    maps stream name → schema for the typed views."""
    schemas = payload_schemas or {}
    names = []
    for name in catalog.list_streams():
        register_stream(
            spark, catalog.stream(name), name.replace("-", "_"), schemas.get(name)
        )
        names.append(name)
    return names
