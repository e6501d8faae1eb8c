"""Reference-format NDJSON segment reader/writer.

The reference's segment layout is one record per line: 32-char offset
immediately followed by the JSON payload and ``\\n`` — 33 bytes fixed
framing overhead per record (``src/stream_manager.ts:484-495,393-399``;
read-side slicing at ``:356-357``).  This module reads that exact
format into the engine's (offset, ts, data) shape — so data written by
the reference can be queried (or migrated into parquet segments)
without a custom converter — and writes it back for round-trips.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import offsets as _codec
from ..functions.offsets import offset_ts

OFFSET_WIDTH = 32


def read_ndjson_segments(spark, path: str) -> DataFrame:
    """Read reference NDJSON segment file(s) → (offset, ts, data).

    ``spark.read.text`` gives the line framing (the reference's
    ``readLines`` generator, ``src/segment.ts:19-44``); the offset is
    the fixed 32-char prefix, the payload the rest — both pure
    substring expressions, evaluated before any JSON parse, exactly
    like the reference's pre-parse offset predicate
    (``src/stream_manager.ts:356-362``).
    """
    lines = spark.read.text(path)
    return lines.where(F.length("value") > OFFSET_WIDTH).select(
        F.substring("value", 1, OFFSET_WIDTH).alias("offset"),
        offset_ts(F.substring("value", 1, OFFSET_WIDTH)).alias("ts"),
        F.substring("value", OFFSET_WIDTH + 1, 2**31 - 1).alias("data"),
    )


def write_ndjson_segment(records: list[tuple[str, str]], path: str) -> int:
    """Write (offset, json_payload) pairs in the reference's layout;
    returns bytes written (Σ payload + 33/record, the reference's own
    accounting at ``src/stream_manager.ts:393-399``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    total = 0
    with open(path, "wb") as f:
        for offset, payload in records:
            if len(offset) != OFFSET_WIDTH:
                raise ValueError(f"offset must be {OFFSET_WIDTH} chars: {offset!r}")
            _codec.parse_offset(offset)  # validate
            line = offset.encode() + payload.encode() + b"\n"
            f.write(line)
            total += len(line)
    return total
