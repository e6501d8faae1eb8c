"""durablestreams_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of danthegoodman1/DurableStreams
(durable append-only streams), plus the full relational / streaming /
LLM-data-pipeline operator surface of SURVEY.md §2, re-expressed
Spark-first (DataFrame/SQL + Catalyst + Structured Streaming).
"""

from .ingest import assign_offsets, produce_bulk
from .manifest import CommitConflict, FencingError, SegmentMeta, StreamState
from .partitioned import PartitionedStream
from .offsets import (
    BEGINNING,
    end_of_epoch,
    next_epoch,
    offset_for_time,
    parse_offset,
    serialize_offset,
)
from .stream import ProduceResult, Record, Stream, StreamCatalog

__all__ = [
    "BEGINNING",
    "CommitConflict",
    "FencingError",
    "PartitionedStream",
    "ProduceResult",
    "Record",
    "SegmentMeta",
    "Stream",
    "StreamCatalog",
    "StreamState",
    "assign_offsets",
    "end_of_epoch",
    "produce_bulk",
    "next_epoch",
    "offset_for_time",
    "parse_offset",
    "serialize_offset",
]
