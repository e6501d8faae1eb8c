"""Sources/sinks beyond the native parquet segments: reference-format
NDJSON segment compatibility (ingest parity, SURVEY.md §1.3)."""

from .ndjson import read_ndjson_segments, write_ndjson_segment  # noqa: F401
