"""Column-level function library: offset codec expressions and typed
views over the schemaless JSON payload."""

from .offsets import (  # noqa: F401
    make_offset,
    offset_counter,
    offset_epoch,
    offset_ts,
)
from .payload import infer_payload_schema, typed_view  # noqa: F401
