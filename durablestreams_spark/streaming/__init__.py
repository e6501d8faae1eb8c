"""Structured Streaming surface: micro-batch group-commit ingest,
tail-follow, watermarked windows, and custom stateful operators
(SURVEY.md §2.1 #5/#11 and §2.2 streaming rows)."""

from .ingest import start_ingest  # noqa: F401
from .stateful import running_user_stats  # noqa: F401
from .tail import tail_query  # noqa: F401
