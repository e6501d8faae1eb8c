"""Physical-plan audit helpers (SURVEY.md §4): make the scale claims
checkable — broadcast where expected, filters pushed to the scan,
columns pruned, no Python in JVM-only pipelines."""

from .audit import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    has_python_eval,
    pushed_filters,
    scan_read_columns,
    shuffle_count,
)
