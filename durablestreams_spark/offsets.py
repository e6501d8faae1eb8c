"""Offset codec — 32-char lexicographically ordered offsets.

Semantics mirror the reference's offset scheme (reference:
``src/stream_manager.ts:76-85``): an offset is a 16-digit zero-padded
epoch-milliseconds ("epoch") concatenated with a 16-digit zero-padded
per-flush counter.  Lexicographic order over the 32-char string is
identical to ``(epoch, counter)`` numeric order, so offsets double as a
point-in-time index ("now-30d" maps to a synthetic offset with
counter 0).

The reference stores the counter as a JS number and notes the
MAX_SAFE_INTEGER hazard (``src/stream_manager.ts:83``); here both halves
are Python ints / Spark LongType, which comfortably cover 16 decimal
digits.
"""

from __future__ import annotations

EPOCH_DIGITS = 16
COUNTER_DIGITS = 16
OFFSET_WIDTH = EPOCH_DIGITS + COUNTER_DIGITS

#: Sentinel meaning "the beginning of the stream" (exclusive-start scan
#: from before the first record), reference ``src/stream_manager.ts:341``.
BEGINNING = "-"

_MAX_EPOCH = 10**EPOCH_DIGITS - 1
_MAX_COUNTER = 10**COUNTER_DIGITS - 1

#: Largest possible counter suffix — used to build "end of epoch" probe
#: offsets (the reference's long-poll "poke" reads from
#: ``serializeOffset(epoch - 1, "9".repeat(16))``,
#: ``src/stream_manager.ts:458``).
MAX_COUNTER_SUFFIX = "9" * COUNTER_DIGITS


def serialize_offset(epoch_ms: int, counter: int) -> str:
    """Encode ``(epoch_ms, counter)`` as a 32-char sortable string."""
    if not (0 <= epoch_ms <= _MAX_EPOCH):
        raise ValueError(f"epoch_ms out of range: {epoch_ms}")
    if not (0 <= counter <= _MAX_COUNTER):
        raise ValueError(f"counter out of range: {counter}")
    return f"{epoch_ms:0{EPOCH_DIGITS}d}{counter:0{COUNTER_DIGITS}d}"


def parse_offset(offset: str) -> tuple[int, int]:
    """Decode a 32-char offset back to ``(epoch_ms, counter)``."""
    if len(offset) != OFFSET_WIDTH or not offset.isdigit():
        raise ValueError(f"malformed offset: {offset!r}")
    return int(offset[:EPOCH_DIGITS]), int(offset[EPOCH_DIGITS:])


def offset_for_time(epoch_ms: int) -> str:
    """Synthetic offset for a point in time (counter = 0).

    Scanning exclusive-from ``offset_for_time(t) - 1 counter`` returns
    everything at or after ``t``; scanning exclusive-from
    ``end_of_epoch(t)`` returns everything strictly after epoch ``t``.
    """
    return serialize_offset(epoch_ms, 0)


def end_of_epoch(epoch_ms: int) -> str:
    """Offset sorting after every record flushed at ``epoch_ms``."""
    return f"{epoch_ms:0{EPOCH_DIGITS}d}{MAX_COUNTER_SUFFIX}"


def next_epoch(last_epoch_ms: int, wallclock_ms: int) -> int:
    """Monotonic hybrid-clock epoch for the next flush.

    Mirrors the reference's clock-regression guard
    (``src/stream_manager.ts:407-411``): the new epoch is the wall clock
    unless the wall clock is not strictly greater than the last used
    epoch, in which case ``last + 1``.
    """
    return wallclock_ms if wallclock_ms > last_epoch_ms else last_epoch_ms + 1


def is_offset(s: str) -> bool:
    return len(s) == OFFSET_WIDTH and s.isdigit()
