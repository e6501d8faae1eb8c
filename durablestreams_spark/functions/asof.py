"""General as-of join (event-time point lookup) as a reusable library
operator.

Spark has no native batch as-of join (pandas has ``merge_asof``; DuckDB
has ``ASOF JOIN``; kdb+ calls it ``aj``).  The classic emulation —
equi-join on the by-keys + inequality filter + row_number —
materializes every left×earlier-right pair per key: O(n·m) per key,
a blowup on skewed keys.  This implementation is the single-pass
union+window plan (the same shape as
``analytics/relational.py:join_asof``, generalized): both sides are
unioned into one (by, on)-sorted stream, and the nearest right-side
row is carried to each left row with ``last(..., ignorenulls)`` over
an unbounded-preceding window (backward) or ``first(...)`` over an
unbounded-following window (forward).  O(n + m) per key, exactly one
hash exchange (the window partitioning), no join node at all — the
plan survives 100 TB and skewed keys because nothing is ever paired.

Reference parity: the reference engine has no relational operators at
all (it is a durable log, ``src/stream_manager.ts``); as-of lookup is
the canonical "enrich events with the latest earlier state" query its
consumers build by hand.  Semantics follow pandas ``merge_asof``:
every left row survives; the matched right columns are null when no
candidate exists (or the candidate misses the tolerance window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    strict: bool = True,
    suffix: str = "_right",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """As-of join ``left`` with ``right`` on event-time column ``on``,
    optionally per ``by`` keys.

    direction='backward': match the LATEST right row with
    ``r.on < l.on`` (``<=`` when ``strict=False``);
    direction='forward': match the EARLIEST right row with
    ``r.on > l.on`` (``>=`` when ``strict=False``).
    ``tolerance_us`` (microseconds) nulls the match when the event-time
    gap exceeds it — rows are kept, like pandas ``merge_asof``.

    Right-side value columns (everything except ``on``/``by``) come
    back suffixed, plus ``<on><suffix>`` with the matched timestamp.
    ``tiebreak`` names right-side columns that order rows sharing the
    same ``on`` value (backward picks the LAST in that order, forward
    the FIRST); without it, equal-timestamp right rows resolve
    nondeterministically — pass one whenever the right side can carry
    duplicate timestamps per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by = list(by or [])
    val_cols = [c for c in right.columns if c != on and c not in by]

    # union both sides into one stream; kind orders left rows before
    # (backward) / after (forward) right rows at equal timestamps so a
    # strict inequality falls out of the sort order, with no filter.
    # kind also marks which rows are emitted.
    left_kind, right_kind = (0, 1) if direction == "backward" else (1, 0)
    if not strict:
        left_kind, right_kind = right_kind, left_kind
    from pyspark.sql import types as T

    l_struct = T.StructType(
        [left.schema[c] for c in left.columns]
    )
    r_struct = T.StructType(
        [right.schema[c] for c in [on, *val_cols]]
    )
    l_tagged = left.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(left_kind).alias("__kind"),
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(r_struct).alias("__rrow"),
    )
    r_tagged = right.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(right_kind).alias("__kind"),
        F.lit(False).alias("__is_left"),
        F.lit(None).cast(l_struct).alias("__lrow"),
        F.struct(F.col(on), *[F.col(c) for c in val_cols]).alias("__rrow"),
    )
    merged = l_tagged.unionByName(r_tagged)

    # tiebreak columns only discriminate among right rows sharing
    # (__on, __kind); left rows carry nulls there, and the two sides
    # never share a __kind value, so left ordering is unaffected.
    tb = [F.col("__rrow")[c] for c in (tiebreak or [])]
    if direction == "backward":
        w = (
            W.partitionBy(*by)
            .orderBy("__on", "__kind", *tb)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = F.last("__rrow", ignorenulls=True).over(w)
    else:
        w = (
            W.partitionBy(*by)
            .orderBy("__on", "__kind", *tb)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        carried = F.first("__rrow", ignorenulls=True).over(w)

    out = merged.withColumn("__match", carried).where(F.col("__is_left"))
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("__on")) - F.unix_micros(F.col("__match")[on])
        )
        out = out.withColumn(
            "__match",
            F.when(gap <= F.lit(int(tolerance_us)), F.col("__match")),
        )
    cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    cols.append(F.col("__match")[on].alias(f"{on}{suffix}"))
    cols += [F.col("__match")[c].alias(f"{c}{suffix}") for c in val_cols]
    return out.select(*cols)
