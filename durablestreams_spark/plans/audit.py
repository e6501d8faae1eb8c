"""Inspect a DataFrame's physical plan for the properties that decide
100 TB behavior.

The reference has no optimizer to audit (SURVEY.md §4) — its physical
tricks (index pruning, limit pushdown, pre-parse predicates) are
hand-coded.  On Spark those come from Catalyst, *if* the plan is
declared well; these helpers turn "did Catalyst do it?" into test
assertions so regressions in partitioning/pushdown/broadcast fail CI
instead of surfacing as a 100× slowdown at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints), as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_python_eval(df: DataFrame) -> bool:
    """True if any row-at-a-time or Arrow Python evaluation appears —
    the slow path that must stay out of JVM-only pipelines."""
    plan = formatted_plan(df)
    return bool(re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists from scans, flattened."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan column lists from ReadSchema — the column-pruning
    audit: a scan reading columns the query never uses is a bug."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
        out.append(cols)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan — the scale currency.  Compare
    against the minimum the semantics require; every extra one is
    O(data) network at 100 TB."""
    plan = formatted_plan(df)
    # Count tree nodes ("Exchange (4)"), not their detail sections
    # ("(4) Exchange"), and exclude BroadcastExchange (not a shuffle).
    return len(re.findall(r"(?<![A-Za-z])Exchange \(\d+\)", plan))
