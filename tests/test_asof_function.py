"""Unit tests for the general as-of join operator
(durablestreams_spark.functions.asof.asof_join): direction, strictness,
tolerance, and by-key semantics vs hand-computed expectations, plus the
plan-shape guarantee (no join node, one exchange)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from durablestreams_spark.functions.asof import asof_join
from durablestreams_spark.plans import formatted_plan, shuffle_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "L1"),
            (1, _ts("2024-01-01 12:00:00"), "L2"),
            (2, _ts("2024-01-01 10:30:00"), "L3"),
            (3, _ts("2024-01-01 09:00:00"), "L4"),  # no right rows at all
        ],
        "k long, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "R1"),
            (1, _ts("2024-01-01 10:00:00"), "R2"),  # ties L1's ts exactly
            (1, _ts("2024-01-01 11:00:00"), "R3"),
            (2, _ts("2024-01-01 10:45:00"), "R4"),  # after L3 only
        ],
        "k long, ts timestamp, rval string",
    )
    return left, right


def _result(df):
    return {
        r["lval"]: r["rval_right"]
        for r in df.select("lval", "rval_right").collect()
    }


def test_backward_strict_and_ties(spark, frames):
    left, right = frames
    got = _result(asof_join(left, right, on="ts", by=["k"], tiebreak=["rval"]))
    # L1 at 10:00 strict: R2 (same instant) excluded -> R1
    assert got == {"L1": "R1", "L2": "R3", "L3": None, "L4": None}


def test_backward_nonstrict_includes_same_instant(spark, frames):
    left, right = frames
    got = _result(
        asof_join(left, right, on="ts", by=["k"], strict=False, tiebreak=["rval"])
    )
    assert got["L1"] == "R2"


def test_forward_strict(spark, frames):
    left, right = frames
    got = _result(
        asof_join(
            left, right, on="ts", by=["k"], direction="forward", tiebreak=["rval"]
        )
    )
    # L1 at 10:00 strict forward: R2 (same instant) excluded -> R3
    assert got == {"L1": "R3", "L2": None, "L3": "R4", "L4": None}


def test_tolerance_nulls_match_keeps_row(spark, frames):
    left, right = frames
    j = asof_join(
        left,
        right,
        on="ts",
        by=["k"],
        tolerance_us=30 * 60 * 1_000_000,
        tiebreak=["rval"],
    )
    got = _result(j)
    # L2's best match R3 is 1h stale -> nulled, row kept
    assert got == {"L1": None, "L2": None, "L3": None, "L4": None}
    assert j.count() == 4  # merge_asof semantics: every left row survives


def test_plan_has_no_join_single_exchange(spark, frames):
    left, right = frames
    j = asof_join(left, right, on="ts", by=["k"], tiebreak=["rval"])
    plan = formatted_plan(j)
    assert "Join" not in plan, plan
    assert shuffle_count(j) == 1, plan
    assert "Window" in plan


def test_forward_nonstrict_includes_same_instant(spark, frames):
    left, right = frames
    got = _result(
        asof_join(
            left,
            right,
            on="ts",
            by=["k"],
            direction="forward",
            strict=False,
            tiebreak=["rval"],
        )
    )
    assert got["L1"] == "R2"
