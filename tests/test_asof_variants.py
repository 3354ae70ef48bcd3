"""asof_join direction/tolerance contracts on a hand-checkable frame,
including the numeric-timestamp code path (x23 covers timestamps)."""

from __future__ import annotations

import pytest

from dask_snowflake_spark.operators.asof import asof_join


@pytest.fixture
def frames(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 25), ("a", 40), ("b", 5)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 30, 2.0), ("b", 50, 3.0)], "k string, ts long, v double"
    )
    return left, right


def _m(df):
    return {(r.k, r.ts): (r.ts_asof, r.v_asof) for r in df.collect()}


def test_backward_numeric(spark, frames):
    left, right = frames
    got = _m(asof_join(left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"]))
    assert got == {
        ("a", 10): (8, 1.0),
        ("a", 25): (8, 1.0),
        ("a", 40): (30, 2.0),
        ("b", 5): (None, None),
    }


def test_forward_numeric(spark, frames):
    left, right = frames
    got = _m(
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"],
            direction="forward",
        )
    )
    assert got == {
        ("a", 10): (30, 2.0),
        ("a", 25): (30, 2.0),
        ("a", 40): (None, None),
        ("b", 5): (50, 3.0),
    }


def test_tolerance_numeric(spark, frames):
    left, right = frames
    got = _m(
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v"],
            tolerance_seconds=5,
        )
    )
    # ("a", 25) is 17 past its backward match at ts=8 -> nulled; left row kept
    assert got == {
        ("a", 10): (8, 1.0),
        ("a", 25): (None, None),
        ("a", 40): (None, None),
        ("b", 5): (None, None),
    }


def test_bad_direction_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts", direction="nearest")
