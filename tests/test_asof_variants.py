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


def test_asof_rejects_mixed_timestamp_types(spark):
    """NTZ vs LTZ must raise, not silently coerce through the session
    timezone inside the union (r4+ parquet fixtures read NTZ while the
    streaming path emits LTZ)."""
    import pytest

    left = spark.sql(
        "SELECT 1 AS k, cast('2024-01-01 00:00:00' AS timestamp_ntz) AS ts"
    )
    right = spark.sql(
        "SELECT 1 AS k, cast('2024-01-01 00:00:00' AS timestamp) AS ts, 1.0 AS v"
    )
    with pytest.raises(TypeError, match="SAME type"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts")


def test_asof_right_cols_may_name_right_ts(spark):
    """Listing right_ts in right_cols must not build a duplicate-field
    struct (ambiguous-reference error); ts_asof is appended exactly
    once either way."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 8, 1.5)], "k int, ts int, v double")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["v", "ts"]
    )
    assert out.columns == ["k", "ts", "v_asof", "ts_asof"]
    assert out.collect()[0].ts_asof == 8


def test_asof_null_keys_match_nothing(spark):
    """Equi-join key semantics: a NULL-key left row is kept with a NULL
    match; NULL-key right rows match nothing (the window formulation
    would otherwise pair them with each other)."""
    left = spark.createDataFrame([(None, 10), (1, 10)], "k int, ts int")
    right = spark.createDataFrame([(None, 8, 9.9), (1, 8, 1.5)], "k int, ts int, v double")
    rows = {r.k: r.v_asof for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts").collect()}
    assert rows == {None: None, 1: 1.5}


def test_asof_null_ts_right_rows_match_nothing(spark):
    """A NULL-timestamp right row is unmatchable (merge_asof/DuckDB ASOF
    never emit it). In the backward window it sorts NULLS FIRST, so
    without the right_ts filter its non-null struct would be carried as
    the 'latest' match for left rows preceding any real right row."""
    left = spark.createDataFrame([(1, 5), (1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 8, 1.5)], "k int, ts int, v double"
    )
    got = {
        r.ts: (r.v_asof, r.ts_asof)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts"
        ).collect()
    }
    # ts=5 precedes every real right row: NULL match, never the NULL-ts row
    assert got == {5: (None, None), 10: (1.5, 8)}


def test_asof_forward_descending_frame_matches_naive(spark):
    """The O(n) descending-frame forward formulation == naive python
    forward as-of (smallest right_ts >= left_ts, ties included,
    tolerance nulls applied) on a dense fixture."""
    lrows = [(k, t) for k in (1, 2) for t in range(0, 40, 3)]
    rrows = [(k, t, float(k * 100 + t)) for k in (1, 2) for t in range(0, 40, 5)]
    left = spark.createDataFrame(lrows, "k int, ts int")
    right = spark.createDataFrame(rrows, "k int, ts int, v double")
    got = {
        (r.k, r.ts): (r.v_asof, r.ts_asof)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            direction="forward", tolerance_seconds=4,
        ).collect()
    }
    for k, t in lrows:
        cand = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt >= t]
        want = (None, None)
        if cand:
            rt, v = min(cand)
            if rt - t <= 4:
                want = (v, rt)
        assert got[(k, t)] == want, (k, t)
