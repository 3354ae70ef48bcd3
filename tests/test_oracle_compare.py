"""Unit tests for the compare layer itself (tests/oracle.py) — the
round-9 harness audit target: a bug HERE greens every query falsely,
so the canonicalization semantics get their own pins, engine-free
(synthetic rows/frames, no Spark session needed).
"""

from __future__ import annotations

import datetime as dt
import decimal

import pandas as pd

from .oracle import _canon_pd_cell, _canon_value, canonical_rows


# --- exact mode (collect/fetchall shape) ----------------------------------


def test_exact_bool_is_not_int():
    """python True == 1 must NOT make a bool column pass against an int
    column — the driver's string hash ('True' vs '1') rejects it."""
    assert _canon_value(True) != _canon_value(1)
    assert _canon_value(False) != _canon_value(0)
    assert _canon_value(True) == _canon_value(True)


def test_exact_decimal_scale_is_significant():
    """Decimal('123.40') == Decimal('123.4') numerically, but scale is
    part of what per-engine canonicalization hashes."""
    assert _canon_value(decimal.Decimal("123.40")) != _canon_value(
        decimal.Decimal("123.4")
    )
    assert _canon_value(decimal.Decimal("123.40")) == _canon_value(
        decimal.Decimal("123.40")
    )
    # and a Decimal never silently equals the float of the same value
    assert _canon_value(decimal.Decimal("1.5")) != _canon_value(1.5)


def test_exact_float_repr_distinguishes_signed_zero_and_nan():
    assert _canon_value(0.0) != _canon_value(-0.0)
    assert _canon_value(float("nan")) == _canon_value(float("nan"))
    assert _canon_value(float("inf")) == "inf"


def test_exact_int_vs_str_not_equal():
    assert _canon_value(5) != _canon_value("5")


def test_exact_datetime_and_date_distinct():
    d = dt.date(2024, 1, 2)
    ts = dt.datetime(2024, 1, 2)
    assert _canon_value(d) != _canon_value(ts)  # exact mode keeps them apart


def test_exact_nested_containers():
    assert _canon_value([1, [2.5, None]]) == (1, ("2.5", None))
    assert _canon_value({"b": 1, "a": True}) == (("a", "bool:True"), ("b", 1))


def test_canonical_rows_sorts_columns_and_rows_together():
    """Column reorder must permute every row's values identically, and
    row sort must be value-based so engine output order is irrelevant."""
    cols, rows = canonical_rows(["b", "a"], [(2, "y"), (1, "x")])
    assert cols == ["a", "b"]
    assert rows == [("x", 1), ("y", 2)]


def test_canonical_rows_nulls_sort_last_consistently():
    _, rows = canonical_rows(["a"], [(None,), (1,), (2,)])
    assert rows == [(1,), (2,), (None,)]


# --- arrow mode (driver's pandas round-trip shape) -------------------------


def test_arrow_bool_int_distinct():
    assert _canon_pd_cell(True) == "True"
    assert _canon_pd_cell(1) == "1"


def test_arrow_decimal_is_flagged_distinct_from_float():
    """DuckDB .df() lowers DECIMAL to float64 while Spark toPandas keeps
    Decimal — the arrow compare must render them differently so a raw
    DECIMAL driver-facing column surfaces as a mismatch."""
    assert _canon_pd_cell(decimal.Decimal("123.4")) == "DECIMAL:123.4"
    assert _canon_pd_cell(123.4) == "123.4"
    assert _canon_pd_cell(decimal.Decimal("123.4")) != _canon_pd_cell(123.4)


def test_arrow_date_widens_to_midnight_instant():
    """pandas has no date dtype: DuckDB widens DATE to midnight
    datetime64 while Spark keeps datetime.date — both must canonicalize
    to the same instant (driver-hash-proven tolerance, q18/x05)."""
    d = dt.date(2024, 1, 2)
    ts = pd.Timestamp("2024-01-02 00:00:00")
    assert _canon_pd_cell(d) == _canon_pd_cell(ts)
    # but a real time-of-day difference still fails
    assert _canon_pd_cell(d) != _canon_pd_cell(pd.Timestamp("2024-01-02 01:00:00"))


def test_arrow_nat_and_none_and_nan_all_null():
    assert _canon_pd_cell(None) == "NULL"
    assert _canon_pd_cell(float("nan")) == "NULL"
    assert _canon_pd_cell(pd.NaT) == "NULL"
    assert _canon_pd_cell(pd.NA) == "NULL"


def test_arrow_tzaware_timestamp_normalized():
    aware = pd.Timestamp("2024-01-02 03:04:05", tz="UTC")
    naive = pd.Timestamp("2024-01-02 03:04:05")
    assert _canon_pd_cell(aware) == _canon_pd_cell(naive)


def test_arrow_numpy_scalars_match_python():
    import numpy as np

    assert _canon_pd_cell(np.int64(7)) == _canon_pd_cell(7)
    assert _canon_pd_cell(np.float64(2.5)) == _canon_pd_cell(2.5)
    assert _canon_pd_cell(np.bool_(True)) == _canon_pd_cell(True)
    assert _canon_pd_cell(np.array([1, 2])) == _canon_pd_cell([1, 2])
