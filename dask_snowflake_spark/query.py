"""Relational-layer façade (SURVEY.md §7 step 2): parameterized SQL,
table access, and canonical-result helpers.

Mirrors the reference's user surface: an arbitrary SQL string with
server-side parameter binding (core.py:143 `cur.execute(query,
execute_params)`; tests test_core.py:264-282) — here bound by Spark SQL
itself (`spark.sql(query, args=...)`, literal-safe, no string
interpolation), executed by Catalyst instead of the warehouse.

The canonicalization helpers encode the reference's comparison contract
(test_core.py:54-65: sort rows, reset index, `check_dtype=False`) for
engine-independent result equality.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from .session import load_table, register_tables


def sql(
    spark: SparkSession,
    query: str,
    params: Mapping[str, Any] | Sequence[Any] | None = None,
    *,
    sf_dir: str | None = None,
) -> DataFrame:
    """Run SQL with parameter binding against the registered catalog.

    ``params`` may be a mapping (named ``:name`` markers) or a sequence
    (positional ``?`` markers). With ``sf_dir`` given, the TESTDATA
    tables are registered as views first.
    """
    if sf_dir is not None:
        register_tables(spark, sf_dir)
    if params is None:
        return spark.sql(query)
    return spark.sql(query, args=dict(params) if isinstance(params, Mapping) else list(params))


def read_table(spark: SparkSession, name: str, *, sf_dir: str) -> DataFrame:
    """Load one TESTDATA table (ns-timestamp-safe parquet scan)."""
    return load_table(spark, sf_dir, name)


def canonicalize(df: DataFrame, *, round_digits: int | None = None) -> list[tuple]:
    """Order-insensitive canonical form of a result: columns sorted by
    name, rows sorted by value, floats optionally rounded — the
    dtype-tolerant sorted-compare contract of the reference tests."""
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        vals = []
        for v in r:
            if round_digits is not None and isinstance(v, float):
                v = round(v, round_digits)
            vals.append(v)
        rows.append(tuple(vals))
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return rows


def assert_results_equal(a: DataFrame, b: DataFrame, *, round_digits: int | None = 6) -> None:
    """Raise AssertionError unless two DataFrames hold the same rows
    under the canonical form (order- and partitioning-insensitive)."""
    ra, rb = canonicalize(a, round_digits=round_digits), canonicalize(b, round_digits=round_digits)
    if ra != rb:
        diff_a = [r for r in ra if r not in rb][:3]
        diff_b = [r for r in rb if r not in ra][:3]
        raise AssertionError(
            f"results differ: {len(ra)} vs {len(rb)} rows; only-left={diff_a} only-right={diff_b}"
        )
