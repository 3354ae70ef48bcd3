"""Relational façade tests: parameterized SQL (the reference's A8
contract on the Catalyst layer), canonical comparison helpers."""

from __future__ import annotations

import pytest

from dask_snowflake_spark import query as Q


def test_sql_named_params(spark, sf_oracle):
    df = Q.sql(
        spark,
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey = :k",
        {"k": 3},
        sf_dir=sf_oracle,
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].c_custkey == 3


def test_sql_positional_params(spark, sf_oracle):
    df = Q.sql(
        spark,
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > ? AND o_orderstatus = ?",
        [300000.0, "O"],
        sf_dir=sf_oracle,
    )
    n = df.collect()[0].n
    assert n > 0


def test_sql_param_binding_is_literal_safe(spark, sf_oracle):
    """A hostile string parameter must bind as a literal, not splice
    into the query (the injection contract of server-side binding)."""
    df = Q.sql(
        spark,
        "SELECT count(*) AS n FROM customer WHERE c_name = :name",
        {"name": "x' OR '1'='1"},
        sf_dir=sf_oracle,
    )
    assert df.collect()[0].n == 0


def test_canonicalize_order_insensitive(spark, sf_oracle):
    a = Q.sql(spark, "SELECT * FROM nation ORDER BY n_nationkey", sf_dir=sf_oracle)
    b = Q.sql(spark, "SELECT * FROM nation ORDER BY n_name DESC", sf_dir=sf_oracle)
    Q.assert_results_equal(a, b)


def test_assert_results_equal_detects_difference(spark, sf_oracle):
    a = Q.sql(spark, "SELECT n_nationkey FROM nation", sf_dir=sf_oracle)
    b = Q.sql(spark, "SELECT n_nationkey FROM nation WHERE n_nationkey <> 3", sf_dir=sf_oracle)
    with pytest.raises(AssertionError, match="results differ"):
        Q.assert_results_equal(a, b)
