"""Every registered query with an oracle must match DuckDB exactly at
sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from dask_snowflake_spark.queries import registry

from .oracle import compare, duckdb_con


def _names():
    return sorted(registry().keys())


@pytest.fixture(scope="module")
def oracle_db(sf_oracle):
    con = duckdb_con(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, sf_oracle, oracle_db):
    qd = registry()[name]
    df = qd.spark_fn(spark, sf_oracle)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare(name, df, qd.oracle, oracle_db)
    assert not problems, "\n".join(problems)
