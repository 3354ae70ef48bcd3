"""Local replica of the driver's DuckDB-oracle comparison.

For every registered query: run the Spark DataFrame, run the oracle SQL
in DuckDB over the same parquet tables, canonicalize both (columns
sorted by name, rows sorted by all columns) and compare EXACTLY. If this
passes, any order-insensitive value-hash the driver computes matches.
"""

from __future__ import annotations

import datetime as dt

import os
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        # repr-compare: catches -0.0-vs-0.0 and NaN payload differences
        # that numeric == would hide but a value HASH would not
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    return v


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, then rows by value — the driver's
    order-insensitive canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    return df.columns, [tuple(r) for r in df.collect()]


def oracle_result(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(
    name: str, spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection
) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    s_cols, s_rows = canonical_rows(*spark_result(spark_df))
    o_cols, o_rows = canonical_rows(*oracle_result(con, oracle_sql))
    problems: list[str] = []
    if s_cols != o_cols:
        problems.append(f"{name}: columns differ spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: rowcount differs spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(
                f"{name}: first row mismatch at canonical row {i}:\n  spark ={sr}\n  oracle={orow}"
            )
            break
    return problems
