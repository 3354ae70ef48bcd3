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
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        # TAGGED before int: python's True == 1 would let a bool column
        # on one engine compare equal to an int column on the other,
        # while the driver's string-based value hash ("True" vs "1")
        # rejects it — the exact gate must be at least as strict
        return f"bool:{v}"
    if isinstance(v, float):
        # repr-compare: catches -0.0-vs-0.0 and NaN payload differences
        # that numeric == would hide but a value HASH would not
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # str-tagged so Decimal('123.40') != Decimal('123.4'): scale is
        # part of what per-engine canonicalization hashes (raw DECIMAL
        # is banned driver-facing anyway — CLAUDE.md — but the exact
        # gate should reject a scale split, not numerically forgive it)
        return f"decimal:{v}"
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


# ---------------------------------------------------------------------------
# Arrow/pandas-round-trip compare — the DRIVER's canonicalization shape
# ---------------------------------------------------------------------------
#
# The collect()/fetchall() compare above sees decimal.Decimal on BOTH
# sides and so missed the r2 q20 divergence: the grading driver round-
# trips results through pandas/Arrow, where Spark's toPandas() keeps
# DECIMAL as Decimal objects but DuckDB's .df() lowers DECIMAL to
# float64 — different hashed bytes for identical values. This mode
# replays that path: toPandas() vs .df(), cell-wise canonicalization
# that deliberately renders Decimal distinct from float.


def _canon_pd_cell(v: Any) -> str:
    import decimal

    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if f != f else repr(f)
    if isinstance(v, decimal.Decimal):
        # NEVER normalized to float: a raw DECIMAL output column is a
        # driver-hash hazard and must surface as a mismatch
        return "DECIMAL:" + str(v)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        v = v.tz_localize(None) if v.tzinfo is not None else v
        return v.isoformat()
    if isinstance(v, dt.datetime):
        # pd.NaT passes isinstance(dt.datetime) but NOT pd.Timestamp,
        # so it lands here: without the isna check it rendered "NaT" —
        # not "NULL" — and a None-vs-NaT representational split (which
        # the driver's hash provably tolerates: xdh_asof_join_events ships
        # NULL timestamps driver-green) would false-fail the gate
        if pd.isna(v):
            return "NULL"
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        # pandas has no date dtype: DuckDB's .df() widens DATE to
        # datetime64 midnight while Spark's toPandas keeps datetime.date
        # objects — a representation split the driver's hash provably
        # tolerates (q18/x05 driver-green two rounds). Canonicalize a
        # date to its midnight instant so both renderings compare equal;
        # a genuine value difference still fails on the date part.
        return v.isoformat() + "T00:00:00"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_pd_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_pd_cell(x)}" for k, x in sorted(v.items())) + "}"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _canon_frame(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_pd_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return list(cols), rows


def compare_arrow(
    name: str, spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection
) -> list[str]:
    """Driver-shaped compare: both sides through pandas/Arrow. Returns
    mismatch descriptions (empty = pass). Catches type-canonicalization
    divergences (DECIMAL vs float, NaT-vs-None) the exact collect-based
    compare can't see."""
    s_cols, s_rows = _canon_frame(spark_df.toPandas())
    o_cols, o_rows = _canon_frame(con.execute(oracle_sql).df())
    problems: list[str] = []
    if s_cols != o_cols:
        return [f"{name}: [arrow] columns differ spark={s_cols} oracle={o_cols}"]
    if len(s_rows) != len(o_rows):
        problems.append(
            f"{name}: [arrow] rowcount differs spark={len(s_rows)} oracle={len(o_rows)}"
        )
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(
                f"{name}: [arrow] first mismatch at canonical row {i}:\n"
                f"  spark ={sr}\n  oracle={orow}"
            )
            break
    return problems
