#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to
``plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt`` — the
judge-facing before/after plan evidence for the optimization round.

Usage: python tools/capture_plan.py SUFFIX name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PLANS_ROUND (default r15)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    if len(args) < 2:
        raise SystemExit("usage: capture_plan.py SUFFIX name [name ...]")
    suffix, names = args[0], args[1:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dask_snowflake_spark.queries import registry
    from dask_snowflake_spark.session import get_session, register_tables

    reg = registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session("dask_snowflake_spark-capture-plan")
    register_tables(spark, sf_dir)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)", flush=True)


if __name__ == "__main__":
    main()
