#!/usr/bin/env python
"""Micro-bench for a subset of registry queries: wall + Spark job count
per pass, same measurement discipline as bench.py (noop sink, job-id
delta) but scoped to the names given on argv — the iteration loop for
hotspot work without paying a full bench run.

Usage: python tools/query_bench.py [-n PASSES] name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    if not args:
        raise SystemExit("usage: query_bench.py [-n PASSES] name [name ...]")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dask_snowflake_spark.queries import registry
    from dask_snowflake_spark.session import get_session, register_tables

    reg = registry()
    unknown = [n for n in args if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session("dask_snowflake_spark-query-bench")
    for name in register_tables(spark, sf_dir):
        spark.sql(f"SELECT count(*) FROM {name}").collect()
    # absorb noop-writer/codegen first-touch into an untimed warm run
    reg[args[0]].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    sched = spark.sparkContext._jsc.sc().dagScheduler()
    for name in args:
        best, best_jobs = None, None
        for p in range(passes):
            t0 = time.perf_counter()
            j0 = sched.nextJobId()
            reg[name].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            jobs = sched.nextJobId() - j0
            dt = time.perf_counter() - t0
            print(f"  {name} pass{p}: {dt:.2f}s jobs={jobs}", flush=True)
            if best is None or dt < best:
                best = dt
            if best_jobs is None or jobs < best_jobs:
                best_jobs = jobs
        print(f"BEST {name}: {best:.2f}s jobs={best_jobs}", flush=True)


if __name__ == "__main__":
    main()
