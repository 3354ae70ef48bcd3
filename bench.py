#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Execution sink is `noop` so timings measure the distributed plan, not
driver-side row serialization. Value = total wall seconds across all
queries (lower is better).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dask_snowflake_spark.queries import registry
    from dask_snowflake_spark.session import get_session

    spark = get_session("dask_snowflake_spark-bench")

    # warm up the JVM + parquet footers once so per-query numbers are
    # engine time, not first-touch overhead
    from dask_snowflake_spark.session import register_tables

    tables = register_tables(spark, sf_dir)
    # touch every table (parquet footers + scan codegen) so the first
    # measured query isn't charged for first-contact costs
    for name in tables:
        spark.sql(f"SELECT count(*) FROM {name}").collect()

    timings: dict[str, float] = {}
    for name, qd in sorted(registry().items()):
        t0 = time.perf_counter()
        df = qd.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "sf": sf_val,
        "queries": timings,
    }
    # ONE line, compact separators, headline numbers first: the driver
    # captures a bounded window of output, so the line must stay short
    # enough to survive truncation and still json-parse.
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
