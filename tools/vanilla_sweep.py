"""Driver-shape gate: run EVERY registry query with a zero-config SparkSession from a
non-repo cwd — the grading driver's exact shape — and VALUE-CHECK each
query against its DuckDB oracle through the pandas/Arrow round-trip the
driver uses for its hash. Catches (a) executor import issues / missing
runtime confs that get_session would mask, and (b) type-canonicalization
divergences (e.g. DECIMAL-vs-float) the exact collect-based pytest
compare can't see.

Usage: cd /tmp && python /root/repo/tools/vanilla_sweep.py  (~6 min)
Optional argv: query names (exact) to restrict the sweep to.
"""
import os
import sys
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo/tests")
import oracle as oracle_mod

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
spark = SparkSession.builder.master("local[8]").getOrCreate()
con = oracle_mod.duckdb_con(SF_DIR)
qs, osql = mod.queries(), mod.oracle_sql()
only = set(sys.argv[1:])
if only:
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(f"unknown query names: {sorted(unknown)}")
    qs = {n: f for n, f in qs.items() if n in only}
bad = []
for name, fn in qs.items():
    try:
        df = fn(spark, SF_DIR)
        sql = osql.get(name)
        if sql is None:
            n = len(df.collect())
            print(f"OK   {name}: {n} (rows-only)", flush=True)
            continue
        problems = oracle_mod.compare_arrow(name, df, sql, con)
        if problems:
            bad.append(name)
            for p in problems:
                print(f"FAIL {p}", flush=True)
        else:
            print(f"OK   {name}: arrow-exact", flush=True)
    except Exception as e:
        bad.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
print("SWEEP", "FAIL " + ",".join(bad) if bad else "ALL OK", flush=True)
