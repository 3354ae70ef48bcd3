"""Driver-shape gate: run EVERY registry query with a zero-config SparkSession from a
non-repo cwd — the grading driver's exact shape. Catches executor
import issues and missing runtime confs that get_session would mask."""
import sys
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
qs = mod.queries()
bad = []
for name, fn in qs.items():
    try:
        n = len(fn(spark, "/root/testdata/sf0.01").collect())
        print(f"OK   {name}: {n}", flush=True)
    except Exception as e:
        bad.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
print("SWEEP", "FAIL " + ",".join(bad) if bad else "ALL OK", flush=True)
