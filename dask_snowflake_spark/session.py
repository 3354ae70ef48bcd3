"""SparkSession factory + catalog bootstrap.

Engine defaults chosen for correctness-vs-oracle and 100 TB posture:

- AQE on (runtime coalesce, skew-join splitting) — at cluster scale the
  static shuffle-partition count is always wrong for some stage; AQE
  re-plans per-stage from actual map output sizes.
- Arrow on for every Python<->JVM hop (the reference is Arrow end-to-end:
  /root/reference/dask_snowflake/core.py:127-130).
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle (naive-UTC) and are cluster-invariant.
- `spark.sql.shuffle.partitions` defaults to ~cores locally; on a real
  cluster AQE's coalesce makes the initial number mostly a ceiling.

The TESTDATA tables (TPC-H-ish star schema + events/documents/embeddings,
see TESTDATA.md) are registered as temp views so the relational layer can
be driven by SQL or DataFrame interchangeably.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
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

# Dimension tables small enough to broadcast at ANY scale factor (region
# has 5 rows, nation 25 — fixed size in TPC-H regardless of SF).
ALWAYS_BROADCAST = ("region", "nation")


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_session(app_name: str = "dask_snowflake_spark") -> SparkSession:
    """Build (or reuse) the engine SparkSession with engine defaults."""
    # Executor python workers must be able to import this package no
    # matter the driver's cwd (batch descriptors/UDF closures reference
    # it). PYTHONPATH is inherited by workers at JVM spawn.
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + pp if pp else "")
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # parquet timestamp[ns] fixtures: read without rebase surprises
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # parquet timestamp[ns] (events.ts): read as long, convert below —
        # Spark has no native nanos timestamp (SPARK-40819)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _register_data_sources(spark)
    return spark


# Persisted intermediates handed back to callers inside lazy plans.
# Operators persist twice-read subtrees (LSH band keys, normalized
# vectors, TF term counts); the plan is materialized AFTER the operator
# returns, so the operator can't unpersist in a finally.  Tracking each
# persist here and releasing at the next query's table lookup keeps a
# long-lived session (the grading driver's 78-query sweep) from
# accumulating every query's cache in storage memory.
_LIVE_CACHES: list[DataFrame] = []
# Broadcast variables with the same lifecycle problem (read_snowflake's
# batch-descriptor broadcast outlives the call that made it; with the
# duckdb stub the descriptors embed the staged payload bytes).
_LIVE_BROADCASTS: list = []


def track_cache(df: DataFrame) -> DataFrame:
    """``persist()`` a DataFrame and register it for :func:`release_caches`.

    Use for intermediates that out-live the operator call (the caller
    materializes the returned plan).  Fully-consumed caches (e.g. the
    k-means training base) should keep the local try/finally pattern
    instead."""
    df.persist()
    _LIVE_CACHES.append(df)
    return df


def track_broadcast(bc):
    """Register a Broadcast for :func:`release_caches` — same lifecycle
    discipline as :func:`track_cache` (the variable outlives the call
    that created it; a long-lived session sweeping many reads would
    otherwise pin every result's descriptors in memory)."""
    _LIVE_BROADCASTS.append(bc)
    return bc


def release_caches() -> None:
    """Unpersist every tracked intermediate from prior queries."""
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped; nothing to free
    while _LIVE_BROADCASTS:
        bc = _LIVE_BROADCASTS.pop()
        try:
            bc.unpersist()
        except Exception:
            pass


def _register_data_sources(spark: SparkSession) -> None:
    """Expose the connector as spark.read.format('snowflake_native')."""
    try:
        from .sources.snowflake import SnowflakeNativeDataSource

        spark.dataSource.register(SnowflakeNativeDataSource)
    except Exception:
        pass  # older Spark without the Python Data Source API


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one TESTDATA table. Plain parquet scan: Catalyst pushes
    filters/column pruning into it for free.

    timestamp[ns] columns (events.ts) arrive as nanosecond longs (see
    nanosAsLong conf) and are truncated to microsecond timestamps with
    integer division — bit-identical to DuckDB's ns->us truncation, and a
    pure JVM-side projection on top of the scan.
    """
    _ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for field_name in _nanos_timestamp_cols(path):
        df = df.withColumn(
            field_name, F.timestamp_micros(F.expr(f"`{field_name}` div 1000"))
        )
    return df


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Make a caller-provided SparkSession (e.g. the grading driver's,
    built without our defaults) behave like :func:`get_session`:

    - set the runtime-settable confs correctness depends on;
    - ship this package to executors via ``addPyFile`` — module-level
      functions (stateful update fns, batch descriptors, decode
      kernels) pickle BY REFERENCE, so executor Python workers must be
      able to ``import dask_snowflake_spark`` even when the session was
      created before the package was on any PYTHONPATH."""
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED"),
        ("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on this build; session defaults apply
    try:
        # Spark's 200-partition default over-parallelizes local mode
        # (200 shuffle files + 200 streaming state stores per stateful
        # op). Right-size it ONLY when still at the untouched default —
        # an explicit caller choice is respected.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:
        pass
    _ensure_executor_package(spark)


def _ensure_executor_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_dss_pyfile_added", False):
        return
    try:
        import uuid
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        tmp_dir = os.path.join(os.path.dirname(pkg_dir), ".tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        zip_path = os.path.join(tmp_dir, "dask_snowflake_spark_pkg.zip")
        # Rebuild whenever any source file is newer than the zip —
        # otherwise executors silently import stale code after an edit.
        newest_src = max(
            (
                os.path.getmtime(os.path.join(root, f))
                for root, _dirs, files in os.walk(pkg_dir)
                for f in files
                if f.endswith(".py")
            ),
            default=0.0,
        )
        if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest_src:
            # per-process temp name: two concurrent sessions (bench +
            # pytest after a source edit) both rebuilding a stale zip
            # would interleave writes into one shared '.part' file and
            # os.replace a corrupt archive into place
            part = f"{zip_path}.{os.getpid()}.{uuid.uuid4().hex}.part"
            with zipfile.ZipFile(part, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                            zf.write(full, rel)
            os.replace(part, zip_path)
        sc.addPyFile(zip_path)
        sc._dss_pyfile_added = True
    except Exception:
        pass  # PYTHONPATH route (get_session) already covers our own sessions


def _nanos_timestamp_cols(path: str) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register every TESTDATA table at `sf_dir` as a temp view.

    Returns the name -> DataFrame mapping. Views are lazy; nothing is
    scanned until a query runs.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
