"""The Observation API: pipeline QA counters that ride the main action.

At 100 TB you cannot afford a second pass just to count nulls or sum a
checksum — ``df.observe`` attaches aggregate metrics to the plan and
collects them during the SAME job that produces the output. This is
the engine surface a production pipeline uses for row-count
reconciliation and data-quality telemetry.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dask_snowflake_spark.queries import _t


def test_observation_metrics_match_independent_aggregates(spark, sf_oracle):
    li = _t(spark, sf_oracle)["lineitem"]
    obs = Observation("qa")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum("l_orderkey").alias("key_checksum"),
    )
    out = observed.groupBy("l_returnflag").count()
    result = {r.l_returnflag: r["count"] for r in out.collect()}
    # metrics were collected during the SAME action as the output
    got = obs.get
    exp = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("nq"),
        F.sum("l_orderkey").alias("ck"),
    ).collect()[0]
    assert got["n_rows"] == exp.n == sum(result.values())
    assert got["null_qty"] == (exp.nq or 0)
    assert got["key_checksum"] == exp.ck
