"""Multimodal plumbing contracts for the non-oracle kernels: resize
produces fixed-size payloads deterministically; extracted features feed
the similarity operators directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_snowflake_spark.operators import multimodal as mm
from dask_snowflake_spark.operators import similarity as sim
from dask_snowflake_spark.queries import _t


def test_resize_fixed_size_and_deterministic(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"].limit(50)
    assets = mm.attach_binary_assets(docs)
    a = {r.doc_id: bytes(r.asset) for r in mm.resize(assets, 16, 16).collect()}
    b = {r.doc_id: bytes(r.asset) for r in mm.resize(assets.repartition(7), 16, 16).collect()}
    assert a == b
    assert all(len(v) == 256 for v in a.values())


def test_features_feed_similarity_topk(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"].limit(100)
    feats = mm.extract_features(mm.attach_binary_assets(docs)).withColumnRenamed(
        "features", "embedding"
    ).withColumnRenamed("doc_id", "vec_id")
    top = sim.topk_bruteforce(feats, feats.filter(F.col("vec_id") < 2), k=5)
    rows = top.collect()
    assert {r.query_id for r in rows} <= {0, 1}
    assert all(r.rank <= 5 for r in rows)
