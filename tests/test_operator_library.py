"""Coverage for library operators that no registry query drives
directly: SRP-LSH near-dup, salted broadcast join, exact_dedup, and
the shingle-array baseline variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_snowflake_spark.operators.dedup import exact_dedup, shingle_array, shingles
from dask_snowflake_spark.operators.similarity import (
    embedding_near_dup_pairs,
    srp_lsh_near_dup,
)
from dask_snowflake_spark.operators.skew import salted_broadcast_join
from dask_snowflake_spark.queries import _t


def test_srp_lsh_matches_exact_near_dup(spark, sf_oracle):
    """Every pair the bucketed SRP path returns must be a true
    >=threshold pair, and at cosine ~1 it should find what the exact
    all-pairs scan finds (identical sign bits w.h.p.)."""
    emb = _t(spark, sf_oracle)["embeddings"]
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.999).collect()
    }
    srp = {(r.id_a, r.id_b) for r in srp_lsh_near_dup(emb, threshold=0.999).collect()}
    assert srp <= exact
    if exact:
        assert len(srp) / len(exact) >= 0.9, (len(srp), len(exact))


def test_salted_broadcast_join_matches_plain_join(spark, sf_oracle):
    t = _t(spark, sf_oracle)
    big = t["orders"].select("o_custkey", "o_totalprice")
    small = t["customer"].select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("inner", "left"):
        plain = big.join(small, "o_custkey", how)
        salted = salted_broadcast_join(big, small, on="o_custkey", how=how, num_salts=8)
        assert plain.count() == salted.count(), how
    with pytest.raises(ValueError, match="inner.*left"):
        salted_broadcast_join(big, small, on="o_custkey", how="right")


def test_exact_dedup_keeps_min_key(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"].select("doc_id", "text")
    kept = exact_dedup(docs, cols=["text"], key="doc_id")
    expect = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    assert kept.count() == expect.count()
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in expect.collect()}


def test_shingle_array_agrees_with_fast_shingles(spark, sf_oracle):
    """The HOF-array baseline and the posexplode+lead fast path must
    produce the same (doc, shingle) set."""
    docs = _t(spark, sf_oracle)["documents"].filter(F.col("doc_id") < 60)
    fast = {(r.doc, r.shingle) for r in shingles(docs, "text", "doc_id", n=3).collect()}
    arr = shingle_array(docs, "text", "doc_id", n=3)
    slow = {
        (r.doc, s)
        for r in arr.select("doc", F.explode(F.array_distinct("shingles")).alias("s")).collect()
        for s in [r.s]
    }
    assert fast == slow
