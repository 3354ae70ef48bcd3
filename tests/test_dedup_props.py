"""Dedup operator guarantees beyond the value oracle."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from dask_snowflake_spark.operators.dedup import simhash, simhash_near_dup
from dask_snowflake_spark.queries import _t


def test_simhash_banding_has_no_false_negatives(spark, sf_oracle):
    """Pigeonhole guarantee: EVERY pair within the hamming budget must
    be found by the banded candidate join (brute-force cross-check on a
    bounded corpus)."""
    docs = _t(spark, sf_oracle)["documents"].filter(F.col("doc_id") < 120)
    fps = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    want = {
        (a, b)
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {(r.doc_a, r.doc_b) for r in simhash_near_dup(docs, max_hamming=3).collect()}
    assert got == want, (len(got), len(want))


def test_simhash_stable_under_partitioning(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"].filter(F.col("doc_id") < 80)
    a = dict((r.doc_id, r.simhash) for r in simhash(docs).collect())
    b = dict((r.doc_id, r.simhash) for r in simhash(docs.repartition(11)).collect())
    assert a == b
