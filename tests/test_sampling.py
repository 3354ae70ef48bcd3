"""Deterministic sampling / split operator contracts: the properties
that make hash-based splits safe for dataset versioning — stability
under repartitioning, subset-invariance under corpus growth, and
per-stratum fraction control."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_snowflake_spark.operators.sampling import (
    deterministic_sample,
    split_assign,
    stratified_deterministic_sample,
)
from dask_snowflake_spark.queries import _t


def test_sample_invariant_under_partitioning(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"]
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), "doc_id", 0.2).collect()
    )
    assert a == b and 0 < len(a) < docs.count()


def test_split_stable_under_growth(spark, sf_oracle):
    """Assigning splits on a subset must agree with assigning on the
    full corpus — rows never migrate as data is added."""
    docs = _t(spark, sf_oracle)["documents"]
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r.doc_id: r.split for r in split_assign(docs, "doc_id", weights).collect()}
    subset = {
        r.doc_id: r.split
        for r in split_assign(
            docs.filter(F.col("doc_id") % 2 == 0), "doc_id", weights
        ).collect()
    }
    assert subset and all(full[k] == v for k, v in subset.items())


def test_split_fractions_and_partition(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"]
    n = docs.count()
    counts = dict(
        split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .count()
        .collect()
    )
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.08, counts
    assert abs(counts.get("val", 0) / n - 0.1) < 0.06, counts


def test_stratified_fractions(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"]
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fractions = {v: (1.0 if i == 0 else 0.25) for i, v in enumerate(sorted(langs))}
    out = stratified_deterministic_sample(docs, "doc_id", "lang", fractions)
    got = dict(out.groupBy("lang").count().collect())
    base = dict(docs.groupBy("lang").count().collect())
    full_lang = sorted(langs)[0]
    assert got[full_lang] == base[full_lang]
    for lang in sorted(langs)[1:]:
        assert got.get(lang, 0) < base[lang] * 0.6, (lang, got, base)


def test_null_keys_are_sampled_not_dropped(spark):
    """NULL sampling keys hash via a sentinel: fraction=1.0 keeps ALL
    rows (NULL hash used to silently drop them), and split_assign gives
    NULL-keyed rows one deterministic split, not the sorted-last
    fallback."""
    from dask_snowflake_spark.operators.sampling import (
        deterministic_sample,
        split_assign,
    )

    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    assert deterministic_sample(df, "k", 1.0).count() == 3
    assert deterministic_sample(df, "k", 0.0).count() == 0
    splits = {r.k: r.split for r in split_assign(
        df, "k", {"train": 0.5, "test": 0.5}).collect()}
    assert splits[None] in ("train", "test")


def test_split_assign_rejects_out_of_range_weights(spark):
    """Weights like {-0.5, 1.5} sum to 1 but would silently produce an
    empty split — each weight must be validated individually."""
    import pytest

    from dask_snowflake_spark.operators.sampling import split_assign

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="each"):
        split_assign(df, "k", {"a": -0.5, "b": 1.5})
