"""Embedding similarity search over ``array<float>`` columns.

Brute-force cosine top-k is the correctness baseline; the scale paths
are (a) IVF-style candidate pruning on a coarse partition key (here the
``label`` column stands in for a centroid assignment) and (b) SRP-LSH
bucketing (random-hyperplane signs) for billion-vector corpora.

Everything stays JVM-side: dot products via ``zip_with`` +
``aggregate`` higher-order functions (whole-stage codegen), joins are
broadcast (query side is small by construction) — no Python UDF in the
hot path, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .dedup import portable_hash


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays.

    Accumulation order is the array order in BOTH Spark and the DuckDB
    oracle's list functions, so results are bit-comparable after a
    round()."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast against the full corpus — one scan,
    no shuffle of the corpus; the per-query top-k is a window over the
    (|queries| * |corpus|) joined stream, which AQE keeps partitioned by
    query id. At 100 TB this is the scan-everything baseline an ANN
    index is judged against."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("query_vec"), F.col("vec")), round_digits))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-style pruned top-k: candidates restricted to the query's
    coarse partition (centroid cell). Join key = partition id, so the
    corpus shuffles once by cell and each query only scans its cell —
    the classic inverted-file trade of recall for a ~|cells|× scan cut."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.col(partition_col).alias("cell"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.col(partition_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("query_vec"), F.col("vec")), round_digits))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All vector pairs with cosine >= threshold (embedding-space near-
    duplicate detection). Exact all-pairs — correctness baseline; use
    ``srp_lsh_near_dup`` for the bucketed scale path."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_digits))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
        .orderBy("id_a", "id_b")
    )


def srp_signature(vec: Column, *, num_planes: int = 16, dim: int = 64) -> Column:
    """Signed-random-projection LSH signature (one int64 of sign bits).

    Hyperplane components are md5-derived pseudo-random values in
    [-1, 1] — deterministic across runs and engines, no stored model.
    Two vectors with cosine ~1 share most sign bits; bucketing on the
    signature (or bands of it) prunes the candidate space."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(
            *[
                (portable_hash(F.lit(f"{p}:{d}")) / F.lit(float(2**59)) - 1.0)
                for d in range(dim)
            ]
        )
        d_ = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d_ > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def srp_lsh_near_dup(
    embeddings: DataFrame,
    *,
    threshold: float = 0.99,
    num_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup: bucket on the SRP signature,
    compare only within buckets, verify with exact cosine. Near-
    identical vectors agree on all sign bits with high probability, so
    the cross product collapses to per-bucket blocks."""
    sig = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        srp_signature(F.col(vec_col), num_planes=num_planes, dim=dim).alias("bucket"),
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = sig.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
