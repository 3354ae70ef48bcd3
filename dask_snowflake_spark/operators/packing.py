"""Sequence packing for LLM training-data preparation.

GPT-style pipelines concatenate documents in a deterministic order and
chunk the token stream into fixed-length training sequences (documents
may straddle chunk boundaries). That layout is pure prefix-sum
arithmetic, so it distributes as a window computation — no stateful
loop, no driver pass:

    start_i = running token sum before doc i   (one window per shard)
    doc i occupies chunks floor(start_i/C) .. floor((end_i - 1)/C)

Scale shape: the window partitions by a shard column (language here;
date/source shards in production), so each shard's prefix sum is an
independent in-partition sort — never a single global ordering. Chunk
ids are shard-local; (shard, chunk) is the training-sequence key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sequence_pack(
    docs: DataFrame,
    token_col: str,
    *,
    shard_col: str,
    order_col: str,
    chunk_tokens: int = 512,
) -> DataFrame:
    """Assign each document its span of fixed-size training chunks.

    Returns the input keys plus ``start_offset`` (token offset of the
    doc within its shard's stream), ``first_chunk``/``last_chunk``
    (inclusive chunk-id span) and ``n_chunks``. Deterministic given the
    (shard, order) columns; empty docs occupy zero chunks (first >
    last)."""
    w = (
        W.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    end = F.sum(token_col).over(w)
    start = end - F.col(token_col)
    first = F.floor(start / chunk_tokens)
    last = F.floor((end - 1) / chunk_tokens)
    return docs.select(
        shard_col,
        order_col,
        F.col(token_col),
        start.alias("start_offset"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        F.when(F.col(token_col) > 0, last - first + 1).otherwise(F.lit(0)).alias("n_chunks"),
    )


def chunk_summary(packed: DataFrame, *, shard_col: str, order_col: str) -> DataFrame:
    """Per-(shard, chunk) stats: how many documents touch each training
    sequence and the document-id span — the packing QA view. Explodes
    each doc over its chunk span (bounded by n_chunks, typically 1-2)."""
    spans = packed.filter(F.col("n_chunks") > 0).select(
        shard_col,
        order_col,
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    return spans.groupBy(shard_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )
