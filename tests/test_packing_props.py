"""Sequence-packing invariants beyond the value oracle: chunk spans are
contiguous, never overlap between consecutive docs beyond the shared
boundary chunk, and total chunk count equals ceil(total_tokens/C) per
shard."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dask_snowflake_spark.operators.packing import sequence_pack
from dask_snowflake_spark.operators.text import token_count
from dask_snowflake_spark.queries import _t


def test_packing_invariants(spark, sf_oracle):
    C = 512
    docs = _t(spark, sf_oracle)["documents"].select(
        "lang", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = sequence_pack(docs, "n_tokens", shard_col="lang", order_col="doc_id", chunk_tokens=C)
    rows = sorted(packed.collect(), key=lambda r: (r.lang, r.doc_id))
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r.lang, []).append(r)
    for lang, rs in by_shard.items():
        offset = 0
        for r in rs:
            # offsets are the exact running sum in (shard, order) order
            assert r.start_offset == offset, (lang, r)
            if r.n_tokens > 0:
                assert r.first_chunk == offset // C
                assert r.last_chunk == (offset + r.n_tokens - 1) // C
                assert r.n_chunks == r.last_chunk - r.first_chunk + 1
            offset += r.n_tokens
        total = sum(r.n_tokens for r in rs)
        # last doc's last chunk is the shard's final chunk
        assert rs[-1].last_chunk == math.ceil(total / C) - 1
