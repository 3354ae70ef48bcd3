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


def _brute_nfd(items: list[int], cap: int) -> list[list[int]]:
    """Sequential reference NFD: sort desc, keep ONE open bin."""
    bins: list[list[int]] = []
    rem = 0
    for length in sorted(items, reverse=True):
        if rem >= length:
            bins[-1].append(length)
            rem -= length
        else:
            bins.append([length])
            rem = cap - length
    return bins


def test_nfd_plan_matches_brute_simulation_hypothesis():
    """The histogram bulk closed form (nfd_plan + rank arithmetic) must
    equal TRUE sequential NFD item-for-item — the property that makes
    the O(cap) driver fold a faithful stand-in for the per-item loop."""
    from collections import Counter, defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dask_snowflake_spark.operators.packing import nfd_plan

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=64), min_size=1, max_size=80),
        st.sampled_from([64, 100, 512]),
    )
    def check(raw, cap):
        items = [min(x, cap) for x in raw]
        plan, n_bins = nfd_plan(list(Counter(items).items()), cap)
        brute = _brute_nfd(items, cap)
        assert n_bins == len(brute)
        got = defaultdict(list)
        for p in plan:
            for r in range(1, p["n"] + 1):
                b = (
                    p["first_bin"]
                    if r <= p["fill"]
                    else p["new_start"] + (r - p["fill"] - 1) // p["per_bin"]
                )
                got[b].append(p["length"])
        assert {k: sorted(v) for k, v in got.items()} == {
            i + 1: sorted(b) for i, b in enumerate(brute)
        }
        # atomicity + capacity invariants
        assert all(sum(b) <= cap for b in brute)

    check()


def test_nfd_plan_rejects_empty_and_oversize():
    """Empty (L=0) and oversize (L>cap) classes are the CALLER's
    declared branches — nfd_plan raises loudly instead of silently
    mispacking (the honest-null branch pin: fixtures contain neither,
    so this is the only coverage of the branch)."""
    import pytest

    from dask_snowflake_spark.operators.packing import nfd_plan

    with pytest.raises(ValueError, match="outside"):
        nfd_plan([(0, 3)], 512)
    with pytest.raises(ValueError, match="outside"):
        nfd_plan([(513, 1)], 512)
    with pytest.raises(ValueError, match="non-positive"):
        nfd_plan([(10, 0)], 512)


def test_pack_sequences_atomic_matches_python_replica(spark, sf_oracle):
    """The full query == a from-scratch python replica that packs the
    REAL fixture docs with the sequential per-item NFD loop (ties
    broken doc_id asc inside a length class, matching the rank window)
    — independent of both the histogram fold and the oracle SQL.
    Liveness: multi-doc bins exist and packing efficiency is high
    (docs are 10..100 tokens vs the 512 cap, so NFD should waste
    little); honest nulls: no empty, no oversize docs in fixtures."""
    from collections import defaultdict

    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    docs = con.execute(
        f"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS nt
        FROM '{sf_oracle}/documents.parquet'
        """
    ).fetchall()
    cap = 512
    assert all(1 <= nt <= cap for _, nt in docs)  # honest-null branches
    ordered = sorted(docs, key=lambda d: (-d[1], d[0]))
    bins: list[list[tuple[int, int]]] = []
    rem = 0
    for doc_id, nt in ordered:
        if rem >= nt:
            bins[-1].append((doc_id, nt))
            rem -= nt
        else:
            bins.append([(doc_id, nt)])
            rem = cap - nt
    by_depth = defaultdict(lambda: [0, 0, 0])  # n_bins, tokens, xor
    for b in bins:
        d = len(b)
        by_depth[d][0] += 1
        by_depth[d][1] += sum(nt for _, nt in b)
        for doc_id, _ in b:
            by_depth[d][2] ^= doc_id
    n_bins_total = len(bins)
    n_docs_packed = len(docs)
    total_tokens = sum(nt for _, nt in docs)
    eff = (total_tokens * 1_000_000 // (n_bins_total * cap)) / 1e6
    want = sorted(
        (
            d, v[0], v[1], v[2], n_bins_total, n_docs_packed, eff, 0, 0,
        )
        for d, v in by_depth.items()
    )
    got = sorted(
        tuple(r)
        for r in registry()["pack_sequences_atomic"]
        .spark_fn(spark, sf_oracle)
        .collect()
    )
    assert got == want
    assert max(d for d, *_ in want) >= 2  # multi-doc bins exist
    assert eff >= 0.9  # liveness: packing is actually tight

def test_pack_documents_atomic_counts_null_tokens_as_empty(spark):
    """A NULL token count reaching the public operator surface lands in
    the declared EXCLUDED n_empty branch instead of a bare TypeError on
    `None <= 0` in the histogram fold (r13 ADVICE) — the fixture keeps
    documents.text non-NULL, but the operator must be total anyway."""
    from dask_snowflake_spark.operators.packing import pack_documents_atomic

    docs = spark.createDataFrame(
        [(1, 10), (2, None), (3, 0), (4, 9000)],
        "doc_id long, n_tokens long",
    )
    assigned, n_empty, n_oversize, n_bins = pack_documents_atomic(docs, cap=512)
    assert (n_empty, n_oversize, n_bins) == (2, 1, 1)
    assert [(r.doc_id, r.bin_id) for r in assigned.collect()] == [(1, 1)]
