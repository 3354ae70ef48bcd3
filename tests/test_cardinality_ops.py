"""HLL cardinality sketch pins: merge law, fingerprint guard, formula
literals, and an independent python replica of the whole query (the
r11 rule: a query whose oracle mirrors the engine expression needs a
replica that re-derives the math from scratch — here the oracle is
structurally independent only for the merged '__all__' row, which
holds by the merge-law theorem; the per-shard rows mirror)."""

from __future__ import annotations

import hashlib
import math

import pytest

from dask_snowflake_spark.operators.cardinality import (
    HLL_ALPHA_NUM,
    HLL_LC_THRESHOLD,
    HLL_M,
    HLL_MAX_RANK,
    HLL_META_BUCKET,
    HLL_META_NEG_BUCKET,
    hll_build,
    hll_estimate,
    hll_fingerprint,
    hll_lc_table,
    hll_merge,
)


def test_hll_literals_match_formulas():
    """The alpha numerator and linear-counting table are literal
    integers both engines consume verbatim — pin them to their
    generating formulas so a silent edit cannot drift the estimator."""
    assert HLL_M == 256 and HLL_MAX_RANK == 49
    assert HLL_ALPHA_NUM == round(0.7213 / (1 + 1.079 / 256) * (1 << 61))
    assert HLL_LC_THRESHOLD == 640
    tab = hll_lc_table()
    assert len(tab) == 256
    assert tab == [round(256 * math.log(256 / v)) for v in range(1, 257)]
    assert tab[255] == 0  # V = m -> empty sketch estimates 0
    # fingerprint: 60-bit md5 slice binding p, rank width and seed
    fp = hll_fingerprint("s")
    assert fp == int(hashlib.md5(b"hllfp:8:48:s").hexdigest()[:15], 16)
    assert 0 <= fp < 1 << 60
    assert hll_fingerprint("s") != hll_fingerprint("t")


def _replica(keys, seed="hll"):
    """From-scratch python HLL: md5 slice, registers, exact-integer
    estimator — shares no code with the operator."""
    regs: dict[int, int] = {}
    for k in keys:
        h = hashlib.md5(f"{seed}:{k}".encode()).hexdigest()
        b = int(h[:2], 16)
        v = int(h[2:14], 16)
        r = 49 if v == 0 else 49 - v.bit_length()
        regs[b] = max(regs.get(b, 0), r)
    s = sum(1 << (49 - regs.get(j, 0)) for j in range(256))
    q, rem = divmod(HLL_ALPHA_NUM, s)
    raw = q * 16 + (rem * 16) // s
    v_empty = 256 - len(regs)
    if v_empty > 0 and raw <= HLL_LC_THRESHOLD:
        return hll_lc_table()[v_empty - 1], v_empty, "linear"
    return raw, v_empty, "hll"


def test_hll_merge_law_and_estimates(spark):
    """Bucket-wise MAX is the family's associative-idempotent merge
    law: shard sketches merged == direct global build (register-exact,
    meta rows riding), self-merge == identity, duplicate keys change
    nothing, and both estimator branches match the replica exactly."""
    big = [f"k{i}" for i in range(3000)]
    direct = hll_build(spark.createDataFrame([(k,) for k in big], "key string"))
    direct_regs = {r.bucket: r.reg for r in direct.collect()}

    sharded = hll_build(
        spark.createDataFrame(
            [("a" if i % 3 else "b", f"k{i}") for i in range(3000)],
            "sh string, key string",
        ),
        shard_col="sh",
    )
    assert {r.bucket: r.reg for r in hll_merge(sharded).collect()} == direct_regs
    assert {
        r.bucket: r.reg for r in hll_merge(direct.unionByName(direct)).collect()
    } == direct_regs
    dup = spark.createDataFrame([(k,) for k in big + big], "key string")
    assert {r.bucket: r.reg for r in hll_build(dup).collect()} == direct_regs
    # meta rows carry the +-fingerprint pair
    fp = hll_fingerprint("hll")
    assert direct_regs[HLL_META_BUCKET] == fp
    assert direct_regs[HLL_META_NEG_BUCKET] == -fp

    got = hll_estimate(direct).collect()[0]
    assert (got.est, got.v_empty, got.branch) == _replica(big)
    assert got.branch == "hll"
    small = [f"s{i}" for i in range(40)]
    got2 = hll_estimate(
        hll_build(spark.createDataFrame([(k,) for k in small], "key string"))
    ).collect()[0]
    assert (got2.est, got2.v_empty, got2.branch) == _replica(small)
    assert got2.branch == "linear"


def test_hll_fingerprint_guard_traps_mismatched_merge(spark):
    """MAX-merging shards built with different parameters corrupts the
    (-1, -2) cancellation pair; the estimate's CONSUMED guard raises
    with the mitigation named instead of mixing registers silently."""
    a = hll_build(spark.createDataFrame([("x",)], "key string"))
    b = hll_build(spark.createDataFrame([("y",)], "key string"), seed="other")
    bad = hll_merge(a.unionByName(b))
    with pytest.raises(Exception, match="rebuild all shards"):
        hll_estimate(bad).collect()
    # and a wrong expected seed against a clean sketch also raises
    with pytest.raises(Exception, match="rebuild all shards"):
        hll_estimate(a, seed="other").collect()


def test_hll_null_keys_are_skipped(spark):
    """NULL keys contribute no register evidence (the count-distinct
    convention both engines share)."""
    df = spark.createDataFrame([("a",), (None,), ("b",)], "key string")
    clean = spark.createDataFrame([("a",), ("b",)], "key string")
    assert {r.bucket: r.reg for r in hll_build(df).collect()} == {
        r.bucket: r.reg for r in hll_build(clean).collect()
    }


def test_hll_query_matches_python_replica(spark, sf_oracle):
    """hll_cardinality == the from-scratch replica on the real
    fixture: every shard row's (est, v_empty, branch) re-derived in
    python, exact counts re-counted, and branch liveness asserted
    (both branches must be live at the oracle SF: the per-type event
    shards exercise raw HLL, the user-id shard exercises linear
    counting)."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, CAST(event_id AS VARCHAR), "
        f"CAST(user_id AS VARCHAR) FROM '{sf_oracle}/events.parquet'"
    ).fetchall()
    shards: dict[str, list[str]] = {}
    for et, eid, uid in ev:
        shards.setdefault(et, []).append(eid)
        shards.setdefault("__all__", []).append(eid)
        shards.setdefault("__users__", []).append(uid)
    want = {}
    for sh, keys in shards.items():
        est, v_empty, branch = _replica(keys)
        exact = len(set(keys))
        want[sh] = (
            exact,
            est,
            v_empty,
            branch,
            abs(est - exact) * 1000 <= 195 * exact,
        )
    got = {
        r.shard: (r.exact_n, r.est, r.v_empty, r.branch, r.within_3se)
        for r in registry()["hll_cardinality"].spark_fn(spark, sf_oracle).collect()
    }
    assert got == want
    branches = {v[3] for v in got.values()}
    assert branches == {"hll", "linear"}, branches
    assert all(v[4] for v in got.values())  # every estimate within 3 SE
