"""Independent brute-force cross-checks for the closed-form statistics
queries: a THIRD computation (naive Python over collected fixture rows,
exact rationals where relevant) of the same statistic, checked against
the Spark result. The DuckDB oracle already proves Spark == SQL; these
prove both equal the textbook definition computed a completely
different way (no runs/closed-form rank sums, no integer folds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_snowflake_spark.queries import _t, registry


def _whitespace_tokens(text: str) -> list[str]:
    return [w for w in text.strip().split()] if text and text.strip() else []


def test_gini_matches_naive_sorted_definition(spark, sf_oracle):
    """xcr's run-collapsed closed-form rank sums must equal the naive
    definition: sort all doc token counts, G = (2*sum(i*x_i) -
    (n+1)*sum(x)) / (n*sum(x)), floored at 1e-6 like the query."""
    docs = _t(spark, sf_oracle)["documents"].select("text").collect()
    xs = sorted(len(_whitespace_tokens(r.text)) for r in docs)
    n, total = len(xs), sum(xs)
    rank_sum = sum(i * x for i, x in enumerate(xs, start=1))
    gini = ((2 * rank_sum - (n + 1) * total) * 1_000_000 // (n * total)) / 1e6
    thr = (9 * n) // 10
    top = sum(xs[thr:])
    top_share = (top * 1_000_000 // total) / 1e6

    row = registry()["xcr_token_gini"].spark_fn(spark, sf_oracle).collect()[0]
    assert row.n_docs == n and row.total_tokens == total
    assert row.gini == gini
    assert row.top_decile_share == top_share


def test_km_matches_naive_product_limit(spark, sf_oracle):
    """xct's stepwise integer fold must equal the naive product-limit
    computed per user in Python: exact microsecond durations, 3-day
    administrative censoring, S floored stepwise at 1e-6 exactly as
    the query defines it (deaths-before-censorings ties)."""
    ev = (
        _t(spark, sf_oracle)["events"]
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("t0"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
        )
        .collect()
    )
    times = []
    for r in ev:
        if r.tp is None:
            times.append((3, 0))
            continue
        td = r.tp - r.t0
        micros = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        days = micros // 86_400_000_000
        times.append((days, 1) if days <= 3 else (3, 0))
    step_ts = sorted({t for t, _ in times})
    s, rows = 1_000_000, {}
    at_risk = len(times)
    for t in step_ts:
        d = sum(1 for tt, e in times if tt == t and e == 1)
        c = sum(1 for tt, e in times if tt == t and e == 0)
        s = (s * (at_risk - d)) // at_risk
        rows[t] = (at_risk, d, c, s / 1e6)
        at_risk -= d + c

    got = registry()["xct_survival_km"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == len(rows)
    for r in got:
        n_risk, d, c, surv = rows[r.t_day]
        assert (r.n_risk, r.d_events, r.c_censored) == (n_risk, d, c), r
        assert r.survival == surv, r


def test_weighted_median_matches_naive_cumulative(spark, sf_oracle):
    """xcn's window formulation must equal the naive per-language
    cumulative walk over (n_chars, doc_id)-sorted docs with exact
    integer weights."""
    docs = (
        _t(spark, sf_oracle)["documents"]
        .select("lang", "n_chars", "doc_id", "text")
        .collect()
    )
    by_lang: dict[str, list[tuple[int, int, int]]] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(
            (r.n_chars, r.doc_id, len(_whitespace_tokens(r.text)))
        )
    expect = {}
    for lang, rows in by_lang.items():
        rows.sort()
        total = sum(w for _, _, w in rows)
        cum = 0
        med = None
        for nc, _, w in rows:
            cum += w
            if 2 * cum >= total:
                med = nc
                break
        expect[lang] = (total, med)

    got = registry()["xcn_weighted_median"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == len(expect)
    for r in got:
        total, med = expect[r.lang]
        assert (r.total_tokens, r.wmedian_nchars) == (total, med), r


def test_benford_matches_naive_digit_count(spark, sf_oracle):
    """xcs's integer-quantized observed shares must equal the naive
    first-digit tally: floor the double price in Python (same IEEE
    double), take the decimal head, quantize n*1e6 // total."""
    import math

    from dask_snowflake_spark.ext_queries import _BENFORD

    prices = [
        r.o_totalprice
        for r in _t(spark, sf_oracle)["orders"].select("o_totalprice").collect()
        if r.o_totalprice >= 1
    ]
    counts = {d: 0 for d in range(1, 10)}
    for p in prices:
        counts[int(str(math.floor(p))[0])] += 1
    total = sum(counts.values())

    got = registry()["xcs_benford_audit"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == 9
    for r in got:
        n = counts[r.digit]
        assert r.n == n, r
        assert r.obs_share == (n * 1_000_000 // total) / 1e6, r
        assert r.exp_share == _BENFORD[r.digit], r
        assert r.deviation == abs((n * 1_000_000 // total) / 1e6 - _BENFORD[r.digit]), r


def test_ewma_matches_naive_dyadic_fold(spark, sf_oracle):
    """xcu's 8-tap window sum must equal the naive per-day walk: daily
    revenue in integer cents (floor(v*100 + 0.5) per event, identical
    IEEE doubles), then num = sum(rev[i-k] * 2^(7-k)) over ROW lags."""
    import math

    ev = (
        _t(spark, sf_oracle)["events"]
        .filter(F.col("event_type") == "purchase")
        .select(F.col("ts").cast("date").alias("day"), "value")
        .collect()
    )
    daily: dict = {}
    for r in ev:
        daily[r.day] = daily.get(r.day, 0) + math.floor(r.value * 100 + 0.5)
    days = sorted(daily)
    expect = {}
    for i in range(7, len(days)):
        num = sum(daily[days[i - k]] * (1 << (7 - k)) for k in range(8))
        expect[days[i]] = (daily[days[i]], num)

    got = registry()["xcu_ewma_halflife"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == len(expect)
    for r in got:
        rev, num = expect[r.day]
        assert (r.rev_cents, r.ewma_num) == (rev, num), r
        assert r.ewma_cents == num / 256.0, r


def test_readability_matches_naive_flesch(spark, sf_oracle):
    """xcv's integer cross-multiplied Flesch must equal the naive
    per-doc computation: ASCII \\s+ word split (Java \\s semantics),
    [.!?]+ sentence split with SPACE-only trim (Spark/DuckDB trim
    strips 0x20 only — Python .strip() would disagree on newline-only
    fragments), vowel-group syllable proxy, magnitude+sign division."""
    import re

    docs = _t(spark, sf_oracle)["documents"].select("lang", "text").collect()
    agg: dict = {}
    for r in docs:
        text = r.text or ""
        w = max(1, len([x for x in re.split(r"\s+", text, flags=re.ASCII) if x != ""]))
        s = max(
            1,
            len([x for x in re.split(r"[.!?]+", text) if x.strip(" ") != ""]),
        )
        y = max(1, len(re.findall(r"[aeiouAEIOU]+", text)))
        num = 206835 * s * w - 1015 * w * w - 84600 * y * s
        den = 1000 * s * w
        fm = (num * 1000) // den if num >= 0 else -((-num * 1000) // den)
        nd, tw, ts_, fs = agg.get(r.lang, (0, 0, 0, 0))
        agg[r.lang] = (nd + 1, tw + w, ts_ + s, fs + fm)

    got = registry()["xcv_readability"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == len(agg)
    for r in got:
        nd, tw, ts_, fs = agg[r.lang]
        assert (r.n_docs, r.total_words, r.total_sentences) == (nd, tw, ts_), r
        mean = (fs // nd if fs >= 0 else -((-fs) // nd)) / 1000.0
        assert r.mean_flesch == mean, r


def test_ols_matches_naive_closed_form(spark, sf_oracle):
    """xce's exact-integer OLS sums must equal the naive per-segment
    regression: x = days since the segment's min date, y = floor(v*100)
    cents, slope/intercept as magnitude+sign integer divisions."""
    import math

    ev = (
        _t(spark, sf_oracle)["events"]
        .filter(F.col("value").isNotNull())
        .select("event_type", F.col("ts").cast("date").alias("d"), "value")
        .collect()
    )
    by_seg: dict = {}
    for r in ev:
        by_seg.setdefault(r.event_type, []).append((r.d, math.floor(r.value * 100)))
    expect = {}
    for seg, rows in by_seg.items():
        d0 = min(d for d, _ in rows)
        pts = [((d - d0).days, y) for d, y in rows]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            expect[seg] = (n, None, None, None, None)
            continue
        s_sign = (num > 0) - (num < 0)
        s_mag = abs(num) * 1000 // den
        in_num = sy * 1000 - s_sign * s_mag * sx
        i_sign = (in_num > 0) - (in_num < 0)
        i_mag = abs(in_num) // n
        expect[seg] = (n, s_sign, s_mag, i_sign, i_mag)

    got = registry()["xce_segment_trend_ols"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == len(expect)
    for r in got:
        assert (
            r.n,
            r.slope_sign,
            r.slope_mag_milli,
            r.intercept_sign,
            r.intercept_mag_milli,
        ) == expect[r.event_type], r


def test_bootstrap_ci_is_ordered_and_reproducible(spark, sf_oracle):
    """xcl sanity: the CI must bracket a value near the full-sample
    mean, bounds ordered, and the whole statistic bit-stable across
    two runs (hash-decided weights, no RNG)."""
    fn = registry()["xds_bootstrap_ci"].spark_fn
    a = fn(spark, sf_oracle).collect()[0]
    b = fn(spark, sf_oracle).collect()[0]
    assert a == b
    assert a.ci_lo <= a.ci_hi
    assert a.ci_lo <= a.mean_price * 1.05 and a.ci_hi >= a.mean_price * 0.95
    assert a.n_replicates == 64


def test_anomaly_zscore_matches_naive_trailing_window(spark, sf_oracle):
    """x37's exact-integer pipeline == a textbook trailing-window
    z-score computed independently in python over the collected fixture
    events: same cents quantization, same 20-row frame, same sample
    variance, same magnitude+sign 1e-4 floor."""
    import math

    ev = (
        _t(spark, sf_oracle)["events"]
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, rows in by_user.items():
        cents = [round(r.value * 100) for r in rows]
        for i, r in enumerate(rows):
            frame = cents[max(0, i - 20) : i]
            n = len(frame)
            if n < 5:
                continue
            s1, s2 = sum(frame), sum(c * c for c in frame)
            var_c = (s2 - s1 * s1 / (1.0 * n)) / (n - 1)
            if var_c <= 0:
                continue
            dev = cents[i] - s1 / (1.0 * n)
            zq = math.floor(abs(dev) / math.sqrt(var_c) * 10000)
            if zq > 30000:
                want[(uid, r.event_id)] = (
                    cents[i] / 100.0,
                    (s1 * 100) // n / 1e4,
                    (zq if dev >= 0 else -zq) / 1e4,
                )
    got = {
        (r.user_id, r.event_id): (r.value, r.trailing_mean, r.zscore)
        for r in registry()["x37_anomaly_zscore"].spark_fn(spark, sf_oracle).collect()
    }
    assert got == want and len(got) > 0


def test_profile_means_match_naive_quantized_mean(spark, sf_oracle):
    """x26's quantized-integer mean == the same formula in python over
    the collected column — and equals the true mean exactly for the
    2dp-valued money column."""
    rows = _t(spark, sf_oracle)["lineitem"].select("l_extendedprice").collect()
    vals = [r.l_extendedprice for r in rows]
    cents4 = sum(round(v * 10000) for v in vals)
    want = round(cents4 / (10000.0 * len(vals)), 4)
    got = {
        (r.column_name, r.metric): r.value
        for r in registry()["x26_column_profile"].spark_fn(spark, sf_oracle).collect()
    }
    assert got[("l_extendedprice", "mean")] == want


def test_geometric_dp_thresholds_match_formula():
    """The xd8 literal per-million thresholds must equal the geometric
    mechanism's inverse CDF at epsilon=1 (floor(cum * 1e6) over the
    0, +1, -1, +2, -2, ... enumeration) — pins regeneration of the
    literal table (the noise is only engine-exact because BOTH engines
    consume these literals; a silent re-derivation drift would change
    every released count). Also pins the documented tail: 67 per 1e6
    past |z| = 9, clamped to +10."""
    import math

    from dask_snowflake_spark.ext_queries import _GEOM_DP_CDF

    alpha = math.exp(-1.0)
    p0 = (1 - alpha) / (1 + alpha)
    seq = [0]
    for k in range(1, 10):
        seq += [k, -k]
    cum = 0.0
    want = []
    for z in seq:
        cum += p0 * (alpha ** abs(z))
        want.append((z, math.floor(cum * 1_000_000)))
    assert _GEOM_DP_CDF == want
    assert 1_000_000 - _GEOM_DP_CDF[-1][1] == 67


def test_xfb_conformal_interval_matches_python_replica(spark, sf_oracle):
    """xdb's split-conformal machinery == a literal python replica on
    the fixture: hash splits, train means (floor division), the exact
    ceil(0.9*(n_cal+1))-th order statistic with (resid, orderkey)
    tie-break, and held-out coverage counts."""
    import hashlib

    from dask_snowflake_spark.queries import _t, registry

    t = _t(spark, sf_oracle)
    orders = {
        r.o_orderkey: (r.o_custkey, round(r.o_totalprice * 100))
        for r in t["orders"].select("o_orderkey", "o_custkey", "o_totalprice").collect()
    }
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in t["customer"].select("c_custkey", "c_mktsegment").collect()
    }

    def bucket(k):
        return int(hashlib.md5(f"cp:{k}".encode()).hexdigest()[:15], 16) % 10

    train, cal, test = {}, {}, {}
    for ok, (ck, cents) in orders.items():
        s, h = seg[ck], bucket(ok)
        d = train if h < 6 else cal if h in (6, 7) else test
        d.setdefault(s, []).append((ok, cents))
    want = {}
    for s in sorted(train):
        tr, ca, te = train[s], cal[s], test[s]
        mu = sum(c for _, c in tr) // len(tr)
        resids = sorted((abs(c - mu), ok) for ok, c in ca)
        k = min((9 * (len(ca) + 1) + 9) // 10, len(ca))
        qv = resids[k - 1][0]
        cov = sum(1 for _, c in te if abs(c - mu) <= qv)
        want[s] = (len(tr), len(ca), len(te), mu, qv, cov,
                   (cov * 1_000_000 // max(len(te), 1)) / 1e6,
                   cov * 10 >= len(te) * 8)
    got = {
        r.segment: (r.n_train, r.n_cal, r.n_test, r.mu_cents, r.q_cents,
                    r.n_covered, r.coverage, r.coverage_ok)
        for r in registry()["xfb_conformal_interval"].spark_fn(spark, sf_oracle).collect()
    }
    assert got == want


def test_ndcg_weights_match_formula():
    """xdc's literal positional discounts must equal
    floor(1e9 / log2(rank + 1)) for ranks 1..10 — pins regeneration of
    the literal table both engines consume (no query-time logarithms)."""
    import math

    from dask_snowflake_spark.ext_queries import _NDCG_W

    assert _NDCG_W == [
        math.floor(1_000_000_000 / math.log2(i + 1)) for i in range(1, 11)
    ]
    assert len(_NDCG_W) == 10 and _NDCG_W[0] == 1_000_000_000


def test_cuped_readout_matches_python_replica(spark, sf_oracle):
    """xdd's CUPED machinery == a literal python replica: hash arms,
    per-user floor-dollar pre/post sums, pooled theta from exact
    integer sums, per-arm adjusted means computed in the identical
    expression order (doubles must match EXACTLY — every operation is
    correctly rounded over exact integers on all three evaluators)."""
    import hashlib
    import math

    from dask_snowflake_spark.queries import _t, registry

    ev = _t(spark, sf_oracle)["events"]
    per = {}
    for r in ev.select("user_id", "event_type", "ts", "value").collect():
        u = per.setdefault(r.user_id, [0, 0])
        if r.event_type == "purchase" and r.value is not None:
            d = r.ts.day
            u[0 if d <= 15 else 1] += math.floor(r.value)
    arm = lambda u: "A" if int(hashlib.md5(f"cuped:{u}".encode()).hexdigest()[:15], 16) % 2 == 0 else "B"
    nn = len(per)
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    sxy = sum(x * y for x, y in per.values())
    sxx = sum(x * x for x, _ in per.values())
    syy = sum(y * y for _, y in per.values())
    c_num, d_den, y_den = nn * sxy - sx * sy, nn * sxx - sx * sx, nn * syy - sy * sy
    want = {}
    for a in ("A", "B"):
        us = [v for u, v in per.items() if arm(u) == a]
        n_a = len(us)
        sx_a, sy_a = sum(x for x, _ in us), sum(y for _, y in us)
        mean_y = sy_a / n_a
        theta = c_num / d_den
        adj = mean_y - theta * (sx_a / n_a - sx / nn)
        want[a] = (n_a, sx_a, sy_a, mean_y, adj, theta, theta * (c_num / y_den))
    got = {
        r.arm: (r.n_users, r.sx_a, r.sy_a, r.mean_y, r.adjusted_mean_y,
                r.theta, r.var_reduction)
        for r in registry()["xdd_cuped_ab_readout"].spark_fn(spark, sf_oracle).collect()
    }
    assert got == want
    # CUPED must actually reduce variance on this fixture (theta != 0)
    assert all(v[6] > 0 for v in want.values())


def test_rbo_weights_match_formula():
    """xdn's literal RBO tables must equal the exact integer formula:
    W[d] = floor((1-p) p^(d-1) / d * 1e12) at p = 0.9, computed as
    9^(d-1) * 1e12 // (d * 10^d) in exact integer arithmetic; SW = the
    suffix sums; MAXQ = sum(d * W[d]) (overlap_d = d at every depth)."""
    from dask_snowflake_spark.ext_queries import _RBO_MAXQ, _RBO_SW, _RBO_W

    want_w = [(9 ** (d - 1) * 10**12) // (d * 10**d) for d in range(1, 11)]
    assert _RBO_W == want_w
    assert _RBO_SW == [sum(want_w[m - 1 :]) for m in range(1, 11)]
    assert _RBO_MAXQ == sum(d * w for d, w in enumerate(want_w, 1))
    # identical rankings on >= 10 items give exactly rbo_q == MAXQ
    # (overlap_d == d at every depth), i.e. rbo_norm == 1.0
    assert sum(_RBO_SW) == _RBO_MAXQ


def test_spearman_matches_python_replica(spark, sf_oracle):
    """xdo's centered-doubled-rank Spearman == a float python replica
    (average ranks, Pearson-on-ranks) on the fixture, floor-quantized
    at 1e-6 — a formula bug mirrored into the oracle would pass the
    hash gate, so the replica is the independent check."""
    import math

    from dask_snowflake_spark.queries import _t, registry

    ev = _t(spark, sf_oracle)["events"]
    rows = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        )
        .collect()
    )
    xs = [r.x for r in rows]
    ys = [r.y for r in rows]

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            r = (i + j + 2) / 2
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    want = math.floor(num / den * 1_000_000) / 1e6

    got = registry()["spearman_rank_corr"].spark_fn(spark, sf_oracle).collect()[0]
    assert got.n == n
    # the replica runs in floats, so its quantized value may sit one
    # 1e-6 step away from the exact-integer engine value at a floor
    # boundary; equality within one step plus the exact-n check is the
    # formula pin
    assert abs(got.spearman_rho - want) <= 1e-6 + 1e-12, (got.spearman_rho, want)


def test_power_iteration_matches_python_replica(spark, sf_oracle):
    """xdp's exact-integer power iteration == an independent python
    replica over the same parquet (numpy float32 components, python
    big-int arithmetic): the oracle mirrors the engine expressions, so
    only an out-of-band replica can catch a mirrored math bug. Also
    asserts the iterate is genuinely nonzero (mechanism ran)."""
    import math
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from dask_snowflake_spark.queries import registry

    tbl = pq.read_table(os.path.join(sf_oracle, "embeddings.parquet"))
    embs = [np.asarray(e, dtype=np.float32) for e in tbl["embedding"].to_pylist()]
    dim = 64
    vq = [1_000_000] * dim
    for _ in range(5):
        wq = [0] * dim
        for e in embs:
            dq = sum(math.floor(float(e[d]) * vq[d]) for d in range(dim))
            for d in range(dim):
                wq[d] += math.floor(float(e[d]) * dq)
        M = max(max(abs(q) for q in wq), 1)
        G = max(M // 10**12, 1)
        den = max(M // G, 1)
        vq = [(1 if q >= 0 else -1) * (((abs(q) // G) * 1_000_000) // den) for q in wq]

    got = registry()["pca_power_iteration"].spark_fn(spark, sf_oracle).collect()
    assert [(r.pos, r.vq, r.wq) for r in got] == [
        (d, vq[d], wq[d]) for d in range(dim)
    ]
    assert any(v != 0 for v in vq)


def test_roc_auc_matches_python_replica(spark, sf_oracle):
    """xdv's doubled-rank Mann-Whitney AUC == an exact python-int
    replica (average ranks computed from scratch, U from the rank-sum
    identity) per segment — the oracle mirrors the engine's rank
    expression, so only an out-of-band replica can catch a mirrored
    formula bug. Exact equality: both sides are integer arithmetic."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c.c_mktsegment,
               CAST(round(o.o_totalprice * 100) AS BIGINT),
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        FROM '{sf_oracle}/orders.parquet' o
        JOIN '{sf_oracle}/customer.parquet' c ON c.c_custkey = o.o_custkey
        """
    ).fetchall()
    by_seg = {}
    for seg, score, pos in rows:
        by_seg.setdefault(seg, []).append((score, pos))
    want = {}
    for seg, sp in by_seg.items():
        sp.sort()
        n = len(sp)
        # doubled average rank per row: walk tie runs over the sorted
        # scores; run [i, j] (0-based) has avg rank (i+j+2)/2 -> doubled
        # = i + j + 2 — an exact int
        r2_pos = 0
        n_pos = sum(p for _, p in sp)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and sp[j + 1][0] == sp[i][0]:
                j += 1
            d2 = i + j + 2
            for k in range(i, j + 1):
                if sp[k][1] == 1:
                    r2_pos += d2
            i = j + 1
        n_neg = n - n_pos
        u2 = r2_pos - n_pos * (n_pos + 1)
        # G-shrink guard mirrors the engine pair (exact when g == 1,
        # which holds far past the fixture scale)
        g = max(u2 // 10**12, 1)
        auc = (
            ((u2 // g) * 1_000_000 // max((2 * n_pos * n_neg) // g, 1)) / 1e6
            if n_pos and n_neg
            else 0.0
        )
        want[seg] = (n_pos, n_neg, u2, auc)

    got = registry()["roc_auc_eval"].spark_fn(spark, sf_oracle).collect()
    assert {r.segment: (r.n_pos, r.n_neg, r.u2, r.auc) for r in got} == want
    # and the metric is informative on this fixture: some segment's AUC
    # must differ from coin-flip 0.5 by a visible margin or the query
    # proves nothing
    assert any(abs(v[3] - 0.5) > 1e-4 for v in want.values())


def test_seasonal_dow_matches_python_replica(spark, sf_oracle):
    """xdy's windowed integer detrend == a from-scratch python replay
    (daily sums -> dense day spine -> centered 7-day MA -> per-dow
    means) — exact integer equality, no tolerance."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    daily = dict(
        con.execute(
            f"""
            SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            FROM '{sf_oracle}/events.parquet' WHERE event_type = 'purchase'
            GROUP BY 1
            """
        ).fetchall()
    )
    dmin, dmax = min(daily), max(daily)
    cents = {d: daily.get(d, 0) for d in range(dmin, dmax + 1)}
    per_dow = {}
    for d in range(dmin + 3, dmax - 2):
        ma7 = sum(cents[x] for x in range(d - 3, d + 4))
        dow = d % 7
        n, rev, det = per_dow.get(dow, (0, 0, 0))
        per_dow[dow] = (n + 1, rev + cents[d], det + 7 * cents[d] - ma7)
    total = sum(v[1] for v in per_dow.values())

    def q(num, den):
        # BIGINT truncating division, python-exact for signed ints
        s = -1 if (num < 0) != (den < 0) else 1
        return s * (abs(num) * 1_000_000 // abs(den)) / 1e6

    want = {
        dow: (n, rev, (rev * 1_000_000 // total) / 1e6 if total else 0.0,
              q(det, 7 * n))
        for dow, (n, rev, det) in per_dow.items()
    }
    got = {
        r.dow: (r.n_days, r.revenue_cents, r.revenue_share, r.mean_detrended_cents)
        for r in registry()["xdy_seasonal_dow_profile"].spark_fn(spark, sf_oracle).collect()
    }
    assert got == want
    # the profile must cover all 7 weekdays on this fixture or the
    # decomposition proves nothing
    assert len(got) == 7


def test_lang_confusion_matches_python_replica(spark, sf_oracle):
    """xdz's confusion/kappa rollup == a from-scratch python replica
    including the stopword-argmax language ID itself — the oracle
    shares the scoring SQL by necessity, so the replica is the
    independent layer for BOTH the classifier and the metrics."""
    import duckdb

    from dask_snowflake_spark.operators.text import LANG_PROFILES
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    profs = {k: set(v) for k, v in LANG_PROFILES.items()}
    cm = {}
    for lang, text in rows:
        words = [w for w in text.strip().lower().split() if w]
        scores = {
            k: sum(1 for w in words if w in p) for k, p in sorted(profs.items())
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        # max() keeps the FIRST maximal key of the sorted order — the
        # lexicographic tie-break the operator pins
        det = best if scores[best] > 0 else "unknown"
        cm[(lang, det)] = cm.get((lang, det), 0) + 1
    classes = sorted(
        {l for l, _ in cm} | {d for _, d in cm}
    )
    lab = {c: sum(v for (l, _), v in cm.items() if l == c) for c in classes}
    det_n = {c: sum(v for (_, d), v in cm.items() if d == c) for c in classes}
    tp = {c: cm.get((c, c), 0) for c in classes}
    n = sum(lab.values())
    agree = sum(tp.values())
    pe = sum(lab[c] * det_n[c] for c in classes)

    def q(num, den):
        s = -1 if (num < 0) != (den < 0) else 1
        return s * (abs(num) * 1_000_000 // abs(den)) / 1e6 if den else 0.0

    got = registry()["xdz_lang_confusion_eval"].spark_fn(spark, sf_oracle).collect()
    assert [r.cls for r in got] == classes
    for r in got:
        c = r.cls
        assert (r.lab_n, r.det_n, r.tp) == (lab[c], det_n[c], tp[c])
        assert r.precision_q == q(tp[c], det_n[c])
        assert r.recall_q == q(tp[c], lab[c])
        assert r.f1_q == q(2 * tp[c], det_n[c] + lab[c])
        assert r.accuracy_q == q(agree, n)
        assert r.kappa_q == (q(n * agree - pe, n * n - pe) if n * n != pe else 0.0)
    # informative on this fixture: the heuristic must beat chance (the
    # synthetic corpus carries few real stopwords, so kappa is LOW —
    # the eval exposing a weak classifier is the metric working; it
    # still must be positive and accuracy must beat the 1-in-5 prior)
    assert got[0].kappa_q > 0
    assert got[0].accuracy_q > 0.2


def test_cdc_chunking_matches_python_replica(spark, sf_oracle):
    """xe0's boundary->islands->dedup pipeline == a from-scratch python
    replay (md5 gram hashes, cut positions, chunk md5s, byte rollup) —
    the oracle necessarily mirrors the boundary hash, so the replica
    is the independent layer. Exact integer equality."""
    import duckdb
    import hashlib

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()

    def phash(sv: str) -> int:
        return int(hashlib.md5(f"0:{sv}".encode()).hexdigest()[:15], 16)

    per = {}
    for _, text in rows:
        n = len(text)
        cuts = sorted(
            {
                p
                for p in range(1, max(n - 7, 1) + 1)
                if phash(text[p - 1 : p - 1 + 8]) % 64 == 0
            }
            | {n}
        )
        prev = 0
        for e in cuts:
            chunk = text[prev:e]
            h = hashlib.md5(chunk.encode()).hexdigest()
            cnt, clen = per.get(h, (0, len(chunk)))
            per[h] = (cnt + 1, clen)
            prev = e
    total_chunks = sum(c for c, _ in per.values())
    distinct_chunks = len(per)
    total_bytes = sum(c * l for c, l in per.values())
    distinct_bytes = sum(l for _, l in per.values())

    got = registry()["content_defined_chunks"].spark_fn(spark, sf_oracle).collect()[0]
    assert (
        got.total_chunks,
        got.distinct_chunks,
        got.total_bytes,
        got.distinct_bytes,
    ) == (total_chunks, distinct_chunks, total_bytes, distinct_bytes)
    assert got.byte_dedup_ratio == (distinct_bytes * 1_000_000 // total_bytes) / 1e6
    assert got.mean_chunk_len == (total_bytes * 1_000_000 // total_chunks) / 1e6
    # informative: chunking must actually cut (more chunks than docs)
    # — expected cut rate is 1/64 per position on ~250-char docs
    assert total_chunks > len(rows)


def test_cluster_silhouette_matches_python_replica(spark, sf_oracle):
    """cluster_silhouette (ex-xe1): integer silhouette == a from-scratch python-int replica
    (milli-unit quantization, integer-div centroids, exact squared
    distances, magnitude+sign quantization) — the oracle mirrors the
    engine expressions. Exact equality."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_oracle}/embeddings.parquet'"
    ).fetchall()
    vecs = {
        vid: (lab, [math.floor(float(x) * 1000) for x in emb])
        for vid, lab, emb in rows
    }
    labels = sorted({lab for lab, _ in vecs.values()})
    dim = len(next(iter(vecs.values()))[1])
    cents = {}
    for lab in labels:
        members = [v for l, v in vecs.values() if l == lab]
        cents[lab] = [
            _trunc_div(sum(m[i] for m in members), len(members))
            for i in range(dim)
        ]
    per_label = {}
    for vid, (lab, v) in vecs.items():
        d2 = {
            cl: sum((a - b) * (a - b) for a, b in zip(v, c))
            for cl, c in cents.items()
        }
        a = d2[lab]
        b = min(d for cl, d in d2.items() if cl != lab)
        den = max(a, b)
        s_q = 0 if den == 0 else (-1 if b < a else 1) * (abs(b - a) * 1_000_000 // den)
        n, npos, ssum = per_label.get(lab, (0, 0, 0))
        per_label[lab] = (n + 1, npos + (1 if s_q > 0 else 0), ssum + s_q)

    got = registry()["cluster_silhouette"].spark_fn(spark, sf_oracle).collect()
    assert [r.label for r in got] == labels
    for r in got:
        n, npos, ssum = per_label[r.label]
        assert (r.n_vecs, r.n_well_separated) == (n, npos)
        want_ms = (-1 if ssum < 0 else 1) * (abs(ssum) // n) / 1e6
        assert r.mean_silhouette == want_ms, (r.label, r.mean_silhouette, want_ms)


def _trunc_div(num: int, den: int) -> int:
    """BIGINT truncating division (toward zero), python-exact."""
    s = -1 if (num < 0) != (den < 0) else 1
    return s * (abs(num) // abs(den))


def test_markov_removal_matches_python_replica(spark, sf_oracle):
    """xe2's journey -> transition -> bounded-absorption pipeline == a
    from-scratch python-int replica (journeys rebuilt from raw events,
    8 synchronous rounds of the integer recursion per removal variant)
    — the oracle mirrors the whole recursion, so the replica is the
    only independent check. Exact equality."""
    import duckdb

    from dask_snowflake_spark.ext_queries import _MARKOV_CHANNELS, _MARKOV_SCALE
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_type FROM '{sf_oracle}/events.parquet'
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    journeys = {}
    for uid, et in rows:
        journeys.setdefault(uid, []).append(et)
    trans = {}
    for seq in journeys.values():
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
            states = ["START"] + seq
        else:
            states = ["START"] + seq + ["NULL"]
        for a, b in zip(states, states[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    tot = {}
    for (a, _), c in trans.items():
        tot[a] = tot.get(a, 0) + c
    chans = _MARKOV_CHANNELS
    sc = _MARKOV_SCALE
    states = ["START"] + list(chans)

    def absorb(removed):
        p = {s: 0 for s in states}
        for _ in range(8):
            p_new = {}
            for s in states:
                if s == removed or s not in tot:
                    p_new[s] = 0
                    continue
                num = sum(
                    trans.get((s, c2), 0) * p[c2]
                    for c2 in chans
                    if c2 != removed
                ) + trans.get((s, "purchase"), 0) * sc
                p_new[s] = num // tot[s]
            p = p_new
        return p["START"]

    p_base = absorb(None)
    effects = {c: p_base - absorb(c) for c in chans}
    eff_sum = sum(effects.values())

    got = registry()["attribution_markov"].spark_fn(
        spark, sf_oracle
    ).collect()
    assert [r.channel for r in got] == sorted(chans)
    for r in got:
        assert r.p_conv_base == p_base / 1e9
        assert r.p_conv_removed == (p_base - effects[r.channel]) / 1e9
        assert r.effect_q == effects[r.channel]
        want_share = (
            (effects[r.channel] * 1_000_000 // eff_sum) / 1e6 if eff_sum else 0.0
        )
        assert r.attribution_share == want_share
    # informative: removing a channel must hurt (strictly positive
    # effects for at least one channel) and never help (non-negative)
    assert all(e >= 0 for e in effects.values())
    assert eff_sum > 0


def test_average_precision_matches_python_replica(spark, sf_oracle):
    """xe3's windowed AP == a from-scratch python-int replica (sort by
    (score DESC, orderkey), walk cumulative positives, nano-quantized
    precision terms). Exact equality."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c.c_mktsegment, o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT),
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        FROM '{sf_oracle}/orders.parquet' o
        JOIN '{sf_oracle}/customer.parquet' c ON c.c_custkey = o.o_custkey
        """
    ).fetchall()
    by_seg = {}
    for seg, okey, score, pos in rows:
        by_seg.setdefault(seg, []).append((-score, okey, pos))
    want = {}
    for seg, sp in by_seg.items():
        sp.sort()
        cum, num, npos = 0, 0, 0
        for rk, (_, _, pos) in enumerate(sp, start=1):
            cum += pos
            if pos:
                npos += 1
                num += cum * 1_000_000_000 // rk
        want[seg] = (npos, num, (num // npos) / 1e9 if npos else 0.0)

    got = registry()["xe3_average_precision"].spark_fn(spark, sf_oracle).collect()
    assert {r.segment: (r.n_pos, r.ap_num_q, r.average_precision) for r in got} == want
    # AP of a weak-signal ranking should sit near the positive base
    # rate, not at 0 or 1 — sanity that the metric is live
    assert all(0.05 < v[2] < 0.95 for v in want.values())


def test_mann_kendall_matches_python_replica(spark, sf_oracle):
    """xe4's pair-join S / tie-corrected var18 / z == a from-scratch
    python replica (O(n^2) sign walk per type, python-int variance,
    float z floor-quantized). Exact equality on the integers; the z
    float is the same fixed expression over identical integers."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        FROM '{sf_oracle}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, _, cents in rows:
        series.setdefault(et, []).append(cents)
    want = {}
    for et, xs in series.items():
        n = len(xs)
        s_stat = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = {}
        for x in xs:
            ties[x] = ties.get(x, 0) + 1
        corr = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - corr
        if var18 == 0 or s_stat == 0:
            z = 0.0
        else:
            mag = (abs(s_stat) - 1) * math.sqrt(18.0) / math.sqrt(float(var18))
            z = (-1 if s_stat < 0 else 1) * math.floor(mag * 1_000_000) / 1e6
        sig = var18 > 0 and (abs(s_stat) - 1) ** 2 * 180000 > var18 * 38416
        trend = "up" if sig and s_stat > 0 else ("down" if sig and s_stat < 0 else "none")
        want[et] = (n, s_stat, var18, z, trend)

    got = registry()["xe4_mann_kendall_trend"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.event_type: (r.n_days, r.s_stat, r.var18, r.z_q, r.trend) for r in got
    } == want


def test_dbscan_matches_python_replica(spark, sf_oracle):
    """xe5's full DBSCAN pipeline == a from-scratch python replica
    (quantize, label-cell pair scan, core threshold, union-find CC
    over core-core edges, min-cluster border rule, noise). Exact
    per-cluster rollup equality."""
    import duckdb
    import math

    from dask_snowflake_spark.ext_queries import _DBSCAN_EPS2, _DBSCAN_MIN_NBRS
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_oracle}/embeddings.parquet'"
    ).fetchall()
    pts = {
        vid: (lab, [math.floor(float(x) * 1000) for x in emb])
        for vid, lab, emb in rows
    }
    by_lab = {}
    for vid, (lab, _) in pts.items():
        by_lab.setdefault(lab, []).append(vid)
    nbrs = {v: set() for v in pts}
    for lab, vs in by_lab.items():
        vs = sorted(vs)
        for i, a in enumerate(vs):
            va = pts[a][1]
            for bb in vs[i + 1 :]:
                vb = pts[bb][1]
                if sum((x - y) * (x - y) for x, y in zip(va, vb)) <= _DBSCAN_EPS2:
                    nbrs[a].add(bb)
                    nbrs[bb].add(a)
    core = {v for v in pts if len(nbrs[v]) >= _DBSCAN_MIN_NBRS}
    parent = {v: v for v in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for bb in nbrs[a]:
            if bb in core:
                ra, rb = find(a), find(bb)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id cluster labels
    cl = {}
    for v in core:
        r = find(v)
        cl.setdefault(r, []).append(v)
    core_cl = {}
    for r, members in cl.items():
        m = min(members)
        for v in members:
            core_cl[v] = m
    rollup = {}
    for v in pts:
        if v in core:
            key, role = core_cl[v], "core"
        else:
            cn = [core_cl[q2] for q2 in nbrs[v] if q2 in core]
            if cn:
                key, role = min(cn), "border"
            else:
                key, role = -1, "noise"
        c, b, n = rollup.get(key, (0, 0, 0))
        rollup[key] = (
            c + (role == "core"),
            b + (role == "border"),
            n + 1,
        )

    got = registry()["dbscan_embeddings"].spark_fn(spark, sf_oracle).collect()
    assert {r.cluster: (r.n_core, r.n_border, r.n_points) for r in got} == rollup
    # informative: real density structure — several clusters AND noise
    assert len(rollup) > 5 and -1 in rollup and rollup[-1][2] > 0


def test_seasonal_naive_mase_matches_python_replica(spark, sf_oracle):
    """xe6's windowed MASE/sMAPE == a from-scratch python-int replay
    (dense spine, lag walks, integer cross-mult ratios). Exact."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            FROM '{sf_oracle}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series = {}
    for et, d, c in rows:
        series.setdefault(et, {})[d] = c
    want = {}
    for et, daily in series.items():
        dmin, dmax = min(daily), max(daily)
        xs = [daily.get(d, 0) for d in range(dmin, dmax + 1)]
        n = len(xs)
        # r12 ADVICE fix: a test row only counts when its seasonal lag
        # exists (c7 defined <=> i >= 7 on the dense spine) — otherwise
        # n_test deflates MAE/sMAPE on sub-21-day series (and python's
        # xs[i-7] would wrap negatively here)
        test_idx = [i for i in range(n) if i + 1 > n - 14 and i >= 7]
        den_idx = [i for i in range(n) if 2 <= i + 1 <= n - 14]
        sum_test = sum(abs(xs[i] - xs[i - 7]) for i in test_idx)
        sum_den = sum(abs(xs[i] - xs[i - 1]) for i in den_idx)
        n_test, n_den = len(test_idx), len(den_idx)
        smape_sum = sum(
            0
            if abs(xs[i] - xs[i - 7]) == 0
            else 2 * abs(xs[i] - xs[i - 7]) * 1_000_000 // (abs(xs[i - 7]) + abs(xs[i]))
            for i in test_idx
        )
        mase = (
            (sum_test * n_den * 1_000_000 // (sum_den * n_test)) / 1e6
            if sum_den and n_test
            else 0.0
        )
        want[et] = (
            n_test,
            sum_test,
            n_den,
            sum_den,
            (sum_test // n_test) / 100.0 if n_test else 0.0,
            mase,
            (smape_sum // n_test) / 1e6 if n_test else 0.0,
        )
    got = registry()["xe6_seasonal_naive_mase"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.event_type: (
            r.n_test,
            r.sum_test_abs,
            r.n_den,
            r.sum_den_abs,
            r.mae_seasonal_dollars,
            r.mase,
            r.smape,
        )
        for r in got
    } == want


def test_calibration_ece_matches_python_replica(spark, sf_oracle):
    """xe7's split/boundary/bin/ECE chain == a from-scratch python-int
    replica (md5 split, exact order-statistic deciles, tie-to-lower
    binning, integer ECE). Exact."""
    import duckdb
    import hashlib

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT),
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            FROM '{sf_oracle}/orders.parquet'"""
    ).fetchall()
    train, test = [], []
    for okey, score, pos in rows:
        bkt = int(hashlib.md5(f"split:{okey}".encode()).hexdigest()[:15], 16) % 1_000_000
        (train if bkt < 800_000 else test).append((score, okey, pos))
    train.sort()
    n = len(train)
    bounds = []
    for k in range(1, 10):
        # max score among ranks rn with rn*10 <= n*k
        top = n * k // 10
        bounds.append(train[top - 1][0] if top >= 1 else None)

    def bin_of(score):
        return 1 + sum(1 for b in bounds if b is not None and b < score)

    tr_stats, te_stats = {}, {}
    for score, _, pos in train:
        b = bin_of(score)
        nb, pb = tr_stats.get(b, (0, 0))
        tr_stats[b] = (nb + 1, pb + pos)
    for score, _, pos in test:
        b = bin_of(score)
        nb, pb = te_stats.get(b, (0, 0))
        te_stats[b] = (nb + 1, pb + pos)
    num, den = 0, 0
    rows_want = {}
    for b in sorted(te_stats):
        n_te, p_te = te_stats[b]
        n_tr, p_tr = tr_stats.get(b, (0, 0))
        conf_q = p_tr * 1_000_000 // n_tr if n_tr else 0
        acc_q = p_te * 1_000_000 // n_te
        num += n_te * abs(acc_q - conf_q)
        den += n_te
        rows_want[b] = (n_tr, n_te, conf_q / 1e6, acc_q / 1e6)
    ece = (num // den) / 1e6

    got = registry()["calibration_ece"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.bin: (r.n_train, r.n_test, r.confidence, r.accuracy) for r in got
    } == rows_want
    assert all(r.ece == ece for r in got)


def test_ks_drift_matches_python_replica(spark, sf_oracle):
    """xfr_ks_drift (ex-xec): window-cumsum KS == a from-scratch python-int replica
    (global min day, per-type sorted distinct-cents ECDF walk, exact
    BIGINT supremum, one quantized division; float only in the fixed
    critical-value expression over identical integers)."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT),
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        FROM '{sf_oracle}/events.parquet'
        """
    ).fetchall()
    dmin = min(r[2] for r in rows)
    per_type = {}
    for et, cents, day in rows:
        half = 1 if day < dmin + 15 else 2
        c1, c2 = per_type.setdefault(et, {}).get(cents, (0, 0))
        per_type[et][cents] = (c1 + (half == 1), c2 + (half == 2))
    want = {}
    for et, by_cents in per_type.items():
        n1 = sum(c1 for c1, _ in by_cents.values())
        n2 = sum(c2 for _, c2 in by_cents.values())
        f1 = f2 = d_num = 0
        for cents in sorted(by_cents):
            c1, c2 = by_cents[cents]
            f1, f2 = f1 + c1, f2 + c2
            d_num = max(d_num, abs(f1 * n2 - f2 * n1))
        if n1 == 0 or n2 == 0:
            ks, crit, drift = 0.0, 0.0, False
        else:
            ks_q = d_num * 1_000_000 // (n1 * n2)
            crit_q = math.floor(
                1358 * math.sqrt((n1 + n2) * 1.0 / (n1 * n2)) * 1000
            )
            ks, crit, drift = ks_q / 1e6, crit_q / 1e6, ks_q > crit_q
        want[et] = (n1, n2, d_num, ks, crit, drift)

    got = registry()["xfr_ks_drift"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.event_type: (r.n1, r.n2, r.d_num, r.ks_stat, r.crit_05, r.drifted)
        for r in got
    } == want
    # both halves populated for every type — the split is live
    assert all(v[0] > 0 and v[1] > 0 for v in want.values())


def test_chi2_cramers_v_matches_python_replica(spark, sf_oracle):
    """xed's margin-spine chi-square == a from-scratch python replica
    (full seg x pri spine incl. zero cells, exact BIGINT deviations,
    per-cell floor-quantized term in the identical fixed expression
    order, integer term sum, quantized V)."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c.c_mktsegment, o.o_orderpriority, CAST(count(*) AS BIGINT)
        FROM '{sf_oracle}/orders.parquet' o
        JOIN '{sf_oracle}/customer.parquet' c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
        """
    ).fetchall()
    cells = {(s, p): o for s, p, o in rows}
    rm, cm = {}, {}
    for (s, p), o in cells.items():
        rm[s] = rm.get(s, 0) + o
        cm[p] = cm.get(p, 0) + o
    n = sum(cells.values())
    chi2_q = 0
    for s, r in rm.items():
        for p, c in cm.items():
            o = cells.get((s, p), 0)
            d = float(o * n - r * c)
            chi2_q += math.floor(d * d / ((float(n) * r) * c) * 1_000_000)
    k1, k2 = len(rm), len(cm)
    v_q = math.floor(
        math.sqrt((chi2_q / 1e6) / (float(n) * min(k1 - 1, k2 - 1))) * 1_000_000
    )

    got = registry()["chi2_cramers_v"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == 1
    r0 = got[0]
    assert (
        r0.n_total,
        r0.k_segments,
        r0.k_priorities,
        r0.chi2_q,
        r0.chi2,
        r0.cramers_v,
    ) == (n, k1, k2, chi2_q, chi2_q / 1e6, v_q / 1e6)
    # association strength is a real 0..1 value on this data
    assert 0.0 <= r0.cramers_v < 1.0


def test_acf_ljung_box_matches_python_replica(spark, sf_oracle):
    """xee's window-chain ACF == a from-scratch python-int replica
    (zero-filled day spine, exact y = n*x - S centering, G-shrink
    quantized divisions with toward-zero truncation, integer
    Ljung-Box terms). Exact equality everywhere."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    def tdiv(a, b):
        # toward-zero integer division (Spark div / DuckDB BIGINT //)
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
               CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
        FROM '{sf_oracle}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    daily = {}
    for et, d, dol in rows:
        daily.setdefault(et, {})[d] = dol
    want = []
    for et in sorted(daily):
        by_day = daily[et]
        days = range(min(by_day), max(by_day) + 1)
        xs = [by_day.get(d, 0) for d in days]
        n, s = len(xs), sum(xs)
        ys = [n * x - s for x in xs]
        den = sum(y * y for y in ys)
        g = max(den // 10**12, 1)
        acfs, qsum = [], 0
        for k in range(1, 8):
            num = sum(ys[i] * ys[i - k] for i in range(k, n))
            aq = 0 if den == 0 else tdiv(tdiv(num, g) * 10**6, max(den // g, 1))
            acfs.append(aq)
            if n > k:
                qsum += aq * aq // (n - k)
        q_q = n * (n + 2) * qsum
        for k in range(1, 8):
            want.append(
                (et, k, n, acfs[k - 1] / 1e6, q_q / 1e12, q_q > 14067140449340)
            )

    got = registry()["acf_ljung_box"].spark_fn(spark, sf_oracle).collect()
    assert [
        (r.event_type, r.lag, r.n_days, r.acf, r.lb_q, r.autocorrelated)
        for r in got
    ] == want
    # the metric is live: some lag shows non-trivial autocorrelation
    assert any(abs(w[3]) > 0.01 for w in want)


def test_rfm_segments_matches_python_replica(spark, sf_oracle):
    """xfq_rfm_segments (ex-xef): histogram-boundary RFM == a from-scratch python replica
    (sorted-values order statistics with the 5*cum >= n*k tie-to-lower
    rule, CASE-order class mapping, integer-division averages)."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey, max(o_orderdate), CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '{sf_oracle}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    gmax = max(r[1] for r in rows)
    cust = [((gmax - last).days, freq, mon) for _, last, freq, mon in rows]

    def quintile_bounds(vals):
        vs = sorted(vals)
        n = len(vs)
        return [
            next(v for i, v in enumerate(vs) if 5 * (i + 1) >= n * k)
            for k in range(1, 5)
        ]

    rb = quintile_bounds([c[0] for c in cust])
    fb = quintile_bounds([c[1] for c in cust])
    mb = quintile_bounds([c[2] for c in cust])

    def bin_of(v, bounds):
        return 1 + sum(1 for b in bounds if v > b)

    agg = {}
    for rec, freq, mon in cust:
        rs = 6 - bin_of(rec, rb)
        fs = bin_of(freq, fb)
        if rs >= 4 and fs >= 4:
            cls = "champions"
        elif fs >= 4:
            cls = "loyal"
        elif rs <= 2 and fs >= 3:
            cls = "at_risk"
        elif rs <= 2:
            cls = "hibernating"
        elif rs >= 4:
            cls = "recent"
        else:
            cls = "regular"
        n, srs, sf, sm, sr = agg.get(cls, (0, 0, 0, 0, 0))
        agg[cls] = (n + 1, srs + rs, sf + freq, sm + mon, sr + rec)
    want = {
        cls: (
            n,
            (srs * 1_000_000 // n) / 1e6,
            (sf * 1_000_000 // n) / 1e6,
            sm // (100 * n),
            sr // n,
        )
        for cls, (n, srs, sf, sm, sr) in agg.items()
    }

    got = registry()["xfq_rfm_segments"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.segment_class: (
            r.n_customers,
            r.avg_r_score,
            r.avg_freq,
            r.avg_monetary_dollars,
            r.avg_recency_days,
        )
        for r in got
    } == want
    # the quintile split is live: all six declared classes appear
    assert set(want) == {
        "champions", "loyal", "at_risk", "hibernating", "recent", "regular"
    }


def test_shapley_attribution_matches_python_replica(spark, sf_oracle):
    """xeg's lattice Shapley == a from-scratch python replica (bitmask
    exposure sets, quantized exact-set rates, subset-sum w, factorial
    weights, division by 4!). Exact equality + the efficiency
    invariant sum(phi_num) == 24*(w(N) - w(0))."""
    import duckdb
    from math import factorial

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id,
               CAST(COALESCE(sum(DISTINCT CASE event_type
                    WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                    ELSE 0 END), 0) AS BIGINT),
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM '{sf_oracle}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    u_t, c_t = [0] * 16, [0] * 16
    for _, m, conv in rows:
        u_t[m] += 1
        c_t[m] += conv
    r_q = [c * 1_000_000 // u if u else 0 for c, u in zip(c_t, u_t)]
    w = [sum(r_q[t] for t in range(16) if (t & s) == t) for s in range(16)]
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    want = {}
    phis = {}
    for chn, b in bits.items():
        phi_num = sum(
            factorial(bin(s).count("1"))
            * factorial(3 - bin(s).count("1"))
            * (w[s | b] - w[s])
            for s in range(16)
            if (s & b) == 0
        )
        phis[chn] = phi_num
    total = sum(p // 24 for p in phis.values())
    for chn, b in bits.items():
        exposed = sum(u_t[t] for t in range(16) if (t & b) != 0)
        share = (
            0.0
            if total == 0
            else ((phis[chn] // 24) * 1_000_000 // total) / 1e6
        )
        want[chn] = (exposed, (phis[chn] // 24) / 1e6, share)
    # Shapley efficiency: credits sum to w(N) - w(empty)
    assert sum(phis.values()) == 24 * (w[15] - w[0])

    got = registry()["attribution_shapley"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.channel: (r.exposed_users, r.shapley_rate_credit, r.credit_share)
        for r in got
    } == want
    # credit is live and spread across channels
    assert sum(1 for v in want.values() if v[1] > 0) >= 2


def test_good_turing_matches_python_replica(spark, sf_oracle):
    """vocab_good_turing (ex-xeh): frequency-of-frequencies chain == a from-scratch python
    replica (regex \\s+ lowercase tokenization, word TRIGRAMS,
    Counter-of-Counters, integer Chao1). Exact equality."""
    import duckdb
    import re
    from collections import Counter

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    wc = Counter()
    for (txt,) in texts:
        words = [w for w in re.split(r"\s+", txt.lower().strip()) if w]
        for i in range(len(words) - 2):
            wc[" ".join(words[i : i + 3])] += 1
    fof = Counter(wc.values())
    v = sum(fof.values())
    n = sum(r * nr for r, nr in fof.items())
    n1, n2 = fof.get(1, 0), fof.get(2, 0)
    p0 = (n1 * 1_000_000 // n) / 1e6
    chao1 = v + (n1 * (n1 - 1)) // (2 * (n2 + 1))
    want = [
        (r, fof[r], v, n, p0, chao1) for r in sorted(fof) if r <= 10
    ]

    got = registry()["vocab_good_turing"].spark_fn(spark, sf_oracle).collect()
    assert [
        (x.r, x.n_r, x.v_total, x.n_tokens, x.p0_unseen, x.chao1_richness)
        for x in got
    ] == want
    # estimator is live: unseen mass positive, Chao1 extends V
    assert p0 > 0 and chao1 > v


def test_eb_shrunk_rates_matches_python_replica(spark, sf_oracle):
    """xei's method-of-moments shrinkage == a from-scratch python-int
    replica (quantized rates, declared integer-op moments, G-shrink
    posterior division, top-15 by (shrunk DESC, user_id))."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM '{sf_oracle}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    users = [(uid, n, c, c * 1_000_000 // n) for uid, n, c in rows]
    g = len(users)
    sm = sum(p for _, _, _, p in users)
    sv = sum(p * p for _, _, _, p in users)
    m_q = sm // g
    v_q = sv // g - m_q * m_q
    if v_q <= 0:
        k_q = 0
    else:
        k_q = max((m_q * (1_000_000 - m_q)) * 1_000_000 // max(v_q, 1) - 1_000_000, 0)
    a6 = (m_q * k_q) // 1_000_000
    scored = []
    for uid, n, c, p_q in users:
        gg = max((n * 1_000_000 + k_q) // 10**12, 1)
        shrunk = (((c * 1_000_000 + a6) // gg) * 1_000_000) // max(
            (n * 1_000_000 + k_q) // gg, 1
        )
        scored.append((uid, n, c, p_q, shrunk))
    top = sorted(scored, key=lambda r: (-r[4], r[0]))[:15]
    want = [
        (int(uid), n, c, p / 1e6, s / 1e6, m_q / 1e6, k_q / 1e6)
        for uid, n, c, p, s in top
    ]

    got = registry()["eb_shrunk_rates"].spark_fn(spark, sf_oracle).collect()
    assert [
        (
            r.user_id,
            r.n_events,
            r.n_purchases,
            r.raw_rate,
            r.shrunk_rate,
            r.prior_mean,
            r.prior_strength,
        )
        for r in got
    ] == want
    # shrinkage is LIVE: the raw and shrunk orderings disagree somewhere
    raw_order = [u for u, *_ in sorted(scored, key=lambda r: (-r[3], r[0]))]
    shr_order = [u for u, *_ in sorted(scored, key=lambda r: (-r[4], r[0]))]
    assert raw_order != shr_order
    assert k_q > 0


def test_neyman_allocation_matches_python_replica(spark, sf_oracle):
    """xej's weighted Hamilton allocation == a from-scratch python-int
    replica; allocations sum to EXACTLY the 10000 budget."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lang, CAST(count(*) AS BIGINT),
               CAST(sum(length(text)) AS BIGINT),
               CAST(sum(length(text) * length(text)) AS BIGINT)
        FROM '{sf_oracle}/documents.parquet' GROUP BY 1
        """
    ).fetchall()
    sd = {}
    for lang, n_h, sx, sxx in rows:
        var_q = max(sxx // n_h - (sx // n_h) * (sx // n_h), 0)
        sd[lang] = (n_h, math.floor(math.sqrt(var_q) * 1000))
    w = {lang: n_h * s for lang, (n_h, s) in sd.items()}
    tw = sum(w.values())
    g = max(tw // 10**12, 1)
    twg = max(tw // g, 1)
    base = {l: (10000 * (wv // g)) // twg for l, wv in w.items()}
    rem = {l: (10000 * (wv // g)) % twg for l, wv in w.items()}
    leftover = 10000 - sum(base.values())
    order = sorted(rem, key=lambda l: (-rem[l], l))
    alloc = {
        l: base[l] + (1 if i < leftover else 0) for i, l in enumerate(order)
    }
    want = {
        l: (sd[l][0], sd[l][1] / 1e3, w[l], alloc[l]) for l in sd
    }

    got = registry()["xej_neyman_allocation"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.lang: (r.n_docs, r.sd_chars, r.neyman_weight, r.alloc_labels)
        for r in got
    } == want
    assert sum(a for *_, a in want.values()) == 10000
    # allocation is genuinely non-proportional somewhere (S_h differs)
    assert len({s for _, s, _, _ in want.values()}) > 1


def test_anova_matches_python_replica(spark, sf_oracle):
    """xek's SS decomposition == a from-scratch python-int replica
    (quantized group terms, exact SSB/SSW, G-shrink F and eta^2)."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lang, CAST(count(*) AS BIGINT),
               CAST(sum(length(text)) AS BIGINT),
               CAST(sum(length(text) * length(text)) AS BIGINT)
        FROM '{sf_oracle}/documents.parquet' GROUP BY 1
        """
    ).fetchall()
    n = sum(r[1] for r in rows)
    s = sum(r[2] for r in rows)
    sxx = sum(r[3] for r in rows)
    t_sum = sum((sj * sj) // nj for _, nj, sj, _ in rows)
    k = len(rows)
    ssb = t_sum - (s * s) // n
    ssw = sxx - t_sum
    gg = max(max(ssb, ssw) // 10**12, 1)
    f_q = (
        0
        if ssw == 0 or k <= 1
        else (((ssb // gg) * 1_000_000) // max(ssw // gg, 1)) * (n - k) // (k - 1)
    )
    eta_q = (
        0
        if ssb + ssw == 0
        else ((ssb // gg) * 1_000_000) // max((ssb + ssw) // gg, 1)
    )
    want = {
        lang: (nj, sj // nj, ssb, ssw, f_q / 1e6, eta_q / 1e6)
        for lang, nj, sj, _ in rows
    }

    got = registry()["xek_anova_doc_length"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.lang: (
            r.n_docs,
            r.mean_chars,
            r.ss_between,
            r.ss_within,
            r.f_stat,
            r.eta_squared,
        )
        for r in got
    } == want
    # the statistic is live: group means differ and F is positive
    assert len({v[1] for v in want.values()}) > 1 and f_q > 0


def test_theil_sen_matches_python_replica(spark, sf_oracle):
    """xeo's pair-join median slope == a from-scratch python replica
    (O(n^2) pairwise slopes with toward-zero division, declared lower
    median, residual-median intercept). Exact equality."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        FROM '{sf_oracle}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, d, c in rows:
        series.setdefault(et, []).append((d, c))
    want = {}
    for et, pts in series.items():
        slopes = []
        for i, (d1, c1) in enumerate(pts):
            for d2, c2 in pts[i + 1 :]:
                slopes.append((tdiv((c2 - c1) * 1_000_000, d2 - d1), d1, d2))
        slopes.sort()
        m = len(slopes)
        slope_q = slopes[(m + 1) // 2 - 1][0]
        resid = sorted((c * 1_000_000 - slope_q * d, d) for d, c in pts)
        n = len(pts)
        b_q = resid[(n + 1) // 2 - 1][0]
        want[et] = (n, m, slope_q / 1e6, b_q / 1e6)

    got = registry()["xeo_theil_sen_slope"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.event_type: (
            r.n_days,
            r.n_pairs,
            r.slope_cents_per_day,
            r.intercept_cents,
        )
        for r in got
    } == want
    # the estimator is live: at least one type has a nonzero slope
    assert any(v[2] != 0 for v in want.values())


def test_lang_jsd_matches_python_replica(spark, sf_oracle):
    """xer's two-leg JSD == a from-scratch python replica (Counter
    vocabularies, micro-nat floor per word, exact weighted sums, two
    integer divisions). Exact equality + JSD bounds [0, ln 2]."""
    import duckdb
    import math
    import re
    from collections import Counter

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    vocab, totals = {}, {}
    for lang, text in rows:
        ws = [w for w in re.split(r"\s+", text.lower().strip()) if w]
        vocab.setdefault(lang, Counter()).update(ws)
    totals = {lang: sum(c.values()) for lang, c in vocab.items()}

    def leg(la, lb):
        np_, nq = totals[la], totals[lb]
        s = 0
        for w, cp in vocab[la].items():
            cq = vocab[lb].get(w, 0)
            lnq = math.floor(
                math.log((2.0 * cp * nq) / (cp * nq + cq * np_)) * 1_000_000
            )
            s += cp * lnq
        return s

    want = {}
    for la in sorted(vocab):
        for lb in sorted(vocab):
            if la < lb:
                j = leg(la, lb) // (2 * totals[la]) + leg(lb, la) // (
                    2 * totals[lb]
                )
                want[(la, lb)] = (totals[la], totals[lb], j / 1e6)

    got = registry()["xer_lang_jsd_matrix"].spark_fn(spark, sf_oracle).collect()
    assert {
        (r.lang_a, r.lang_b): (r.n_tokens_a, r.n_tokens_b, r.jsd_nats)
        for r in got
    } == want
    # JSD bounds (up to quantization): 0 <= jsd <= ln 2; and the
    # matrix is live — every pair strictly positive with a real SPREAD
    # (the fixture languages share one vocabulary with shifted marker
    # mass, so absolute JSDs are small but pair distances differ ~2x)
    jsds = [v[2] for v in want.values()]
    assert all(-1e-6 <= j <= math.log(2) + 1e-6 for j in jsds)
    assert min(jsds) > 0 and max(jsds) >= 1.5 * min(jsds)


def test_burstiness_matches_python_replica(spark, sf_oracle):
    """xes's windowed burstiness == a from-scratch python replica
    (sorted gaps in whole seconds, integer-op moments, milli-sqrt
    seam, signed toward-zero B). Exact equality; the fixture's
    Poisson arrivals must read as 'regular' (B ~ 0) — the
    Goh-Barabási theory check."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, epoch_us(ts), event_id
        FROM '{sf_oracle}/events.parquet' ORDER BY user_id, 2, 3
        """
    ).fetchall()
    by_user = {}
    for uid, us, _ in rows:
        by_user.setdefault(uid, []).append(us)
    bands = {}
    for uid, tss in by_user.items():
        ds = [(b - a) // 1_000_000 for a, b in zip(tss, tss[1:])]
        n = len(ds)
        if n < 5:
            continue
        sx, sxx = sum(ds), sum(d * d for d in ds)
        mu = (sx // n) * 1000
        sd = math.floor(math.sqrt(max(sxx // n - (sx // n) ** 2, 0)) * 1000)
        b_q = 0 if sd + mu == 0 else tdiv((sd - mu) * 1_000_000, sd + mu)
        band = (
            "periodic" if b_q <= -200000 else "bursty" if b_q > 200000 else "regular"
        )
        cnt, sb, sn, sm = bands.get(band, (0, 0, 0, 0))
        bands[band] = (cnt + 1, sb + b_q, sn + n, sm + mu // 1000)
    want = {
        band: (cnt, tdiv(sb, cnt) / 1e6, sn // cnt, sm // cnt)
        for band, (cnt, sb, sn, sm) in bands.items()
    }

    got = registry()["xes_burstiness"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.band: (r.n_users, r.mean_burstiness, r.mean_gaps, r.mean_gap_seconds)
        for r in got
    } == want
    # Poisson arrivals => B ~ 0: every fixture user is 'regular'
    assert set(want) == {"regular"} and abs(want["regular"][1]) < 0.2


def test_sprt_literals_match_formula():
    """The SPRT step/bound literals are floor(ln(...)*1e6) of the
    declared hypotheses H0 p=0.15 / H1 p=0.25, alpha=beta=0.05 —
    incl. the floor-of-negative B (-125163.14 -> -125164)."""
    import math

    from dask_snowflake_spark.ext_queries import (
        _SPRT_BOUND_Q,
        _SPRT_STEP_FAIL,
        _SPRT_STEP_SUCC,
    )

    assert _SPRT_STEP_SUCC == math.floor(math.log(0.25 / 0.15) * 1e6)
    assert _SPRT_STEP_FAIL == math.floor(math.log(0.75 / 0.85) * 1e6)
    assert _SPRT_BOUND_Q == math.floor(math.log(0.95 / 0.05) * 1e6)


def test_sprt_matches_python_replica(spark, sf_oracle):
    """xet's windowed LLR walk == a from-scratch python replica
    (portable-hash arms, user_id enrollment order, integer walk,
    first-crossing decision). Exact equality; the fixture's ~8%
    conversion must reject the 25% lift hypothesis early."""
    import duckdb
    import hashlib

    from dask_snowflake_spark.ext_queries import (
        _SPRT_BOUND_Q,
        _SPRT_STEP_FAIL,
        _SPRT_STEP_SUCC,
    )
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 250
                        THEN 1 ELSE 0 END)
        FROM '{sf_oracle}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    walks = {"A": [], "B": []}
    for uid, conv in rows:
        h = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:15], 16)
        walks["A" if h % 2 == 0 else "B"].append(conv)
    want = {}
    for arm, convs in walks.items():
        s, rn_up, rn_lo = 0, None, None
        for i, c in enumerate(convs, start=1):
            s += _SPRT_STEP_SUCC if c else _SPRT_STEP_FAIL
            if rn_up is None and s >= _SPRT_BOUND_Q:
                rn_up = i
            if rn_lo is None and s <= -_SPRT_BOUND_Q:
                rn_lo = i
        if rn_up is not None and (rn_lo is None or rn_up < rn_lo):
            dec, n_dec = "accept_lift", rn_up
        elif rn_lo is not None:
            dec, n_dec = "reject_lift", rn_lo
        else:
            dec, n_dec = "undecided", len(convs)
        want[arm] = (len(convs), sum(convs), n_dec, dec, s / 1e6)

    got = registry()["sprt_ab"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.arm: (r.n_users, r.n_conv, r.n_at_decision, r.decision, r.final_llr)
        for r in got
    } == want
    # early stopping is LIVE: both arms reject the lift well before
    # their fixed horizon
    assert all(
        v[3] == "reject_lift" and v[2] < v[0] for v in want.values()
    )


def test_hill_tail_index_matches_python_replica(spark, sf_oracle):
    """xeu's order-statistic Hill == a from-scratch python replica
    (sorted cents, micro-nat floors, integer quantized alpha)."""
    import duckdb
    import math

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(round(value * 100) AS BIGINT)
        FROM '{sf_oracle}/events.parquet'
        WHERE event_type = 'purchase'
          AND CAST(round(value * 100) AS BIGINT) > 0
        """
    ).fetchall()
    cents = sorted((c for (c,) in rows), reverse=True)[:101]
    want = {}
    for k in (50, 100):
        x_k1 = cents[k]
        s = sum(
            math.floor(math.log(cents[i] / x_k1) * 1_000_000)
            for i in range(k)
        )
        alpha = 0.0 if s == 0 else (k * 10**12 // s) / 1e6
        want[k] = (x_k1, s, alpha)

    got = registry()["xeu_hill_tail_index"].spark_fn(spark, sf_oracle).collect()
    assert {
        r.k: (r.threshold_cents, r.sum_ln_q, r.hill_alpha) for r in got
    } == want
    # tail index is live and in a plausible range for a bounded
    # synthetic value distribution (light tail => larger alpha)
    assert all(v[2] > 0.5 for v in want.values())


def test_zipf_exponent_matches_python_replica(spark, sf_oracle):
    """xev's moment-form log-log OLS == a from-scratch python replica
    (Counter vocab, unique rank order, milli-nat floors, integer-op
    moments, G-shrink signed division, fixed-expression r^2)."""
    import duckdb
    import math
    import re
    from collections import Counter

    from dask_snowflake_spark.queries import registry

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    vocab = Counter()
    for (txt,) in texts:
        vocab.update(w for w in re.split(r"\s+", txt.lower().strip()) if w)
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    # milli-nat quantum (r12: micro-nat moment sums overflow BIGINT at
    # ~1e5 vocab — the engine pair pre-scales, so the replica must too)
    xs = [math.floor(math.log(rk) * 1_000) for rk in range(1, len(ranked) + 1)]
    ys = [math.floor(math.log(c) * 1_000) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    a_q = sxy // n - (sx // n) * (sy // n)
    b_q = sxx // n - (sx // n) ** 2
    c_q = syy // n - (sy // n) ** 2
    g = max(b_q // 10**12, 1)
    expo = (
        0.0
        if b_q <= 0
        else -tdiv(tdiv(a_q, g) * 1_000_000, max(b_q // g, 1)) / 1e6
    )
    r2 = (
        0.0
        if b_q <= 0 or c_q <= 0
        else math.floor((float(a_q) * a_q) / (float(b_q) * c_q) * 1_000_000)
        / 1e6
    )

    got = registry()["xev_zipf_exponent"].spark_fn(spark, sf_oracle).collect()
    assert len(got) == 1
    r0 = got[0]
    assert (r0.vocab_size, r0.zipf_exponent, r0.r_squared) == (n, expo, r2)
    # the diagnostic WORKS on this corpus by failing it: natural text
    # shows exponent ~ 1 with r^2 ~ 0.9+; the synthetic word salad
    # reads exponent ~ 0.18 at r^2 ~ 0.06 — exactly the
    # generated-vs-organic separation the screen exists for
    assert 0 < expo < 0.6 and 0 < r2 < 0.5


def test_ltv_cohort_matches_python_replica(spark, sf_oracle):
    """xex's cohort triangle == a from-scratch python replica (month
    index cohorts, 12x12 frame, integer cent cumsums, floor-dollar
    per-customer division). Exact equality + the triangle invariant:
    cumulative LTV is non-decreasing in age within every cohort."""
    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM '{sf_oracle}/orders.parquet'
        """
    ).fetchall()
    first = {}
    for ck, mo, _ in rows:
        first[ck] = min(first.get(ck, mo), mo)
    c0 = min(first.values())
    sizes, cells = {}, {}
    for ck, coh in first.items():
        if coh < c0 + 12:
            sizes[coh] = sizes.get(coh, 0) + 1
    for ck, mo, cents in rows:
        coh = first[ck]
        age = mo - coh
        if coh < c0 + 12 and 0 <= age <= 11:
            cells[(coh, age)] = cells.get((coh, age), 0) + cents
    want = []
    for coh in sorted(sizes):
        cum = 0
        for age in sorted(a for c, a in cells if c == coh):
            rev = cells[(coh, age)]
            cum += rev
            want.append(
                (coh, age, sizes[coh], rev // 100, cum // (100 * sizes[coh]))
            )

    got = registry()["xex_ltv_cohort_triangle"].spark_fn(spark, sf_oracle).collect()
    assert [
        (
            r.cohort_month_idx,
            r.age_months,
            r.n_cust,
            r.revenue_dollars,
            r.cum_ltv_dollars_per_cust,
        )
        for r in got
    ] == want
    # triangle is live: multiple cohorts, follow-on ages exist, and
    # the cumulative per-customer curve is non-decreasing in age
    assert len(sizes) >= 2
    assert any(w[1] > 0 for w in want)
    by_cohort = {}
    for coh, age, _, _, ltv in want:
        assert ltv >= by_cohort.get(coh, 0)
        by_cohort[coh] = ltv


def test_qc_sigmoid_table_formula():
    """The 257-edge literal sigmoid table == floor(1e6 * sigmoid(edge))
    recomputed from the closed form (the literal-table pin rule: the
    table is the spec, so a drifted regeneration must fail loudly)."""
    import math

    from dask_snowflake_spark.ext_queries import _qc_sigmoid_edges

    edges = _qc_sigmoid_edges()
    assert len(edges) == 257
    for k, v in enumerate(edges):
        x = (-16000 + 125 * k) / 1000
        assert v == math.floor(1_000_000 / (1 + math.exp(-x))), k
    # monotone, symmetric-ish, saturating
    assert all(a <= b for a, b in zip(edges, edges[1:]))
    assert edges[0] < 200 and edges[-1] > 999_800
    assert edges[128] == 500_000


def test_quality_classifier_matches_python_replica(spark, sf_oracle):
    """quality_classifier's integer-GD trajectory == a from-scratch
    python replay that re-derives the FEATURES AND LABEL from raw text
    with python re (independent of both engines' SQL — the oracle
    mirrors the engine chain, so only an out-of-band replica can catch
    a mirrored bug; the lang_id-confusion independence rule), then
    replays standardization + 10 GD rounds in pure python ints."""
    import duckdb
    import math
    import re

    from dask_snowflake_spark.ext_queries import (
        _QC_ETA_NUM,
        _QC_ROUNDS,
        _qc_sigmoid_edges,
    )
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{sf_oracle}/documents.parquet'"
        ).fetchall()
    ]

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    stop = {"the", "a", "of", "and", "in", "to", "is"}
    raw, ys = [], []
    for t in texts:
        words = [w for w in re.split(r"\s+", t.strip()) if w]
        nw, nd = len(words), len(set(words))
        ns = sum(1 for w in words if w.lower() in stop)
        nc = len(t)
        npunct = sum(1 for ch in t if re.fullmatch(r"[^\w\s]", ch))
        ndig = sum(1 for ch in t if ch.isdigit())
        nns = len(re.sub(r"\s", "", t))
        nw1, nc1 = max(nw, 1), max(nc, 1)
        raw.append(
            (
                ns * 1000 // nw1,
                npunct * 1000 // nc1,
                ndig * 1000 // nc1,
                nd * 1000 // nw1,
                min(nw, 1000),
            )
        )
        ys.append(
            int(
                5 <= nw <= 5000
                and nw * 2 <= nns <= nw * 12
                and ns >= 2
                and npunct * 10 <= nc * 3
                and ndig * 5 <= nc
                and nd * 10 >= nw * 3
            )
        )
    n = len(ys)
    means = [tdiv(sum(f[j] for f in raw), n) for j in range(5)]
    sds = []
    for j in range(5):
        s1 = sum(f[j] for f in raw)
        q1 = sum(f[j] * f[j] for f in raw)
        var = tdiv(q1, n) - tdiv(s1, n) ** 2
        sds.append(max(math.floor(math.sqrt(max(var, 0))), 1))
    feats = [
        tuple(
            min(max(tdiv((f[j] - means[j]) * 1000, sds[j]), -4000), 4000)
            for j in range(5)
        )
        for f in raw
    ]
    edge = _qc_sigmoid_edges()
    w = [0] * 6
    want = []
    for r in range(_QC_ROUNDS + 1):
        G = [0] * 6
        correct = 0
        for f, y in zip(feats, ys):
            s = w[0] * 1000 + sum(w[j + 1] * f[j] for j in range(5))
            sm = min(max(tdiv(s, 1000), -16000), 15999)
            k = tdiv(sm + 16000, 125)
            p = edge[k] + tdiv((edge[k + 1] - edge[k]) * (sm + 16000 - 125 * k), 125)
            em = tdiv(p, 1000) - 1000 * y
            G[0] += em * 1000
            for j in range(5):
                G[j + 1] += em * f[j]
            correct += (1 if s >= 0 else 0) == y
        want.append((r, *w, (correct * 1_000_000 // n) / 1e6))
        if r < _QC_ROUNDS:
            for j in range(6):
                w[j] -= tdiv(_QC_ETA_NUM * tdiv(G[j], n), 1000)

    got = [
        tuple(r)
        for r in registry()["quality_classifier"].spark_fn(spark, sf_oracle).collect()
    ]
    assert got == want
    # liveness: training actually learns — round 0 is the predict-all-
    # positive base rate, the final round beats it by a wide margin
    accs = [r[-1] for r in got]
    assert accs[0] < 0.85 and accs[-1] > 0.93 and accs[-1] - accs[0] > 0.1


def test_cluster_prune_matches_python_replica(spark, sf_oracle):
    """xf5's cluster-level prune policy == a from-scratch python
    replica from raw floats (milli quantize, trunc-div centroid,
    exact sqdists, md5 hash ranks, xor checksums). Also asserts the
    HONEST NULL: uniform-noise fixture clusters are never 'collapse'
    (mean dispersion ~1e6 >> the 5e5 farm threshold), while the 'cap'
    and 'keep' branches are both live at this SF."""
    import duckdb
    import hashlib

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_oracle}/embeddings.parquet'"
    ).fetchall()

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    import math

    by_cell: dict[int, list[tuple[int, list[int]]]] = {}
    for vid, cell, emb in rows:
        xq = [math.floor(float(x) * 1000) for x in emb]
        by_cell.setdefault(cell, []).append((vid, xq))
    want = []
    for cell in sorted(by_cell):
        members = by_cell[cell]
        n = len(members)
        dim = len(members[0][1])
        cq = [
            tdiv(sum(m[1][p] for m in members), n) for p in range(dim)
        ]
        sqd = {
            vid: sum((x - c) ** 2 for x, c in zip(xq, cq))
            for vid, xq in members
        }
        mean_sqd = sum(sqd.values()) // n
        verdict = (
            "collapse" if mean_sqd < 500_000 else ("cap" if n > 50 else "keep")
        )
        ids = sorted(sqd)
        if verdict == "collapse":
            kept = [ids[0]]
        elif verdict == "cap":
            hr = sorted(
                ids,
                key=lambda i: (
                    int(hashlib.md5(f"cp:{i}".encode()).hexdigest()[:15], 16),
                    i,
                ),
            )
            kept = hr[:50]
        else:
            kept = ids
        xor = 0
        for i in kept:
            xor ^= i
        want.append((cell, n, mean_sqd, verdict, len(kept), xor))

    got = [
        tuple(r)
        for r in registry()["cluster_prune_policy"]
        .spark_fn(spark, sf_oracle)
        .collect()
    ]
    assert got == want
    verdicts = {w[3] for w in want}
    assert "collapse" not in verdicts  # uniform-noise honest null
    assert {"cap", "keep"} <= verdicts  # policy branches live


def test_cluster_prune_collapse_branch(spark):
    """The collapse branch (near-dup farm -> min-id representative) on
    a CONSTRUCTED dense cluster — the branch the uniform fixtures
    correctly never fire (honest null needs its own pin)."""
    from pyspark.sql import functions as F

    from dask_snowflake_spark.operators.similarity import cluster_prune

    # cell 0: four nearly-identical vectors (farm); cell 1: four spread
    rows = [
        (1, 0, [0.5, 0.5]),
        (2, 0, [0.5001, 0.4999]),
        (3, 0, [0.4999, 0.5001]),
        (4, 0, [0.5, 0.4999]),
        (10, 1, [0.9, -0.9]),
        (11, 1, [-0.9, 0.9]),
        (12, 1, [0.9, 0.9]),
        (13, 1, [-0.9, -0.9]),
    ]
    df = spark.createDataFrame(
        [(i, c, [float(x) for x in v]) for i, c, v in rows],
        "vec_id long, label long, embedding array<float>",
    )
    out = {
        r.cluster: (r.n, r.verdict, r.n_kept, r.kept_xor)
        for r in cluster_prune(df, cap=50, dense_sqd=500_000).collect()
    }
    assert out[0] == (4, "collapse", 1, 1)  # min-id representative
    assert out[1][1] == "keep" and out[1][2] == 4


def test_temperature_mixture_matches_python_replica(spark, sf_oracle):
    """xf8's sqrt-temperature mixture == a from-scratch python replica
    (re.split token counts, floor-sqrt weights, Hamilton largest
    remainder, md5 hash-rank sampling, xor membership). Liveness: the
    temperature actually flattens — the head language's quota share
    must sit strictly below its token share, every language gets a
    positive quota, and quotas sum to exactly the 200 budget."""
    import duckdb
    import hashlib
    import math
    import re

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    toks = [
        (d, lang, len([w for w in re.split(r"\s+", t.strip()) if w]))
        for d, lang, t in rows
    ]
    langs = sorted({lang for _, lang, _ in toks})
    lt = {g: sum(n for _, lang, n in toks if lang == g) for g in langs}
    nd = {g: sum(1 for _, lang, _ in toks if lang == g) for g in langs}
    wq = {g: math.floor(math.sqrt(lt[g])) for g in langs}
    w_all = sum(wq.values())
    base = {g: 200 * wq[g] // w_all for g in langs}
    rem = {g: 200 * wq[g] % w_all for g in langs}
    leftover = 200 - sum(base.values())
    order = sorted(langs, key=lambda g: (-rem[g], g))
    quota = {
        g: base[g] + (1 if order.index(g) < leftover else 0) for g in langs
    }
    want = []
    for g in langs:
        ids = [d for d, lang, _ in toks if lang == g]
        ids.sort(
            key=lambda d: (
                int(hashlib.md5(f"tmx:{d}".encode()).hexdigest()[:15], 16),
                d,
            )
        )
        kept = ids[: quota[g]]
        x = 0
        for d in kept:
            x ^= d
        want.append((g, lt[g], nd[g], wq[g], quota[g], len(kept), x))

    got = [
        tuple(r)
        for r in registry()["temperature_mixture"].spark_fn(spark, sf_oracle).collect()
    ]
    assert got == want
    assert sum(quota.values()) == 200 and all(q > 0 for q in quota.values())
    head = max(langs, key=lambda g: lt[g])
    assert quota[head] / 200 < lt[head] / sum(lt.values())


def test_bh_pvalue_table_formula():
    """The 641-entry literal erfc table == the closed form recomputed
    (literal-table pin rule); monotone decreasing, correct endpoints."""
    import math

    from dask_snowflake_spark.ext_queries import _bh_pvalue_table

    t = _bh_pvalue_table()
    assert len(t) == 641
    for k, v in enumerate(t):
        assert v == math.floor(math.erfc(math.sqrt(k / 10 / 2)) * 1e9), k
    assert all(a >= b for a, b in zip(t, t[1:]))
    assert t[0] == 1_000_000_000 - 1 or t[0] == 1_000_000_000
    # z^2 = 3.84 -> p ~ 0.05 (the 1.96 sigma landmark sits in-range)
    assert 0.04e9 < t[38] < 0.06e9


def test_bh_select_rejection_path(spark):
    """analytics.bh_select on CONSTRUCTED p-values — the rejection path
    the uniform fixture correctly never exercises (honest null needs
    its own pin). Textbook BH step-up: m=10, q=0.1; p = (.001,.004,
    .019,.095,.201,...) -> k*=3 (p3=.019 <= 3*.01, p4=.095 > .04 and
    nothing later satisfies), so exactly the first three reject —
    including the step-up subtlety that p3 rejects even though
    p3 > 3*q/m would fail a step-DOWN test at earlier ranks."""
    from dask_snowflake_spark.operators.analytics import bh_select

    ps = [1, 4, 19, 95, 201, 300, 400, 500, 600, 700]  # milli*1e6 = nano/1e3
    rows = [(f"h{i:02d}", p * 1_000_000) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "key string, p_q long")
    out = {r.key: (r.bh_rank, r.bh_kstar, r.bh_rejected)
           for r in bh_select(df, p_col="p_q", key_cols=("key",)).collect()}
    assert out["h00"] == (1, 3, True)
    assert out["h01"] == (2, 3, True)
    assert out["h02"] == (3, 3, True)
    assert all(not out[f"h{i:02d}"][2] for i in range(3, 10))


def test_bh_fdr_matches_python_replica(spark, sf_oracle):
    """xfc's z-test + table-interpolated p + BH step-up == a
    from-scratch python replica; liveness = the correction WORKING on
    uniform fixtures: naive p<0.05 flags >= 1 nation, BH rejects 0."""
    import duckdb

    from dask_snowflake_spark.ext_queries import _bh_pvalue_table
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n.n_name, count(*), sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                                       THEN 1 ELSE 0 END)
        FROM '{sf_oracle}/orders.parquet' o
        JOIN '{sf_oracle}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf_oracle}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1
        """
    ).fetchall()
    N = sum(r[1] for r in rows)
    X = sum(r[2] for r in rows)
    m = len(rows)
    t = _bh_pvalue_table()
    scored = []
    for name, n_i, x_i in rows:
        num = x_i * N - n_i * X
        z2_q = int((float(num) * num) / (float(n_i) * X * (N - X)) * 1e6 // 1)
        z2c = min(z2_q, 63_999_999)
        b = z2c // 100_000
        p_q = t[b] - ((t[b] - t[b + 1]) * (z2c - b * 100_000)) // 100_000
        scored.append((name, n_i, x_i, z2_q, p_q))
    ranked = sorted(scored, key=lambda s: (s[4], s[0]))
    kstar = 0
    for k, s in enumerate(ranked, 1):
        if s[4] * m * 10 <= k * 1_000_000_000:
            kstar = k
    rank_of = {s[0]: k for k, s in enumerate(ranked, 1)}
    want = sorted(
        (
            name, n_i, x_i, z2_q, p_q / 1e9, rank_of[name],
            p_q <= 50_000_000, rank_of[name] <= kstar,
        )
        for name, n_i, x_i, z2_q, p_q in scored
    )
    got = sorted(
        tuple(r)
        for r in registry()["bh_fdr_control"].spark_fn(spark, sf_oracle).collect()
    )
    assert got == want
    assert sum(1 for w in want if w[6]) >= 1  # naive flags something
    assert sum(1 for w in want if w[7]) == 0  # BH correctly rejects none


def test_did_readout_matches_python_replica(spark, sf_oracle):
    """xfd's 2x2 diff-in-differences == a from-scratch python replica
    (panel construction from raw events, exact cell moments, fixed-
    order double estimate/z^2, erfc-table p). Liveness = the honest
    null: random hash arms on organic data must NOT be significant."""
    import duckdb
    import hashlib

    from dask_snowflake_spark.ext_queries import _bh_pvalue_table
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, event_type,
               CAST(round(value * 100) AS BIGINT),
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        FROM '{sf_oracle}/events.parquet'
        """
    ).fetchall()
    dmin = min(r[3] for r in rows)
    dmax = max(r[3] for r in rows)
    mid = (dmin + dmax) // 2
    panel: dict[tuple, int] = {}
    for uid, et, cents, d in rows:
        arm = (
            "treat"
            if int(hashlib.md5(f"did:{uid}".encode()).hexdigest()[:15], 16) % 2 == 0
            else "control"
        )
        per = "post" if d > mid else "pre"
        panel[(uid, arm, per)] = panel.get((uid, arm, per), 0) + (
            cents if et == "purchase" else 0
        )
    cell: dict[tuple, list] = {}
    for (uid, arm, per), c in panel.items():
        n, s, q = cell.get((arm, per), (0, 0, 0))
        cell[(arm, per)] = (n + 1, s + c, q + c * c)

    def m(k):
        n, s, q = cell[k]
        return float(s) / n

    def v(k):
        n, s, q = cell[k]
        return float(q) / n - (float(s) / n) * (float(s) / n)

    did = m(("treat", "post")) - m(("treat", "pre")) - m(("control", "post")) + m(
        ("control", "pre")
    )
    sevar = sum(v(k) / cell[k][0] for k in cell)
    import math

    did_mc = math.floor(did * 1000)
    z2_q = math.floor(did * did / sevar * 1_000_000)
    t = _bh_pvalue_table()
    z2c = min(z2_q, 63_999_999)
    b = z2c // 100_000
    p_q = t[b] - ((t[b] - t[b + 1]) * (z2c - b * 100_000)) // 100_000
    want = (
        cell[("treat", "post")][0],
        cell[("treat", "pre")][0],
        cell[("control", "post")][0],
        cell[("control", "pre")][0],
        did_mc / 100000.0,
        z2_q,
        (-1 if did_mc < 0 else 1) * p_q / 1e9,
        p_q <= 50_000_000,
    )
    got = [
        tuple(r)
        for r in registry()["did_readout"].spark_fn(spark, sf_oracle).collect()
    ]
    assert got == [want]
    assert want[7] is False  # honest null: hash arms carry no effect


def test_jackknife_se_matches_python_replica(spark, sf_oracle):
    """xfe's closed-form delete-one jackknife == a from-scratch python
    replica (re.split counts, per-doc LOO ratio replicates,
    nano-quantization, trunc-div centering, exact SSD). Liveness: the
    SE is positive and small relative to theta (a ratio over ~1e5
    words is tightly estimated), and theta matches the pooled rate."""
    import duckdb
    import math
    import re

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{sf_oracle}/documents.parquet'"
        ).fetchall()
    ]
    stop = {"the", "a", "of", "and", "in", "to", "is"}
    docs = []
    for t in texts:
        ws = [w for w in re.split(r"\s+", t.strip()) if w]
        docs.append((len(ws), sum(1 for w in ws if w.lower() in stop)))
    N = sum(d[0] for d in docs)
    S = sum(d[1] for d in docs)
    n = len(docs)

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    tq = [
        math.floor((S - ns) / max(N - nw, 1) * 1_000_000_000) for nw, ns in docs
    ]
    mq = tdiv(sum(tq), n)
    ssd = sum((t - mq) * (t - mq) for t in tq)
    want = (
        n,
        (S * 1_000_000 // N) / 1e6,
        math.sqrt((n - 1) * ssd / n) / 1e9,
        ssd,
    )
    got = [
        tuple(r)
        for r in registry()["jackknife_se"].spark_fn(spark, sf_oracle).collect()
    ]
    assert got == [want]
    assert 0 < want[2] < want[1] / 10


def test_capture_recapture_matches_python_replica(spark, sf_oracle):
    """xff's Chapman estimate == a from-scratch python replica that
    re-derives the verified-pair population (shingle sets, exact
    Jaccard at the operator's round-6 form), the two md5 capture
    samples and the estimator. Liveness: both samples are proper
    subsets, the overlap is nonempty, and the estimate lands within
    the sanity band of the exact population."""
    import duckdb
    import hashlib
    import re

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    sh = {}
    for did, text in rows:
        w = re.split(r"\s+", text)
        grams = {
            " ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))
        }
        sh[did] = {
            int(hashlib.md5(f"0:{g}".encode()).hexdigest()[:15], 16) for g in grams
        }
    ids = sorted(sh)
    pop = []
    # exhaustive truth is fine at replica scale; the engine pair uses
    # LSH candidates, which at J >= 0.8 with 8 bands of 2 rows have
    # ~certain capture, so the populations coincide (asserted below
    # via n_true equality with the engine output)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sh[a] & sh[b])
            if c and round(c / (len(sh[a]) + len(sh[b]) - c), 6) >= 0.8:
                pop.append((a, b))
    def h(seed, a, b):
        return int(hashlib.md5(f"{seed}:{a}:{b}".encode()).hexdigest()[:15], 16)
    n_a = sum(1 for a, b in pop if h("cra", a, b) % 2 == 0)
    n_b = sum(1 for a, b in pop if h("crb", a, b) % 2 == 0)
    n_both = sum(
        1 for a, b in pop if h("cra", a, b) % 2 == 0 and h("crb", a, b) % 2 == 0
    )
    n_true = len(pop)
    n_hat = (n_a + 1) * (n_b + 1) // (n_both + 1) - 1
    import math

    se = math.floor(
        math.sqrt(
            (n_a + 1) * (n_b + 1) * (n_a - n_both) * (n_b - n_both)
            / ((n_both + 1) * (n_both + 1) * (n_both + 2))
        )
    )
    want = (
        n_a, n_b, n_both, n_true, n_hat,
        (n_a * 1_000_000 // n_hat) / 1e6 if n_hat else 0.0,
        se,
        abs(n_hat - n_true) <= 2 * se + 1,
    )
    got = [
        tuple(r)
        for r in registry()["capture_recapture"].spark_fn(spark, sf_oracle).collect()
    ]
    assert got == [want]
    assert 0 < n_a < n_true and 0 < n_b < n_true and n_both > 0
    assert want[7] is True


def test_pass_at_k_matches_python_replica(spark, sf_oracle):
    """pass_at_k == a from-scratch python replica: the ppm values
    replicate the engine's fixed-order double product bit-for-bit
    (python floats are the same IEEE doubles), and INDEPENDENTLY the
    exact math.comb rational 1 - C(n-c,k)/C(n,k) must sit within 1e-9
    of the double product — pinning that the quotient-product form
    computes the true unbiased estimator, not just a self-consistent
    number. Liveness: purchases exist, so pass@10 > pass@1 somewhere
    and no user is degenerate-all-purchase."""
    import math

    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, count(*), sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
        FROM '{sf_oracle}/events.parquet' GROUP BY user_id
        """
    ).fetchall()

    def ppm(n, c, k):
        if c == 0:
            return 0
        if n - c < k:
            return 1_000_000
        prod = 1.0
        for i in range(k):  # same fixed order as the engine expression
            prod = prod * (float(n - c - i) / (n - i))
        return 1_000_000 - math.floor(prod * 1_000_000)

    per = {}
    for u, n, c in rows:
        per[u] = (n, c, ppm(n, c, 1), ppm(n, c, 5), ppm(n, c, 10))
        # independence: double product vs exact rational
        for k, got_ppm in ((1, per[u][2]), (5, per[u][3]), (10, per[u][4])):
            if c > 0 and n - c >= k:
                exact = 1 - math.comb(n - c, k) / math.comb(n, k)
                assert abs(got_ppm / 1e6 - exact) < 2e-6
    n_users = len(per)
    m1 = sum(v[2] for v in per.values()) // n_users
    m5 = sum(v[3] for v in per.values()) // n_users
    m10 = sum(v[4] for v in per.values()) // n_users
    want = sorted(
        (u, n, c, p1 / 1e6, p5 / 1e6, p10 / 1e6, m1 / 1e6, m5 / 1e6, m10 / 1e6)
        for u, (n, c, p1, p5, p10) in per.items()
    )
    got = sorted(
        tuple(r)
        for r in registry()["pass_at_k"].spark_fn(spark, sf_oracle).collect()
    )
    assert got == want
    assert any(v[4] > v[2] for v in per.values())  # more draws help
    assert all(v[1] < v[0] for v in per.values())  # no all-purchase user


def test_kruskal_wallis_matches_replica_and_textbook(spark, sf_oracle):
    """xg3_kruskal_wallis == a from-scratch python replica (exact
    integer spec re-derived independently), AND the quantized H agrees
    with the float textbook formula to quantization error, AND the
    honest null holds: generator doc lengths are lang-independent
    (xek measured F < 1), so H sits near its null mean ~ k-1 and
    epsilon^2 ~ 0 (the r11 honest-null rule — assert the truthful
    null, never fake liveness)."""
    from collections import Counter

    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, length(text) FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    by_lang: dict = {}
    allv = []
    for lang, ln in rows:
        by_lang.setdefault(lang, []).append(ln)
        allv.append(ln)
    n = len(allv)
    k = len(by_lang)
    hist = Counter(allv)
    # doubled average ranks from the histogram cumsum
    r2 = {}
    cum = 0
    for v in sorted(hist):
        cum += hist[v]
        r2[v] = 2 * cum - hist[v] + 1
    a = 0
    want_groups = {}
    for lang, vals in by_lang.items():
        r2j = sum(r2[v] for v in vals)
        nj = len(vals)
        a += (r2j * r2j) // (4 * nj)
        want_groups[lang] = (nj, r2j, (r2j * 1000) // (2 * nj))
    gg = max(a // 700_000_000_000, 1)
    den = (n * (n + 1)) // gg + (1 if (n * (n + 1)) % gg > 0 else 0)
    h_q = (12 * (a // gg) * 1_000_000) // den - 3 * (n + 1) * 1_000_000
    tsum = sum(c * c * c - c for c in hist.values())
    d = n * n * n - n
    dd = max(d // 1_000_000, 1)
    h_tie_q = (
        h_q if tsum == 0 else (h_q * (d // dd)) // max((d - tsum) // dd, 1)
    )
    eps_q = (
        max(h_tie_q - (k - 1) * 1_000_000, 0) // (n - k) if n > k else 0
    )
    got = {
        r.lang: (
            r.n_docs,
            r.doubled_rank_sum,
            r.mean_rank_milli,
            r.h_stat,
            r.h_tie_corrected,
            r.epsilon_sq,
        )
        for r in registry()["xg3_kruskal_wallis"].spark_fn(spark, sf_oracle).collect()
    }
    for lang, (nj, r2j, mrm) in want_groups.items():
        assert got[lang] == (nj, r2j, mrm, h_q / 1e6, h_tie_q / 1e6, eps_q / 1e6)
    # textbook float H (tie-corrected) agrees to quantization error
    ranks = {v: rr / 2 for v, rr in r2.items()}
    h_float = 12 / (n * (n + 1)) * sum(
        (sum(ranks[v] for v in vals)) ** 2 / len(vals) for vals in by_lang.values()
    ) - 3 * (n + 1)
    h_float /= 1 - tsum / d
    assert abs(h_float - h_tie_q / 1e6) < 0.01, (h_float, h_tie_q / 1e6)
    # honest null: no language effect in the generator
    assert h_tie_q / 1e6 < 3 * (k - 1), h_tie_q / 1e6
    assert eps_q / 1e6 < 0.01


def test_raking_ipf_matches_replica_and_float_ipf(spark, sf_oracle):
    """xg4_raking_ipf == a from-scratch integer replica of the 5-round
    quantized trajectory, the achieved marginals land within
    max_gap_micro of both targets (gap < 1% of corpus micro-mass —
    raking converges geometrically on positive tables), and an
    UNQUANTIZED float IPF run to convergence agrees with the quantized
    weights to ~1e-4 relative (the micro-quantization is a
    determinism device, not a semantic change)."""
    import duckdb

    from dask_snowflake_spark.ext_queries import (
        _IPF_COL_TARGETS,
        _IPF_ROW_TARGETS,
        _IPF_ROUNDS,
    )
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    cells = con.execute(
        f"SELECT lang, least(length(text) // 200, 2), count(*) "
        f"FROM '{sf_oracle}/documents.parquet' GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    row_t, col_t = dict(_IPF_ROW_TARGETS), dict(_IPF_COL_TARGETS)
    v = {b: 1_000_000 for b in col_t}
    for _ in range(_IPF_ROUNDS):
        dl = {l: 0 for l in row_t}
        for l, b, c in cells:
            dl[l] += c * v[b]
        u = {l: (n * row_t[l] * 1_000_000) // dl[l] if dl[l] else 0 for l in row_t}
        db = {b: 0 for b in col_t}
        for l, b, c in cells:
            db[b] += c * u[l]
        v = {b: (n * col_t[b] * 1_000_000) // db[b] if db[b] else 0 for b in col_t}
    want = {}
    kept = {}
    for l, b, c in cells:
        w = (u[l] * v[b]) // 1_000_000
        kept[(l, b)] = c * w
    row_ach = {l: sum(k for (ll, _), k in kept.items() if ll == l) for l in row_t}
    col_ach = {b: sum(k for (_, bb), k in kept.items() if bb == b) for b in col_t}
    gap = max(
        max(abs(row_ach[l] - n * row_t[l]) for l in row_t if l in row_ach),
        max(abs(col_ach[b] - n * col_t[b]) for b in col_t if b in col_ach),
    )
    for l, b, c in cells:
        want[(l, b)] = (
            c,
            (u[l] * v[b]) // 1_000_000,
            kept[(l, b)],
            n * row_t[l],
            row_ach[l],
            n * col_t[b],
            col_ach[b],
            gap,
        )
    got = {
        (r.lang, r.bucket): (
            r.n_docs,
            r.w_micro,
            r.kept_micro,
            r.row_target_micro,
            r.row_achieved_micro,
            r.col_target_micro,
            r.col_achieved_micro,
            r.max_gap_micro,
        )
        for r in registry()["xg4_raking_ipf"].spark_fn(spark, sf_oracle).collect()
    }
    assert got == want
    assert gap * 100 < n * 1_000_000  # within 1% of corpus micro-mass
    # unquantized float IPF to convergence agrees with quantized weights
    cnt = {(l, b): c for l, b, c in cells}
    uf = {l: 1.0 for l in row_t}
    vf = {b: 1.0 for b in col_t}
    for _ in range(50):
        for l in row_t:
            s = sum(cnt.get((l, b), 0) * vf[b] for b in col_t)
            uf[l] = (n * row_t[l] / 1e6) / s if s else 0.0
        for b in col_t:
            s = sum(cnt.get((l, b), 0) * uf[l] for l in row_t)
            vf[b] = (n * col_t[b] / 1e6) / s if s else 0.0
    for (l, b), (_, w_micro, *_rest) in got.items():
        wf = uf[l] * vf[b]
        assert abs(wf - w_micro / 1e6) < 1e-3 * max(wf, 1.0), (l, b, wf, w_micro)


def test_greedy_max_coverage_matches_replica_and_submodularity(spark, sf_oracle):
    """xg5_greedy_max_coverage == a from-scratch python greedy over
    the same bigram sets, AND the submodularity theorem holds on real
    data: greedy marginal gains are monotone NON-INCREASING (a strict
    increase anywhere would prove the implementation wrong —
    fixture-independent), AND liveness: the curve is genuinely
    submodular here (total covered < sum of standalone best gains,
    i.e. overlap exists) and coverage is substantial but partial."""
    import re

    import duckdb

    from dask_snowflake_spark.ext_queries import _GMC_ROUNDS
    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_oracle}/documents.parquet'"
    ).fetchall()
    doc_bs = {}
    for doc_id, text in rows:
        ws = [w for w in re.split(r"\s+", text.lower().strip()) if w]
        if len(ws) >= 2:
            doc_bs[doc_id] = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
    universe = set().union(*doc_bs.values())
    covered: set = set()
    want = []
    cum = 0
    for r in range(1, _GMC_ROUNDS + 1):
        best = min(
            ((-len(bs - covered), d) for d, bs in doc_bs.items()),
        )
        gain, doc = -best[0], best[1]
        if gain == 0:
            break
        cum += gain
        want.append(
            (r, doc, gain, cum, len(universe), cum * 1000 // len(universe))
        )
        covered |= doc_bs[doc]
    got = [
        (r.round, r.picked_doc, r.gain, r.covered, r.universe, r.coverage_milli)
        for r in registry()["xg5_greedy_max_coverage"]
        .spark_fn(spark, sf_oracle)
        .collect()
    ]
    assert got == want
    gains = [g for _, _, g, _, _, _ in got]
    assert all(a >= b for a, b in zip(gains, gains[1:])), gains  # submodularity
    assert gains[0] > gains[-1]  # real overlap: later picks gain less
    total, universe_n = got[-1][3], got[-1][4]
    assert 0 < total < universe_n  # substantial but partial coverage


def test_randomization_inference_matches_replica(spark, sf_oracle):
    """xg6_randomization_inference == a from-scratch python replay of
    the 199 deterministic pseudo-permutations, and the honest null
    holds: the x73 arm hash is independent of conversion, so the
    permutation p is non-extreme (the arms really are random)."""
    import hashlib

    import duckdb

    from dask_snowflake_spark.queries import registry

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, max(CASE WHEN event_type = 'purchase' AND value > 250 "
        f"THEN 1 ELSE 0 END) FROM '{sf_oracle}/events.parquet' GROUP BY user_id"
    ).fetchall()
    users = {u: c for u, c in rows}
    arm_a = {
        u
        for u in users
        if int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15], 16) % 2 == 0
    }
    n = len(users)
    n_a = len(arm_a)
    c_tot = sum(users.values())
    s_obs = sum(users[u] for u in arm_a)
    obs_dev = abs(s_obs * n - n_a * c_tot)
    n_extreme = 0
    for b in range(1, 200):
        ranked = sorted(
            users, key=lambda u: (hashlib.md5(f"perm:{b}:{u}".encode()).hexdigest(), u)
        )
        s_b = sum(users[u] for u in ranked[:n_a])
        if abs(s_b * n - n_a * c_tot) >= obs_dev:
            n_extreme += 1
    want = (
        n,
        n_a,
        c_tot,
        s_obs,
        (n_a * c_tot * 1000) // n,
        199,
        n_extreme,
        ((1 + n_extreme) * 1_000_000 // 200) / 1e6,
    )
    got = [
        tuple(r)
        for r in registry()["xg6_randomization_inference"]
        .spark_fn(spark, sf_oracle)
        .collect()
    ]
    assert got == [want]
    p = got[0][-1]
    assert 0.05 < p <= 1.0, p  # honest null: hash arms are truly random
