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


def test_bootstrap_ci_is_ordered_and_reproducible(spark, sf_oracle):
    """xcl sanity: the CI must bracket a value near the full-sample
    mean, bounds ordered, and the whole statistic bit-stable across
    two runs (hash-decided weights, no RNG)."""
    fn = registry()["xcl_bootstrap_ci"].spark_fn
    a = fn(spark, sf_oracle).collect()[0]
    b = fn(spark, sf_oracle).collect()[0]
    assert a == b
    assert a.ci_lo <= a.ci_hi
    assert a.ci_lo <= a.mean_price * 1.05 and a.ci_hi >= a.mean_price * 0.95
    assert a.n_replicates == 64
