"""Engine-pair property tests of the repo's quantization idioms.

Every oracle-checked query relies on a small set of determinism idioms
(CLAUDE.md's rules): magnitude+sign quantization, non-negative integer
ratio quantization, double-cast float32 quantization, microsecond
timestamp diffs.  The driver's hash gate only proves those idioms agree
on the CURRENT fixture — round-8's ADVICE found a query (xb6) whose
engines disagreed on 119/32000 elements yet still hashed equal because
no quotient happened to flip.  These tests run each idiom pair (Spark
expression vs DuckDB SQL vs naive Python) over ADVERSARIAL literals —
exact halfway points, negatives, denormals, float32 mantissa edges,
second-boundary-straddling timestamps — independent of any fixture, so
a divergence is caught the day it is introduced, not the round a
regenerated fixture happens to expose it.

The trap tests pin the MEASURED divergences the idioms exist to avoid
(duckdb 1.0.0 / Spark 4.1): native-float32 arithmetic, second-unit
timestamp diffs, `//` on non-integer operands.  If an engine upgrade
changes any pinned behavior, the test fails and the rule gets re-audited
instead of an oracle silently breaking.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest


def _lcg(seed: int, n: int) -> list[int]:
    """Deterministic 63-bit value stream (no random module: fixed
    literals keep every run byte-identical)."""
    out, x = [], seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(x)
    return out


def _duck(pdf: pd.DataFrame, sql: str):
    con = duckdb.connect()
    con.register("t", pdf)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _spark_rows(spark, pdf: pd.DataFrame, *exprs: str):
    return (
        spark.createDataFrame(pdf).selectExpr("i", *exprs).orderBy("i").collect()
    )


def test_magnitude_sign_quantization(spark):
    # the x73/xce idiom: floor(abs(z) * 1e6) magnitude + separate sign.
    # Flooring the MAGNITUDE (not the signed value) keeps the
    # quantization symmetric around zero; both engines floor a
    # non-negative double identically because double * 1e6 is
    # correctly-rounded arithmetic on both.
    zs = [
        0.0, -0.0,
        5e-07, -5e-07,              # exactly half a quantum
        1.0000005, -1.0000005,      # halfway point above 1
        2.5e-06, -2.5e-06,
        123.4567895, -123.4567895,  # 9-digit halfway
        4.9e-324, -4.9e-324,        # denormal min
        9e9, -9e9,                  # near the BIGINT/1e6 ceiling
    ] + [((v % (1 << 53)) / (1 << 26)) - 67108864.0 for v in _lcg(7, 40)]
    pdf = pd.DataFrame({"i": range(len(zs)), "z": zs})
    srows = _spark_rows(
        spark, pdf,
        "CAST(floor(abs(z) * 1000000) AS BIGINT) AS m",
        "CAST(sign(z) AS INT) AS sg",
    )
    drows = _duck(pdf, (
        "SELECT i, CAST(floor(abs(z) * 1000000) AS BIGINT) m, "
        "CAST(sign(z) AS INT) sg FROM t ORDER BY i"
    ))
    for sr, dr in zip(srows, drows):
        z = zs[sr.i]
        py_m = int(math.floor(abs(z) * 1e6))
        py_sg = 0 if z == 0 else (1 if z > 0 else -1)
        assert (sr.m, sr.sg) == (dr[1], dr[2]) == (py_m, py_sg), f"z={z!r}"


def test_nonneg_integer_ratio_quantization(spark):
    # the ratio idiom: (c * 1_000_000) div n instead of round(c/n, 6) —
    # c/n lands exactly on 6-decimal halfway points (20/512) where
    # Python banker's rounding and SQL round-half-away disagree; the
    # integer quotient is exact on both engines for non-negative
    # operands (floor == truncate when nothing is negative).
    pairs = [(20, 512), (0, 7), (1, 3), (2, 3), (999999, 1000000),
             (1, 1000000), (7, 14), (5, 8)] + [
        (a % 9_000_000, (b % 999_983) + 1)
        for a, b in zip(_lcg(11, 30), _lcg(13, 30))
    ]
    pdf = pd.DataFrame(
        {"i": range(len(pairs)),
         "c": [p[0] for p in pairs], "n": [p[1] for p in pairs]}
    )
    srows = _spark_rows(spark, pdf, "(c * 1000000) div n AS q")
    drows = _duck(pdf, "SELECT i, (c * 1000000) // n q FROM t ORDER BY i")
    for sr, dr in zip(srows, drows):
        c, n = pairs[sr.i]
        assert sr.q == dr[1] == (c * 1_000_000) // n, f"(c,n)=({c},{n})"


def test_signed_bigint_division_truncates_identically(spark):
    # measured (duckdb 1.0.0, Spark 4.1): on BIGINT operands BOTH
    # engines truncate toward zero (-7//2 == -7 div 2 == -3), while
    # Python's // floors (-4).  So Spark div vs DuckDB // is exact on
    # integers of ANY sign — the reason queries still decompose signed
    # quotients into magnitude+sign is (a) naive-Python cross-checks
    # use //, and (b) the // operator silently changes meaning on
    # non-integer operands (pinned below).
    pairs = [(-7, 2), (7, -2), (-7, -2), (7, 2), (-1, 3), (1, -3),
             (-6, 3), (0, 5), (-999999, 1000)]
    pdf = pd.DataFrame(
        {"i": range(len(pairs)),
         "a": [p[0] for p in pairs], "b": [p[1] for p in pairs]}
    )
    srows = _spark_rows(spark, pdf, "a div b AS q")
    drows = _duck(pdf, "SELECT i, a // b q FROM t ORDER BY i")
    for sr, dr in zip(srows, drows):
        a, b = pairs[sr.i]
        trunc = int(a / b) if b else None  # toward-zero
        assert sr.q == dr[1] == trunc, f"(a,b)=({a},{b})"
    # and the Python-floor divergence the decomposition protects
    # cross-checks from:
    assert (-7) // 2 == -4  # floor, != the engines' -3


def test_duckdb_floor_div_degenerates_on_doubles():
    # pinned trap: DuckDB's // is integer division ONLY on integer
    # operands — on DOUBLE (and DECIMAL) it evaluates as PLAIN division
    # (-7.0 // 2.0 == -3.5, not -4).  Any oracle quotient must therefore
    # keep both operands integral; if a duckdb upgrade makes // floor
    # doubles, this pin fails and the rule gets re-audited.
    con = duckdb.connect()
    try:
        got = con.execute(
            "SELECT CAST(-7 AS DOUBLE) // CAST(2 AS DOUBLE), -7.0 // 2.0"
        ).fetchone()
    finally:
        con.close()
    assert got == (-3.5, pytest.approx(-3.5))


def test_float32_quantization_requires_double_cast(spark):
    # the xb6 ADVICE fix: a float32 embedding element must be CAST to
    # DOUBLE before * 1e6 — a 24-bit mantissa times 1e6 is exactly
    # representable in double, so floor() is then bit-identical on both
    # engines.  Arithmetic kept IN float32 (DuckDB's list<float> * INT
    # stays FLOAT) rounds to 24 bits and floors differently.
    f32 = np.array(
        [0.1, 0.2, 1 / 3, 5e-07, 123.456789, 6.1e-05, 0.9999999, 1e-38]
        + [((v % (1 << 24)) / (1 << 24)) * 200.0 - 100.0 for v in _lcg(17, 40)],
        dtype=np.float32,
    )
    pdf = pd.DataFrame({"i": range(len(f32)), "f": f32})
    srows = _spark_rows(
        spark, pdf, "CAST(floor(CAST(f AS DOUBLE) * 1000000) AS BIGINT) AS xq"
    )
    drows = _duck(pdf, (
        "SELECT i, CAST(floor(CAST(f AS DOUBLE) * 1000000) AS BIGINT) xq, "
        "CAST(floor(f * 1000000) AS BIGINT) xq_f32 FROM t ORDER BY i"
    ))
    n_f32_diverge = 0
    for sr, dr in zip(srows, drows):
        py = math.floor(float(f32[sr.i]) * 1e6)
        assert sr.xq == dr[1] == py, f"f={f32[sr.i]!r}"
        n_f32_diverge += dr[1] != dr[2]
    # the measured failure mode the cast exists for: float32-native
    # flooring DOES diverge on real mantissas (123.45679f -> 123456784
    # vs 123456787).  If this ever stops diverging, the cast is still
    # correct — but re-check the engine's list-arithmetic typing.
    assert n_f32_diverge > 0


def test_timestamp_diff_micros_exact_seconds_trap(spark):
    # the x81/x82 rule: diff timestamps in MICROSECONDS (exact integer
    # on both engines) and derive seconds from micros.  The SECOND unit
    # is the trap being avoided: Spark floor-truncates the exact diff
    # while DuckDB counts BOUNDARY CROSSINGS, so 0.9s -> 1.1s is 0
    # seconds to Spark and 1 to DuckDB.
    a = pd.to_datetime([
        "2024-01-01 00:00:00.900000",   # straddles a second boundary
        "2024-01-01 00:00:00.000001",
        "2024-01-01 00:00:01.000000",
        "2024-01-01 23:59:59.999999",   # straddles day boundary
        "2024-02-29 00:00:00.500000",   # leap day
    ]).astype("datetime64[us]")
    b = pd.to_datetime([
        "2024-01-01 00:00:01.100000",
        "2024-01-01 00:00:00.999999",
        "2024-01-01 00:00:02.000000",
        "2024-01-02 00:00:00.000001",
        "2024-03-01 00:00:00.400000",
    ]).astype("datetime64[us]")
    pdf = pd.DataFrame({"i": range(len(a)), "a": a, "b": b})
    srows = _spark_rows(
        spark, pdf,
        "timestampdiff(MICROSECOND, a, b) AS us",
        "timestampdiff(SECOND, a, b) AS s",
    )
    drows = _duck(pdf, (
        "SELECT i, date_diff('microseconds', a, b) us, "
        "date_diff('second', a, b) s FROM t ORDER BY i"
    ))
    for sr, dr in zip(srows, drows):
        us_py = int((b[sr.i] - a[sr.i]).value // 1000)  # pandas ns -> us
        assert sr.us == dr[1] == us_py, f"row {sr.i}"
    # pinned divergence on the straddle rows (0 and 4):
    assert srows[0].s == 0 and drows[0][2] == 1
    assert srows[4].s == 86399 and drows[4][2] == 86400


def test_ln_quantization_engine_identical_on_spread(spark):
    # floor(ln(x) * 1e6) — used by the corpus-freq / NLL / PMI family.
    # ln() is LIBM-dependent, so engines are NOT guaranteed equal in
    # general; tests/test_fixture_contracts.py guards each query's
    # actual inputs against boundary proximity.  This spread check is
    # the early-warning layer: exact agreement over six decades of
    # deterministic values on this host/engine pair.
    xs = [1.0, 2.0, math.e, 10.0, 0.5, 1e-6, 1e6, 3.0, 7.0] + [
        ((v % (1 << 40)) + 1) / (1 << 20) for v in _lcg(23, 50)
    ]
    pdf = pd.DataFrame({"i": range(len(xs)), "x": xs})
    srows = _spark_rows(spark, pdf, "CAST(floor(ln(x) * 1000000) AS BIGINT) AS q")
    drows = _duck(
        pdf, "SELECT i, CAST(floor(ln(x) * 1000000) AS BIGINT) q FROM t ORDER BY i"
    )
    diverged = [
        (xs[sr.i], sr.q, dr[1]) for sr, dr in zip(srows, drows) if sr.q != dr[1]
    ]
    assert not diverged, f"ln floors diverged: {diverged[:5]}"


def test_md5_and_char_length_identical(spark):
    # every dedup/fingerprint oracle leans on md5(shingle) agreeing
    # byte-for-byte across engines; length() must count CHARACTERS (not
    # bytes) on both for the text-quality thresholds. Pin both against
    # hashlib/Python over unicode, emoji, control chars, and empty.
    import hashlib

    ss = ["", "a", "héllo wörld", "tab\tsep", "emoji \U0001f389",
          "line\nbreak", "ß", "é vs é"]  # composed vs combining
    pdf = pd.DataFrame({"i": range(len(ss)), "s": ss})
    srows = _spark_rows(spark, pdf, "md5(s) AS h", "length(s) AS l")
    drows = _duck(pdf, "SELECT i, md5(s) h, length(s) l FROM t ORDER BY i")
    for sr, dr in zip(srows, drows):
        s = ss[sr.i]
        assert sr.h == dr[1] == hashlib.md5(s.encode()).hexdigest(), repr(s)
        assert sr.l == dr[2] == len(s), repr(s)


def test_collection_and_regex_trap_pins(spark):
    # the CLAUDE.md trap battery, pinned engine-pair so an engine
    # upgrade that changes any behavior fails here first:
    srow = spark.sql(
        "SELECT CAST(date_trunc('week', DATE'2024-01-04') AS DATE) wk, "
        "array_join(filter(array(CAST(NULL AS STRING)), x -> x IS NOT NULL), ',') aj, "
        "element_at(map('k', 7), 'k') ea, "
        "regexp_replace('aaa', 'a', 'b') rr, "
        "concat_ws('-', 'x', NULL, 'y') cw"
    ).collect()[0]
    con = duckdb.connect()
    try:
        drow = con.execute(
            "SELECT CAST(date_trunc('week', DATE'2024-01-04') AS DATE) wk, "
            "array_to_string(list_filter([NULL::VARCHAR], x -> x IS NOT NULL), ',') aj, "
            "coalesce(array_to_string(list_filter([NULL::VARCHAR], x -> x IS NOT NULL), ','), '') aj_fixed, "
            "element_at(map(['k'], [7]), 'k') ea, "
            "regexp_replace('aaa', 'a', 'b') rr_bare, "
            "regexp_replace('aaa', 'a', 'b', 'g') rr_g, "
            "concat_ws('-', 'x', NULL, 'y') cw"
        ).fetchone()
    finally:
        con.close()
    import datetime

    # date_trunc('week') lands on the same Monday once CAST to DATE on
    # both sides (Spark returns timestamp, DuckDB returns date — the
    # cast is the rule)
    assert srow.wk == drow[0] == datetime.date(2024, 1, 1)
    # all-NULL list: Spark array_join yields '', DuckDB NULL — oracle
    # must coalesce (pinned divergence + pinned fix)
    assert srow.aj == "" and drow[1] is None and drow[2] == ""
    # element_at(map, k): scalar in Spark, LIST in DuckDB — oracle
    # needs [1]
    assert srow.ea == 7 and drow[3] == [7]
    # regexp_replace: global in Spark, FIRST-match in DuckDB without
    # the 'g' flag
    assert srow.rr == "bbb" and drow[4] == "baa" and drow[5] == "bbb"
    # concat_ws skips NULLs identically on both
    assert srow.cw == drow[6] == "x-y"


def test_spark_sequence_descends_below_start(spark):
    # the xa0 trap: Spark's sequence(1, n) DESCENDS when n < 1 instead
    # of returning empty, so adjacent-pair explodes must filter
    # length >= 2 on BOTH sides.  Pin the behavior the guard exists for.
    row = spark.sql(
        "SELECT sequence(1, 0) AS down, sequence(1, 1) AS one, "
        "size(sequence(1, 0)) AS n"
    ).collect()[0]
    assert row.down == [1, 0] and row.one == [1] and row.n == 2


def test_time_bucketing_floor_idioms_pre_epoch(spark):
    # Two bucketing constructs, each with its own engine-exact oracle
    # form; the shared trap is DuckDB's BIGINT `//`, which TRUNCATES
    # where both Spark constructs FLOOR — invisible post-epoch (the
    # fixtures), divergent on every pre-epoch mid-bucket timestamp.
    #
    # (a) operators/timeseries.time_bucket =
    #     floor(unix_timestamp(ts) / B): truncate to whole seconds
    #     first (unix_timestamp drops the sub-second part toward zero),
    #     THEN floor-divide.  Oracle: floor((epoch_us // 1e6) / B.0).
    # (b) F.window(ts, ...).start: floors the RAW micros (no second
    #     truncation).  Oracle: floor(epoch_us / (B*1e6.0)).
    B = 21600
    ts = pd.to_datetime([
        "1969-12-31 20:00:00.000000",   # pre-epoch, mid-bucket: the trap row
        "1969-12-31 23:59:59.400000",   # pre-epoch sub-second: (a) and (b) differ
        "1969-12-31 18:00:00.000000",   # pre-epoch exact boundary
        "1970-01-01 00:00:00.000000",
        "2024-03-01 05:59:59.999999",   # post-epoch: all forms agree
    ]).astype("datetime64[us]")
    pdf = pd.DataFrame({"i": range(len(ts)), "ts": ts})
    srows = (
        spark.createDataFrame(pdf)
        .selectExpr(
            "i",
            f"cast(floor(unix_timestamp(ts) / {B}) as bigint) AS tb",
            f"cast(cast(window(ts, '{B} seconds').start as long) / {B} as bigint) AS wb",
        )
        .orderBy("i")
        .collect()
    )
    drows = _duck(pdf, (
        f"SELECT i, CAST(floor((epoch_us(ts) // 1000000) / {B}.0) AS BIGINT) tb, "
        f"CAST(floor(epoch_us(ts) / {B * 1_000_000}.0) AS BIGINT) wb, "
        f"epoch_us(ts) // {B * 1_000_000} trunc_wb "
        "FROM t ORDER BY i"
    ))
    # naive python, spelled explicitly: trunc seconds toward zero, then floor-div
    def trunc_sec(us: int) -> int:
        return us // 1_000_000 if us >= 0 else -((-us) // 1_000_000)
    for sr, dr in zip(srows, drows):
        us = int(ts[sr.i].value // 1000)
        assert sr.tb == dr[1] == math.floor(trunc_sec(us) / B), f"tb row {sr.i}"
        assert sr.wb == dr[2] == math.floor(us / (B * 1_000_000)), f"wb row {sr.i}"
    # the pinned trap: bare `//` truncation puts the pre-epoch mid-bucket
    # rows one slot HIGHER than both Spark constructs
    assert drows[0][3] == 0 and srows[0].tb == srows[0].wb == -1
    # and the two constructs legitimately differ on sub-second pre-epoch
    assert srows[1].tb == 0 and srows[1].wb == -1


def test_bpe_ish_token_regex_identical(spark):
    # doc_stats' n_bpe_ish: letter runs | digit runs | single
    # punctuation marks, counted with the IDENTICAL regex on both
    # engines.  The trap being pinned away is any split-based
    # formulation: the pre-r8 lookaround split counted 'hello, world'
    # as 2 where the oracle's regexp_extract_all counts 3 — green only
    # while fixtures contained no glued punctuation (the xb6 class).
    import re

    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    cases = [
        "hello, world", "aB test", "x!! y", "a_b c", "", "   ",
        "don't-stop... 12ab3", "a,b;c", "tab\tnl\nmix", "+-*/=()[]{}",
        "CamelCase99x", ".leading trailing.",
    ]
    pdf = pd.DataFrame({"i": range(len(cases)), "text": cases})
    from pyspark.sql import functions as F

    srows = (
        spark.createDataFrame(pdf)
        .select("i", F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias("n"))
        .orderBy("i")
        .collect()
    )
    drows = _duck(pdf, (
        r"SELECT i, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) n "
        "FROM t ORDER BY i"
    ))
    cre = re.compile(pat)
    for sr, dr, c in zip(srows, drows, cases):
        assert sr.n == dr[1] == len(cre.findall(c)), repr(c)
    # the banned formulation really does disagree: python replica of the
    # old lookaround split on the glued-punct case
    old = [p for p in re.split(r"\s+|(?<=[a-z])(?=[A-Z])", "hello, world") if p]
    assert len(old) == 2 and len(cre.findall("hello, world")) == 3


def test_count_ratio_round6_engine_identical(spark):
    # The jaccard family rounds count ratios with F.round(x, 6) and the
    # oracle mirrors round(x, 6): pin that Spark's BigDecimal-HALF_UP on
    # the shortest decimal repr and DuckDB's scaled half-away-from-zero
    # agree on adversarial count ratios — including exactly-representable
    # 6-decimal halfway points (the 20/512 class), where PYTHON's
    # banker's round is the odd one out (pinned too: the reason kernels
    # must not round with python's round()).
    # includes the jaccard-shaped adversarial 519/640 = 0.8109375 (an
    # exact 7-decimal halfway) — and a note on WHY this battery settles
    # the class: a count ratio c/u with u < ~1e8 either lands EXACTLY on
    # a 6-decimal halfway (c*1e6 divisible by u up to the .5 — these
    # rows) or sits at least 1/(2u) >> one double ulp away from it, so
    # the near-halfway-by-an-ulp scenario that could split the engines'
    # round implementations cannot arise for count ratios at all.
    pairs = [
        (20, 512), (1, 512), (3, 512), (1, 3), (2, 3), (1, 7), (5, 7),
        (519, 640), (173, 640), (1, 2048), (3, 2048), (999999, 2000000),
        (1, 1600000), (7, 1 << 21), (111111, 1 << 19),
    ] + [((a % 997) + 1, (b % 99991) + 2) for a, b in zip(_lcg(23, 40), _lcg(29, 40))]
    pdf = pd.DataFrame(
        {"i": range(len(pairs)),
         "c": [p[0] for p in pairs], "u": [p[1] for p in pairs]}
    )
    srows = _spark_rows(spark, pdf, "round(c / u, 6) AS j")
    drows = _duck(pdf, "SELECT i, round(c / CAST(u AS DOUBLE), 6) j FROM t ORDER BY i")
    diverged_from_python = 0
    for sr, dr in zip(srows, drows):
        c, u = pairs[sr.i]
        assert sr.j == dr[1], f"(c,u)=({c},{u}): spark {sr.j} vs duckdb {dr[1]}"
        diverged_from_python += round(c / u, 6) != sr.j
    # the python-banker divergence the JVM-side rounding rule avoids
    # really exists on the halfway cases (20/512 = 0.0390625 -> python
    # 0.039062, engines 0.039063)
    assert round(20 / 512, 6) == 0.039062 and srows[0].j == 0.039063
    assert diverged_from_python >= 1


def test_ntile_engine_identical_on_ragged_groups(spark):
    """xdc grades relevance with ntile(4) — the SQL-standard 'larger
    buckets first' split. Pin that Spark and DuckDB (and the naive
    definition: bucket b gets n//k + 1 rows while b <= n % k) agree for
    every ragged group size 1..13 and for k in {3, 4, 5}, with a
    deterministic ORDER BY — fixture-independent (the driver hash only
    proves agreement on sizes the fixture happens to produce)."""
    rows = []
    for n in range(1, 14):
        for i in range(n):
            rows.append((n, i))
    pdf = pd.DataFrame(rows, columns=["grp", "i"])
    for k in (3, 4, 5):
        got_spark = {
            (r.grp, r.i): r.nt
            for r in spark.createDataFrame(pdf)
            .selectExpr(
                "grp", "i", f"ntile({k}) over (partition by grp order by i) as nt"
            )
            .collect()
        }
        got_duck = {
            (g, i): nt
            for g, i, nt in _duck(
                pdf,
                f"SELECT grp, i, ntile({k}) OVER (PARTITION BY grp ORDER BY i) "
                "FROM t",
            )
        }
        want = {}
        for n in range(1, 14):
            sizes = [n // k + (1 if b < n % k else 0) for b in range(k)]
            pos = 0
            for b, sz in enumerate(sizes, start=1):
                for _ in range(sz):
                    want[(n, pos)] = b
                    pos += 1
        assert got_spark == want, f"spark ntile({k})"
        assert got_duck == want, f"duckdb ntile({k})"


def test_bpe_chain_early_convergence_engine_identical(spark):
    """r11 ADVICE fix pin: the unrolled BPE oracle chain must be a
    TOTAL function of the corpus — when adjacent pairs run out before
    round 5, text._bpe_iterate breaks and keeps the converged state,
    and the oracle's per-round LEFT JOIN b{r} ON true passes s{r-1}
    through unchanged (a CROSS JOIN against the empty argmax would
    empty the whole s{r}..s5 chain and report zero tokens for every
    doc — unreachable on current fixtures, i.e. an xb6-class
    fixture-luck agreement until pinned here)."""
    import duckdb as _duckdb

    from dask_snowflake_spark.operators import text as text_ops
    from dask_snowflake_spark.queries import registry

    # converges in ONE round: only "ab" carries a pair; after merging
    # (a,b) no word has two symbols left.  Includes an empty-text doc
    # (zeros path) and a length-1 word.
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b ab", "a", ""]}
    )
    docs = spark.createDataFrame(pdf)

    merges, state = text_ops._bpe_iterate(
        docs, "text", rounds=5, min_word_len=1
    )
    assert [m[:4] for m in merges] == [(1, "a", "b", "ab")]
    assert sorted(
        (r.w, r.pos, r.sym) for r in state.collect()
    ) == [("a", 0, "a"), ("ab", 0, "ab"), ("b", 0, "b")]

    got_spark = sorted(
        map(tuple, text_ops.bpe_segment(docs, rounds=5).collect())
    )
    con = _duckdb.connect()
    try:
        con.register("documents", pdf)
        got_duck = sorted(
            map(tuple, con.execute(registry()["bpe_segment_corpus"].oracle).fetchall())
        )
    finally:
        con.close()
    want = [
        (1, 3, 4, 3, 0.75),
        (2, 1, 1, 1, 1.0),
        (3, 0, 0, 0, 0.0),
    ]
    assert got_spark == want
    assert got_duck == want


def test_bitops_and_distinct_sum_engine_identical(spark):
    """The xeg/attribution_shapley lattice family relies on three
    constructs being engine-identical: `&`/`|`/bit_count on BIGINT,
    and sum(DISTINCT <power-of-2 codes>) as a portable bit_or.
    Pinned on adversarial literals (duplicates, zero, all-bits, a
    63-bit value), fixture-independent."""
    import duckdb

    spark_rows = spark.sql(
        """
        SELECT CAST(13 & 9 AS BIGINT),
               CAST(13 | 2 AS BIGINT),
               bit_count(CAST(4611686018427387904 AS BIGINT)),
               bit_count(CAST(15 AS BIGINT)),
               (SELECT CAST(sum(DISTINCT v) AS BIGINT)
                FROM VALUES (1), (1), (2), (0), (0), (8) AS t(v))
        """
    ).collect()[0]
    con = duckdb.connect()
    try:
        duck_rows = con.execute(
            """
            SELECT CAST(13 & 9 AS BIGINT),
                   CAST(13 | 2 AS BIGINT),
                   bit_count(CAST(4611686018427387904 AS BIGINT)),
                   bit_count(CAST(15 AS BIGINT)),
                   (SELECT CAST(sum(DISTINCT v) AS BIGINT)
                    FROM (VALUES (1), (1), (2), (0), (0), (8)) t(v))
            """
        ).fetchone()
    finally:
        con.close()
    assert tuple(spark_rows) == tuple(duck_rows) == (9, 15, 1, 4, 11)


def test_bloom_shift_bitor_engine_identical(spark):
    """xf7's Bloom bit math relies on shiftleft/<<, bit_or over shifted
    words, & probes and the 62-bit layout being engine-identical.
    Pinned on adversarial literals: bit 0, bit 61 (the top USED bit),
    a merged word, and a cleared-bit probe — fixture-independent."""
    import duckdb

    spark_rows = tuple(
        spark.sql(
            """
            SELECT CAST(shiftleft(1L, 0) AS BIGINT),
                   CAST(shiftleft(1L, 61) AS BIGINT),
                   (SELECT CAST(bit_or(shiftleft(1L, CAST(b AS INT))) AS BIGINT)
                    FROM VALUES (0), (61), (0), (17) AS t(b)),
                   CAST(shiftleft(1L, 61) & shiftleft(1L, 61) AS BIGINT),
                   CAST(shiftleft(1L, 61) & shiftleft(1L, 17) AS BIGINT)
            """
        ).collect()[0]
    )
    con = duckdb.connect()
    try:
        duck_rows = con.execute(
            """
            SELECT CAST(1::BIGINT << 0 AS BIGINT),
                   CAST(1::BIGINT << 61 AS BIGINT),
                   (SELECT CAST(bit_or(1::BIGINT << CAST(b AS INT)) AS BIGINT)
                    FROM (VALUES (0), (61), (0), (17)) t(b)),
                   CAST((1::BIGINT << 61) & (1::BIGINT << 61) AS BIGINT),
                   CAST((1::BIGINT << 61) & (1::BIGINT << 17) AS BIGINT)
            """
        ).fetchone()
    finally:
        con.close()
    want = (1, 1 << 61, (1 << 61) | (1 << 17) | 1, 1 << 61, 0)
    assert spark_rows == tuple(duck_rows) == want


def test_literal_table_interpolation_engine_identical(spark):
    """The r12 interpolated-literal-table idiom (quality_classifier
    sigmoid, xfc/xfd erfc) relies on `element_at(lit_array, k)` vs
    DuckDB list indexing plus the integer interpolation
    `t[b] + (t[b+1] - t[b]) * off // W` being engine-identical.
    Pinned on adversarial inputs: exact bucket edges (off = 0), the
    last representable input (off = W-1), negative table deltas
    (decreasing tables — erfc), a negative interpolation product, and
    the clamp boundary — fixture-independent.

    CONTRACT the pin itself discovered: the OFF operand must be
    BIGINT-typed. DuckDB types a fitting literal list as INT32, and
    INT32 table-delta x INT32 off overflows loudly at erfc-table
    magnitudes (delta ~1.7e8 x off ~1e5 — the r10 INT32-literal
    class); every production user (quality_classifier, xfc, xfd)
    derives off from a BIGINT input, which promotes the multiply to
    BIGINT on both engines. The probe spine below casts to BIGINT for
    exactly that reason — remove the cast and DuckDB throws."""
    import duckdb

    table = [0, 7, 5, -3, 1_000_000_000]  # non-monotone on purpose
    w = 125
    probes = [0, 1, 124, 125, 249, 374, 499]  # edges + interior + last
    lit = "[" + ",".join(str(v) for v in table) + "]"
    spark_rows = [
        tuple(r)
        for r in spark.sql(
            f"""
            SELECT s,
                   element_at(array({",".join(str(v) for v in table)}),
                              CAST(s div {w} AS INT) + 1)
                   + ((element_at(array({",".join(str(v) for v in table)}),
                                  CAST(s div {w} AS INT) + 2)
                       - element_at(array({",".join(str(v) for v in table)}),
                                    CAST(s div {w} AS INT) + 1))
                      * (s - (s div {w}) * {w})) div {w} AS p
            FROM (SELECT CAST(s0 AS BIGINT) AS s
                  FROM VALUES {",".join(f"({p})" for p in probes)} AS t(s0))
            ORDER BY s
            """
        ).collect()
    ]
    con = duckdb.connect()
    try:
        duck_rows = con.execute(
            f"""
            SELECT s,
                   {lit}[CAST((s // {w}) + 1 AS INT)]
                   + (({lit}[CAST((s // {w}) + 2 AS INT)]
                       - {lit}[CAST((s // {w}) + 1 AS INT)])
                      * (s - (s // {w}) * {w})) // {w} AS p
            FROM (SELECT CAST(s0 AS BIGINT) AS s
                  FROM (VALUES {",".join(f"({p})" for p in probes)}) t(s0))
            ORDER BY s
            """
        ).fetchall()
    finally:
        con.close()

    # python // floors; engines truncate toward zero — compute the
    # trunc-div reference explicitly
    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    want = [
        (s, table[s // w] + tdiv((table[s // w + 1] - table[s // w]) * (s - (s // w) * w), w))
        for s in probes
    ]
    assert spark_rows == [tuple(r) for r in duck_rows] == want


def test_degenerate_denominator_case_guards_engine_identical(spark):
    """r13 ADVICE fix pin: the bh_fdr/did_readout z^2 expressions
    CASE-guard degenerate denominators (x_all = 0 / x_all = n_all /
    empty 2x2 cell / zero pooled variance) to 0 with IDENTICAL text on
    both engines — unguarded they produce Inf/NaN, which ANSI Spark
    turns into a CAST error and DuckDB into a different failure, and a
    zero variance could even drive z2 negative into an out-of-range
    erfc-table index. CASE must short-circuit on BOTH engines (the
    second WHEN's division never evaluates when the first WHEN fires)."""
    import duckdb

    # (x_i, n_i, x_all, n_all) tuples: healthy, all-zero rate, saturated
    vals = [(3, 10, 40, 100), (0, 10, 0, 100), (10, 10, 100, 100)]
    z2 = (
        "CAST(CASE WHEN x_all = 0 OR x_all = n_all THEN 0"
        " ELSE CAST(floor((CAST(x_i * n_all - n_i * x_all AS DOUBLE)"
        " * (x_i * n_all - n_i * x_all))"
        " / (CAST(n_i AS DOUBLE) * x_all * (n_all - x_all))"
        " * 1000000) AS BIGINT) END AS BIGINT)"
    )
    spine = ",".join(f"({x},{n},{xa},{na})" for x, n, xa, na in vals)
    srows = [
        tuple(r)
        for r in spark.sql(
            "SELECT x_i, " + z2 + " AS z2_q FROM VALUES "
            + spine
            + " AS t(x_i, n_i, x_all, n_all) ORDER BY x_i"
        ).collect()
    ]
    con = duckdb.connect()
    try:
        drows = con.execute(
            "SELECT x_i, " + z2 + " AS z2_q FROM (SELECT"
            " CAST(c0 AS BIGINT) x_i, CAST(c1 AS BIGINT) n_i,"
            " CAST(c2 AS BIGINT) x_all, CAST(c3 AS BIGINT) n_all"
            f" FROM (VALUES {spine}) t(c0, c1, c2, c3)) ORDER BY x_i"
        ).fetchall()
    finally:
        con.close()
    assert srows == [tuple(r) for r in drows]
    by_x = dict(srows)
    assert by_x[0] == 0 and by_x[10] == 0  # both degenerate branches fire
    assert by_x[3] > 0  # healthy branch computes

    # zero-pooled-variance guard (the DiD shape): variance term <= 0
    # must yield 0, not Inf/NaN/negative
    var_guard = (
        "CAST(CASE WHEN n = 0 THEN 0"
        " WHEN (CAST(q AS DOUBLE) / n - (CAST(s AS DOUBLE) / n)"
        " * (CAST(s AS DOUBLE) / n)) <= 0 THEN 0"
        " ELSE CAST(floor(100.0 / ((CAST(q AS DOUBLE) / n"
        " - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))"
        " * 1000000) AS BIGINT) END AS BIGINT)"
    )
    cases = [(0, 0, 0), (4, 8, 16), (3, 6, 14)]  # empty, zero-var, healthy
    sp = ",".join(f"({n},{s},{q})" for n, s, q in cases)
    s2 = [
        tuple(r)
        for r in spark.sql(
            "SELECT n, " + var_guard + " AS g FROM VALUES "
            + sp
            + " AS t(n, s, q) ORDER BY n"
        ).collect()
    ]
    con = duckdb.connect()
    try:
        d2 = con.execute(
            "SELECT n, " + var_guard + " AS g FROM (SELECT"
            " CAST(c0 AS BIGINT) n, CAST(c1 AS BIGINT) s, CAST(c2 AS BIGINT) q"
            f" FROM (VALUES {sp}) t(c0, c1, c2)) ORDER BY n"
        ).fetchall()
    finally:
        con.close()
    assert s2 == [tuple(r) for r in d2]
    gm = dict(s2)
    assert gm[0] == 0 and gm[4] == 0 and gm[3] > 0


def test_hdr_bucket_encode_decode_engine_identical(spark):
    """xft's HDR bucket layout is the driver-facing CONTRACT, so the
    pure-integer msb form (length(bin(v))-1), the variable-amount
    shifts and the decode must be engine-identical AND self-consistent
    (lo <= v <= hi for every v) on adversarial literals: bucket-regime
    boundary (31/32/33), exact powers of two, power+-1, and
    beyond-float-ulp magnitudes where a log-based form could flip."""
    import duckdb

    vals = [1, 2, 31, 32, 33, 63, 64, 65, 1023, 1024, 1025,
            999_999, 1_048_576, 1_048_577, 4_398_046_511_103,
            4_398_046_511_104, 4_398_046_511_105]
    enc = (
        "CASE WHEN c < 32 THEN c"
        " ELSE ((length(bin(c)) - 1) - 5) * 32"
        "      + ((c >> ((length(bin(c)) - 1) - 5)) & 31) + 32 END"
    )

    def dec_sql(div):
        return (
            "CASE WHEN bucket < 32 THEN bucket"
            f" ELSE (32 + (bucket - 32) % 32) << ((bucket - 32) {div} 32) END AS lo,"
            " CASE WHEN bucket < 32 THEN bucket"
            f" ELSE ((32 + (bucket - 32) % 32) << ((bucket - 32) {div} 32))"
            f"      + (CAST(1 AS BIGINT) << ((bucket - 32) {div} 32)) - 1 END AS hi"
        )

    spine = ",".join(f"({v}L)" for v in vals)
    srows = [
        tuple(r)
        for r in spark.sql(
            f"SELECT c, bucket, {dec_sql('div')} FROM"
            f" (SELECT c, {enc} AS bucket FROM VALUES {spine} AS t(c))"
            " ORDER BY c"
        ).collect()
    ]
    con = duckdb.connect()
    try:
        dspine = ",".join(f"({v})" for v in vals)
        drows = con.execute(
            f"SELECT c, bucket, {dec_sql('//')} FROM"
            f" (SELECT c, {enc} AS bucket FROM"
            f"  (SELECT CAST(c0 AS BIGINT) AS c FROM (VALUES {dspine}) t(c0)))"
            " ORDER BY c"
        ).fetchall()
    finally:
        con.close()
    assert srows == [tuple(r) for r in drows]
    # python reference: msb via bit_length, and containment
    for c, bucket, lo, hi in srows:
        e = c.bit_length() - 1
        want = c if c < 32 else (e - 5) * 32 + ((c >> (e - 5)) & 31) + 32
        assert bucket == want, (c, bucket, want)
        assert lo <= c <= hi, (c, lo, hi)
        if c >= 32:
            assert (hi - lo + 1) * 32 == (1 << (e - 5)) * 32  # width = 2^(e-5)
    # bucket is monotone in v (the property the rank walk relies on)
    bks = [b for _, b, _, _ in srows]
    assert bks == sorted(bks)


def test_hdr_sketch_merge_law(spark):
    """Two shard sketches merge by bucket-wise count sum == the union
    sketch (the property that makes the histogram THE production
    percentile structure at 100 TB)."""
    from pyspark.sql import functions as F

    enc = (
        "CASE WHEN c < 32 THEN c"
        " ELSE ((length(bin(c)) - 1) - 5) * 32"
        "      + ((c >> ((length(bin(c)) - 1) - 5)) & 31) + 32 END"
    )
    vals = [1, 7, 33, 99, 100, 101, 5000, 123456, 123457, 99999999]

    def sketch(vs):
        df = spark.createDataFrame([(v,) for v in vs], "c long")
        return (
            df.select(F.expr(enc).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    a, b = sketch(vals[:5]), sketch(vals[5:])
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in sketch(vals).collect()
    )


def test_hll_slice_rank_and_estimator_engine_identical(spark):
    """hll_cardinality's register extraction (2-hex bucket, 12-hex
    48-bit rank field via length(bin(v))) and pure-integer estimator
    (alpha*2^65/S as q*16 + rem*16 // S) must be engine-identical on
    adversarial hex literals — all-zero field (rank 49), minimal field
    (rank 48 boundary), all-ones (rank 1), single-top-bit, and the
    estimator at both S extremes (empty sketch S = 256*2^49, near-full
    S) — fixture-independent (r14 adversarial pass)."""
    import duckdb

    from dask_snowflake_spark.operators.cardinality import HLL_ALPHA_NUM

    hexes = [
        "00" + "000000000000",
        "00" + "000000000001",
        "ff" + "ffffffffffff",
        "80" + "800000000000",
        "0a" + "0000000f0000",
        "7f" + "123456789abc",
    ]
    spark_rows = []
    for h in hexes:
        r = spark.sql(
            f"SELECT cast(conv(substring('{h}', 1, 2), 16, 10) as bigint) AS b,"
            f" CASE WHEN cast(conv(substring('{h}', 3, 12), 16, 10) as bigint) = 0"
            f" THEN CAST(49 AS BIGINT) ELSE CAST(49 - length(bin("
            f"cast(conv(substring('{h}', 3, 12), 16, 10) as bigint))) AS BIGINT)"
            f" END AS rk"
        ).collect()[0]
        spark_rows.append((r.b, r.rk))
    con = duckdb.connect()
    duck_rows = []
    for h in hexes:
        b, rk = con.execute(
            f"SELECT ('0x' || substr('{h}', 1, 2))::BIGINT,"
            f" CASE WHEN ('0x' || substr('{h}', 3, 12))::BIGINT = 0 THEN 49"
            f" ELSE 49 - length(bin(('0x' || substr('{h}', 3, 12))::BIGINT)) END"
        ).fetchone()
        duck_rows.append((b, rk))
    assert spark_rows == duck_rows
    assert spark_rows[0] == (0, 49)  # all-zero field
    assert spark_rows[1] == (0, 1 + 47)  # v = 1 -> rank 48
    assert spark_rows[2] == (255, 1)  # top bit set -> rank 1

    # estimator division pair at S extremes
    for s in [256 * (1 << 49), 2048, 123_456_789, (1 << 57) - 1]:
        sp = spark.sql(
            f"SELECT (CAST({HLL_ALPHA_NUM} AS BIGINT) div {s}) * 16"
            f" + ((CAST({HLL_ALPHA_NUM} AS BIGINT) % {s}) * 16) div {s} AS e"
        ).collect()[0].e
        du = con.execute(
            f"SELECT ({HLL_ALPHA_NUM} // {s}) * 16"
            f" + (({HLL_ALPHA_NUM} % {s}) * 16) // {s}"
        ).fetchone()[0]
        assert sp == du == (HLL_ALPHA_NUM * 16) // s, s
