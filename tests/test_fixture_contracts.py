"""Fixture contracts the oracle SQL depends on.

Fixtures regenerate between build rounds (TESTDATA.md); these tests
make the regeneration FAIL LOUDLY when it breaks an assumption an
oracle encodes implicitly, instead of silently diverging a value hash:

- x74's oracle replays the aHash kernel with CHARACTER semantics
  (length/substr/ascii) while the Python kernel samples UTF-8 BYTES —
  they agree only while ``documents.text`` is pure ASCII.
- x66 (and the x68/x78/x80/x87 family) quantize with
  ``floor(ln(...) * 1e6)``; ln is only ~1-ulp-accurate on either
  engine, so a ratio whose scaled ln lands within a few ulps of an
  integer boundary could floor differently per engine. One flipped
  vocab word in x66 changes ``nll_sum_q``/``flagged`` for every doc
  containing it.

No Spark needed — pure pyarrow/python over the parquet fixtures.
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# ln(x)*1e6 carries ~4e-9 of ulp noise at the magnitudes involved
# (|ln| <= ~25); a boundary distance above 2e-8 (~5 ulps) means no
# conforming libm can floor the value differently.
_BOUNDARY_GUARD = 2e-8


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_documents_text_is_ascii(sf_dir: str) -> None:
    """x74's oracle uses char-position SQL against a byte-sampling
    kernel; valid only on ASCII payloads."""
    col = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].combine_chunks()
    n_bytes = pc.binary_length(col.cast(pa.binary()))
    n_chars = pc.utf8_length(col)
    non_ascii = pc.sum(pc.cast(pc.not_equal(n_bytes, n_chars), pa.int64())).as_py()
    assert not non_ascii, (
        f"{non_ascii} documents at {sf_dir} contain multibyte text; "
        "x74's char-semantics oracle no longer matches the byte-sampling "
        "kernel — rebase the oracle on byte positions before trusting it"
    )


def test_x66_ln_quantization_away_from_boundaries() -> None:
    """Every vocab word's floor(ln(total/cnt)*1e6) input must sit a few
    ulps clear of an integer boundary at the oracle-compare scale
    (sf0.01), so JVM Math.log and DuckDB libm cannot floor apart."""
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 fixtures absent")
    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    vocab: Counter[str] = Counter()
    for t in texts:
        vocab.update(w for w in re.split(r"\s+", t) if w != "")
    total = sum(vocab.values())
    worst = None
    for cnt in set(vocab.values()):
        scaled = math.log(total / cnt) * 1_000_000
        dist = abs(scaled - round(scaled))
        if worst is None or dist < worst[0]:
            worst = (dist, cnt)
    assert worst is not None
    assert worst[0] > _BOUNDARY_GUARD, (
        f"vocab count {worst[1]} puts ln(total/cnt)*1e6 within {worst[0]:.2e} "
        "of an integer boundary — engines may floor x66's micro-nats apart; "
        "regenerate fixtures or adjust the quantization"
    )


def _boundary_guard(scaled: float) -> float:
    """Minimum safe distance from an integer boundary for a quantized
    double: ~32 ulps of the value's magnitude (the ln + multiply chain
    accumulates a few ulps of relative error on either engine), floored
    at the x66 absolute guard for small magnitudes."""
    return max(_BOUNDARY_GUARD, 32 * 2.220446049250313e-16 * abs(scaled))


def _assert_clear(values, label: str) -> None:
    worst = None
    for ident, scaled in values:
        if scaled == 0.0:
            continue  # exact zero (ln(1.0) is exact): floors identically
        dist = abs(scaled - round(scaled))
        margin = dist - _boundary_guard(scaled)
        if worst is None or margin < worst[0]:
            worst = (margin, ident, scaled, dist)
    assert worst is not None, f"{label}: fixture produced no quantized terms"
    margin, ident, scaled, dist = worst
    assert margin > 0, (
        f"{label}: input {ident} puts its scaled ln-term {scaled!r} within "
        f"{dist:.3e} of an integer boundary (guard {_boundary_guard(scaled):.3e}) "
        "— engines may floor apart; regenerate fixtures or adjust quantization"
    )


def _events_sf001():
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 fixtures absent")
    return pq.read_table(os.path.join(sf_dir, "events.parquet"))


def _documents_sf001():
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 fixtures absent")
    return pq.read_table(os.path.join(sf_dir, "documents.parquet"))


def test_x68_psi_terms_away_from_boundaries() -> None:
    """x68 quantizes (p_a - p_b) * ln(p_a/p_b) * 1e9 per histogram bin
    (Laplace-smoothed purchase-value proportions, days 1-15 vs 16-31).
    Replays the oracle's exact float expression over the fixture."""
    tbl = _events_sf001()
    days = pc.day(tbl["ts"]).to_pylist()
    types = tbl["event_type"].to_pylist()
    vals = tbl["value"].to_pylist()
    n_a = [0] * 20
    n_b = [0] * 20
    for d, ty, v in zip(days, types, vals):
        if ty != "purchase" or v is None:
            continue
        b = min(int(math.floor(v / 20)), 19)
        if d <= 15:
            n_a[b] += 1
        else:
            n_b[b] += 1
    ta, tb = sum(n_a), sum(n_b)
    terms = []
    for b in range(20):
        scaled = (
            ((n_a[b] + 1.0) / (ta + 20) - (n_b[b] + 1.0) / (tb + 20))
            * math.log(((n_a[b] + 1.0) * (tb + 20)) / ((n_b[b] + 1.0) * (ta + 20)))
            * 1_000_000_000
        )
        terms.append((f"bin {b}", scaled))
    _assert_clear(terms, "x68 PSI")


def test_x78_aes_keys_away_from_boundaries() -> None:
    """x78 quantizes ln((hash%1e6 + 1)/1e6) / n_chars * 1e9 per doc
    (Efraimidis-Spirakis keys from the portable md5 hash)."""
    import hashlib

    tbl = _documents_sf001()
    terms = []
    for doc_id, n_chars in zip(tbl["doc_id"].to_pylist(), tbl["n_chars"].to_pylist()):
        if n_chars is None or n_chars <= 0:
            continue
        h = int(hashlib.md5(f"es:{doc_id}".encode()).hexdigest()[:15], 16) % 1_000_000
        scaled = math.log((h + 1) / 1000000.0) / n_chars * 1_000_000_000
        terms.append((f"doc {doc_id}", scaled))
    _assert_clear(terms, "x78 A-ES keys")


def test_x80_pmi_away_from_boundaries() -> None:
    """x80 quantizes ln(N * c_ab / (c_a * c_b)) * 1e6 per co-occurring
    top-20-vocab word pair (document-level incidence)."""
    tbl = _documents_sf001()
    doc_words: dict[int, set[str]] = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        doc_words[doc_id] = {w for w in re.split(r"\s+", text) if w != ""}
    df: Counter[str] = Counter()
    for ws in doc_words.values():
        df.update(ws)
    vocab = {
        w: c for w, c in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    }
    n_docs = len(doc_words)
    pair_counts: Counter[tuple[str, str]] = Counter()
    for ws in doc_words.values():
        hits = sorted(w for w in ws if w in vocab)
        for i, a in enumerate(hits):
            for b in hits[i + 1 :]:
                pair_counts[(a, b)] += 1
    terms = []
    for (a, b), c_ab in pair_counts.items():
        scaled = math.log((c_ab * n_docs * 1.0) / (vocab[a] * vocab[b])) * 1_000_000
        terms.append((f"pair {a}/{b}", scaled))
    _assert_clear(terms, "x80 PMI")


def test_x87_entropy_terms_away_from_boundaries() -> None:
    """x87 quantizes (c/n) * ln(n/c) * 1e9 per (user, event_type)
    count against the user's event total."""
    tbl = _events_sf001()
    counts: Counter[tuple[int, str]] = Counter()
    for u, ty in zip(tbl["user_id"].to_pylist(), tbl["event_type"].to_pylist()):
        counts[(u, ty)] += 1
    totals: Counter[int] = Counter()
    for (u, _), c in counts.items():
        totals[u] += c
    terms = []
    for (u, ty), c in counts.items():
        n = totals[u]
        scaled = (c * 1.0 / n) * math.log(n * 1.0 / c) * 1_000_000_000
        terms.append((f"user {u} type {ty}", scaled))
    _assert_clear(terms, "x87 entropy")


def test_xb3_bigram_nll_away_from_boundaries() -> None:
    """xb3 quantizes ln((c1 + V)/(c12 + 1)) * 1e6 per corpus bigram
    (add-1 smoothed bigram LM over whitespace tokens)."""
    tbl = _documents_sf001()
    c12: Counter[tuple[str, str]] = Counter()
    c1: Counter[str] = Counter()
    vocab: set[str] = set()
    for text in tbl["text"].to_pylist():
        ws = [w for w in re.split(r"\s+", text) if w != ""]
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    terms = []
    for (a, b), c in c12.items():
        scaled = math.log((c1[a] + v) * 1.0 / (c + 1)) * 1_000_000
        terms.append((f"bigram {a}->{b}", scaled))
    _assert_clear(terms, "xb3 bigram NLL")


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_xcw_kcore_converges_within_round_cap(sf_dir: str) -> None:
    """xcw's 8-round peel cap is a TOTAL-function device (both engines
    compute the identical bounded peel either way), but layer 0 only
    means "true 2-core" when the fixture graph converges within the
    cap. Pin that it does on every shipped SF — naive Python peeling
    over the same support-2 co-purchase edges (duckdb-built, engine-
    independent), so a regenerated fixture that peels deeper than 8
    fails HERE with a clear message instead of silently weakening the
    query's documented meaning."""
    import duckdb

    path = os.path.join(sf_dir, "lineitem.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{sf_dir} fixtures absent")
    con = duckdb.connect()
    edges = con.execute(
        """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey
            FROM read_parquet(?)
        )
        SELECT a.l_partkey, b.l_partkey
        FROM items a
        JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        [path],
    ).fetchall()
    con.close()
    # ONE naive-peel implementation repo-wide (test_graph._naive_onion,
    # the operator's own third verification layer): converged within 8
    # rounds <=> an 8-capped and a 9-capped peel produce identical
    # layers (an unconverged graph would peel someone at round 9)
    from .test_graph import _naive_onion

    assert _naive_onion(edges, k=2, max_rounds=8) == _naive_onion(
        edges, k=2, max_rounds=9
    ), (
        f"{sf_dir}: co-purchase peel does not converge within 8 rounds; "
        "xcw's layer-0 no longer equals the true 2-core — raise the cap "
        "in BOTH the operator call and _kcore_oracle_sql (they must "
        "move together)"
    )


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_event_values_are_non_negative(sf_dir: str) -> None:
    """The integer-cents quantizations over events.value (xd1's
    largest-remainder apportionment, the stateful-counter floor, x37's
    windowed statistics) assume NON-NEGATIVE values: a negative value
    would route round()/floor() through the signed-halfway class where
    magnitude+sign decomposition is required (the r6 lesson). If a
    regenerated fixture introduces negative values, quantize by
    magnitude with a separate sign column instead of widening this
    contract."""
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["value"])
    vals = tbl["value"]
    n_neg = pc.sum(
        pc.cast(pc.less(vals, pa.scalar(0.0)), pa.int64()), min_count=0
    ).as_py()
    assert not n_neg, f"{n_neg} negative event values at {sf_dir}"


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_event_ts_is_non_null(sf_dir: str) -> None:
    """Date-ordered windows over events.ts (the CUSUM changepoint's
    cumulative-sum/tie-break windows, the daily rollup family) assume a
    NON-NULL timestamp: a NULL ts would form a NULL-date group that
    sorts NULLS FIRST in Spark but NULLS LAST in DuckDB, shifting every
    intermediate cumsum and potentially the picked changepoint (ADVICE
    r9). If a regenerated fixture introduces NULL ts, add explicit
    ``ts IS NOT NULL`` filters (both engines) to every date-ordered
    window query instead of widening this contract."""
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    n_null = tbl["ts"].null_count
    assert not n_null, f"{n_null} NULL event timestamps at {sf_dir}"


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_documents_text_is_non_null(sf_dir: str) -> None:
    """Every text operator splits documents.text and most count the
    resulting words; a NULL text would diverge the engines at the very
    first step — Spark's size(split(NULL)) is -1 (legacy sizeOfNull)
    where DuckDB's len(regexp_split_to_array(NULL)) is NULL — so
    dedup_region_apply's n_words (and every downstream word count)
    agrees only while text is NON-NULL (r11 adversarial review of the
    xde family). If a regenerated fixture introduces NULL text, add
    explicit ``text IS NOT NULL`` filters (or coalesce to '') on BOTH
    sides of every text query instead of widening this contract."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    n_null = tbl["text"].null_count
    assert not n_null, f"{n_null} NULL document texts at {sf_dir}"


def test_xdk_dsir_terms_away_from_boundaries() -> None:
    """xdk quantizes the SIGNED per-word importance
    floor(ln(((ct+1)(ns+v))/((cs+1)(nt+v))) * 1e6) once at the vocab
    level; every term must sit clear of an integer boundary at the
    oracle-compare SF so the engines' libm cannot floor apart (the
    x66/x68/xb3 contract class)."""
    tbl = _documents_sf001()
    vocab_s: Counter[str] = Counter()
    vocab_t: Counter[str] = Counter()
    for lang, text in zip(tbl["lang"].to_pylist(), tbl["text"].to_pylist()):
        ws = re.split(r"\s+", text)
        vocab_s.update(ws)
        if lang == "en":
            vocab_t.update(ws)
    ns, nt, v = sum(vocab_s.values()), sum(vocab_t.values()), len(vocab_s)
    terms = []
    for w, cs in vocab_s.items():
        ct = vocab_t.get(w, 0)
        scaled = math.log(((ct + 1) * (ns + v)) / ((cs + 1) * (nt + v))) * 1_000_000
        terms.append((w, scaled))
    _assert_clear(terms, "xdk dsir importance")


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_documents_lang_is_non_null(sf_dir: str) -> None:
    """Many queries group and ORDER BY documents.lang (xdt_data_mixture,
    x19 splits, xdl fertility, doc_stats consumers): a NULL lang would
    form a NULL group that sorts NULLS FIRST in Spark but NULLS LAST
    in DuckDB — the same divergence class as the events.ts contract
    (r11 review of xdl). If a regenerated fixture introduces NULL
    langs, coalesce to a sentinel ('und') on BOTH sides of every
    lang-keyed query instead of widening this contract."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["lang"])
    n_null = tbl["lang"].null_count
    assert not n_null, f"{n_null} NULL document langs at {sf_dir}"


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_embeddings_dim_and_component_bounds(sf_dir: str) -> None:
    """xdp's exactness proof needs |comp| < 1 (float32 24-bit mantissa
    x |int| < 2^28 stays within a 53-bit double mantissa, so every
    per-term floor(comp * int) is boundary-free) and its Spark side
    pins dim = 64 (the r7 rule: pass known dims as params instead of
    probing first()). If a regenerated fixture widens either, bump the
    dim constant / re-derive the bit budget rather than widening this
    contract."""
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    col = tbl["embedding"].combine_chunks()
    flat = col.flatten()
    mx = pc.max(pc.abs(flat)).as_py()
    assert mx < 1.0, f"|embedding component| reaches {mx} at {sf_dir}"
    lens = pc.list_value_length(col)
    assert pc.min(lens).as_py() == 64 and pc.max(lens).as_py() == 64


def test_xer_jsd_terms_away_from_boundaries() -> None:
    """xer quantizes the per-word KL-leg term
    floor(ln((2*cp*nq)/(cp*nq + cq*np)) * 1e6) once per (lang pair,
    word) leg; every term must sit clear of an integer boundary at the
    oracle-compare SF so the engines' libm cannot floor apart (the
    x66/x68/xb3/xdk contract class). cq = 0 gives ln 2 exactly —
    covered by the guard like any other term."""
    tbl = _documents_sf001()
    vocab: dict[str, Counter[str]] = {}
    for lang, text in zip(tbl["lang"].to_pylist(), tbl["text"].to_pylist()):
        ws = [w for w in re.split(r"\s+", text.lower().strip()) if w]
        vocab.setdefault(lang, Counter()).update(ws)
    totals = {lang: sum(c.values()) for lang, c in vocab.items()}
    terms = []
    for la, ca in vocab.items():
        for lb, cb in vocab.items():
            if lb == la:
                continue
            np_, nq = totals[la], totals[lb]
            for w, cp in ca.items():
                cq = cb.get(w, 0)
                scaled = (
                    math.log((2.0 * cp * nq) / (cp * nq + cq * np_)) * 1_000_000
                )
                terms.append((f"{la}->{lb}:{w}", scaled))
    _assert_clear(terms, "xer jsd leg terms")


def test_xeu_hill_terms_away_from_boundaries() -> None:
    """xeu quantizes floor(ln(cents_i / cents_(k+1)) * 1e6) over the
    top-101 purchase cents; every term must sit clear of an integer
    boundary at the oracle-compare SF (the x66/xdk contract class).
    ln(1) = 0 terms are exact and excluded by the guard helper."""
    tbl = _events_sf001()
    cents = sorted(
        (
            round(v * 100)
            for ty, v in zip(
                tbl["event_type"].to_pylist(), tbl["value"].to_pylist()
            )
            if ty == "purchase" and round(v * 100) > 0
        ),
        reverse=True,
    )[:101]
    terms = []
    for k in (50, 100):
        x_k1 = cents[k]
        for i in range(k):
            scaled = math.log(cents[i] / x_k1) * 1_000_000
            terms.append((f"k{k}:i{i}", scaled))
    _assert_clear(terms, "xeu hill ln terms")


def test_xev_zipf_lns_away_from_boundaries() -> None:
    """xev floor-quantizes ln(rank)*1e3 and ln(count)*1e3 (milli-nats
    since the r12 overflow fix) over the whole vocabulary; every value
    must sit clear of an integer boundary at the oracle-compare SF
    (ln(1) = 0 ranks/counts are exact and skipped by the guard
    helper)."""
    tbl = _documents_sf001()
    vocab: Counter[str] = Counter()
    for text in tbl["text"].to_pylist():
        vocab.update(w for w in re.split(r"\s+", text.lower().strip()) if w)
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    terms = []
    for rk, (w, c) in enumerate(ranked, start=1):
        terms.append((f"rank:{rk}", math.log(rk) * 1_000))
        terms.append((f"count:{w}", math.log(c) * 1_000))
    _assert_clear(terms, "xev zipf ln values")


def test_dbscan_cell_sizes_far_under_kernel_bound() -> None:
    """dbscan_embeddings' per-cell kernel is O(cell^2) by design and
    raises loudly beyond _DBSCAN_MAX_CELL (the r12 cell-size
    CONTRACT); the fixture's label cells must sit orders of magnitude
    under the bound at every local SF so the guard never fires in a
    correct run — if a regenerated fixture ever skews one label, this
    fails before the kernel melts."""
    from dask_snowflake_spark.ext_queries import _DBSCAN_MAX_CELL

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/embeddings.parquet"
        if not os.path.exists(path):
            continue
        tbl = pq.read_table(path, columns=["label"])
        counts = pc.value_counts(tbl["label"])
        biggest = max(c["counts"].as_py() for c in counts)
        assert biggest * 10 <= _DBSCAN_MAX_CELL, (sf, biggest)


def test_dbscan_kernel_guard_raises_on_oversized_cell(monkeypatch) -> None:
    """The _DBSCAN_MAX_CELL guard fails LOUDLY with the mitigation in
    the message (contract: never silently quadratic)."""
    import pandas as pd
    import pytest

    from dask_snowflake_spark import ext_queries

    monkeypatch.setattr(ext_queries, "_DBSCAN_MAX_CELL", 4)
    pdf = pd.DataFrame(
        {"vec_id": range(5), "label": [0] * 5, "vq": [[0, 0]] * 5}
    )
    with pytest.raises(ValueError, match="finer blocking key"):
        ext_queries._dbscan_cell_kernel(pdf)
    # under the bound the kernel runs: 5 coincident points are all
    # core (4 in-range others each) in one min-id cluster
    monkeypatch.setattr(ext_queries, "_DBSCAN_MAX_CELL", 100)
    out = ext_queries._dbscan_cell_kernel(pdf)
    assert len(out) == 5
    assert list(out["is_core"]) == [1] * 5
    assert list(out["cluster"]) == [0] * 5


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_row_keys_are_unique(sf_dir: str) -> None:
    """documents.doc_id / embeddings.vec_id / events.event_id must be
    unique (r12 input contract): every doc-keyed join in the package
    assumes one row per key — quality_classifier's chars-wp join (and
    its oracle's per-row wp CTE vs Spark's GROUPED word_profile) would
    fan out DIFFERENTLY per engine on a duplicated key, the xb6
    fixture-luck class. Also (ts, event_id) lag orders (xes) need
    event_id unique to be total orders."""
    for table, key in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ):
        col = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=[key])[
            key
        ]
        n = len(col)
        n_unique = pc.count_distinct(col.combine_chunks()).as_py()
        assert n == n_unique, (sf_dir, table, key, n, n_unique)


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_events_type_and_user_are_non_null(sf_dir: str) -> None:
    """hll_cardinality shards on event_type and sketches
    user_id/event_id (r14 adversarial review): a NULL event_type would
    form a NULL shard group that sorts NULLS FIRST in Spark but NULLS
    LAST in DuckDB (the documents.lang class), and a NULL key would be
    SKIPPED by hll_build (isNotNull, the count-distinct convention)
    while the oracle's md5('hll:' || NULL) propagates into a
    NULL-bucket register row that shifts v_empty — silent divergence.
    If a regenerated fixture introduces NULLs, add IS NOT NULL filters
    to BOTH sides of every events-keyed sketch query instead of
    widening this contract."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "event_id"],
    )
    for col in ("event_type", "user_id", "event_id"):
        n_null = tbl[col].null_count
        assert not n_null, f"{n_null} NULL events.{col} at {sf_dir}"
