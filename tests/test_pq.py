"""Product quantization: codebook shape, deterministic encoding, and
ADC exactness on a corpus where quantization is lossless."""

from __future__ import annotations

from dask_snowflake_spark.operators.similarity import pq_adc_topk, pq_encode, pq_fit


def _toy(spark):
    # 4-dim vectors built from two 2-dim "letters" per subspace —
    # every vector sits exactly ON a codebook centroid, so PQ is
    # lossless and ADC distances equal exact distances
    letters = {0: [0.0, 0.0], 1: [10.0, 10.0]}
    rows = []
    vid = 0
    for a in (0, 1):
        for b in (0, 1):
            for _ in range(3):  # enough copies that k-means finds the letters
                rows.append((vid, [float(x) for x in letters[a] + letters[b]]))
                vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_fit_shape_and_determinism(spark) -> None:
    df = _toy(spark)
    b1 = pq_fit(df, m=2, k=2, iters=2)
    b2 = pq_fit(df, m=2, k=2, iters=2)
    assert len(b1) == 2 and all(len(book) == 2 for book in b1)
    assert all(len(c) == 2 for book in b1 for c in book)
    assert b1 == b2  # hash-seeded, no RNG


def test_encode_groups_identical_vectors(spark) -> None:
    df = _toy(spark)
    books = pq_fit(df, m=2, k=2, iters=2)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    # copies of the same vector must share a code word
    assert codes[0] == codes[1] == codes[2]
    assert codes[9] == codes[10] == codes[11]
    # different letter combinations get different codes
    assert len({tuple(c) for c in codes.values()}) == 4


def test_adc_is_exact_on_centroid_corpus(spark) -> None:
    df = _toy(spark)
    books = pq_fit(df, m=2, k=2, iters=2)
    codes = pq_encode(df, books).select("vec_id", "codes")
    q = spark.createDataFrame(
        [(100, [0.0, 0.0, 10.0, 10.0])], "q_id long, q_vec array<double>"
    )
    got = pq_adc_topk(q, codes, books, k=12).collect()
    by_id = {r.vec_id: r.adc_d2 for r in got}
    # the three exact copies of the query's letter pair are at distance 0
    assert [by_id[v] for v in (3, 4, 5)] == [0.0, 0.0, 0.0]
    # one letter flipped = squared distance 200 exactly
    assert by_id[0] == 200.0 and by_id[9] == 200.0
    # both flipped = 400
    assert by_id[6] == 400.0


def test_validation(spark) -> None:
    import pytest

    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pq_fit(df, m=2, k=2)  # dim 3 does not split into 2 subspaces


def test_small_training_set_clamps_k(spark) -> None:
    """Fewer training rows than k must clamp the codebook (short but
    valid), not crash the Lloyd update with an IndexError."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 9.0, 9.0]), (1, [9.0, 9.0, 0.0, 0.0]), (2, [0.0, 0.0, 9.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    books = pq_fit(df, m=2, k=16, iters=2)
    assert len(books) == 2 and all(1 <= len(b) <= 3 for b in books)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert codes[0] == codes[2]


def test_empty_training_set_raises(spark) -> None:
    import pytest

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-empty"):
        pq_fit(df, m=2, k=4)


def test_ivfpq_det_matches_python_replica(spark, sf_oracle):
    """x90's deterministic integer IVF-PQ == a from-scratch python
    replica of the WHOLE pipeline (quantize, integer centroids,
    geometric assignment, hash-ring seeds, one integer-mean Lloyd
    round, encode, probe, ADC, shortlist re-rank, recall census) —
    independent of both the Spark kernels and the oracle SQL. Python
    divisions go through an explicit TRUNCATING helper because python
    // floors where Spark div / DuckDB // truncate (the r8 pin)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from dask_snowflake_spark.queries import registry

    t = pq.read_table(f"{sf_oracle}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    labels = t["label"].to_pylist()
    V = {
        i: np.floor(np.array(e, dtype=np.float64) * 1000).astype(np.int64)
        for i, e in zip(ids, t["embedding"].to_pylist())
    }
    NQ, MS, SD, KP, NP, KT, SH = 5, 4, 16, 16, 2, 10, 20
    corp = sorted(i for i in ids if i >= NQ)
    qids = sorted(i for i in ids if i < NQ)
    lab = dict(zip(ids, labels))

    def tdiv(a, b):  # truncate toward zero, the engines' shared div
        q = abs(a) // b
        return q if a >= 0 else -q

    cent = {}
    for lv in sorted({lab[i] for i in corp}):
        mem = [V[i] for i in corp if lab[i] == lv]
        sm = np.sum(mem, axis=0, dtype=np.int64)
        cent[lv] = np.array([tdiv(int(x), len(mem)) for x in sm], dtype=np.int64)
    cells = sorted(cent)

    def d2(a, b):
        return int((((a - b).astype(np.int64)) ** 2).sum())

    def assign(v, k=1):
        return [c for _, c in sorted((d2(v, cent[c]), c) for c in cells)[:k]]

    acell = {i: assign(V[i])[0] for i in corp}
    resid = {i: V[i] - cent[acell[i]] for i in corp}
    seeds = sorted(
        corp, key=lambda i: (hashlib.md5(f"pq:{i}".encode()).hexdigest(), i)
    )[:KP]
    init = {
        (s, j): resid[seeds[j - 1]][s * SD : (s + 1) * SD].copy()
        for s in range(MS)
        for j in range(1, KP + 1)
    }
    members: dict = {}
    for i in corp:
        for s in range(MS):
            rs = resid[i][s * SD : (s + 1) * SD]
            j0 = min(range(1, KP + 1), key=lambda j: (d2(rs, init[(s, j)]), j))
            members.setdefault((s, j0), []).append(rs)
    cw = {}
    for key, iv in init.items():
        mem = members.get(key)
        if not mem:
            cw[key] = iv
        else:
            sm = np.sum(mem, axis=0, dtype=np.int64)
            cw[key] = np.array([tdiv(int(x), len(mem)) for x in sm], dtype=np.int64)
    code = {
        (i, s): min(
            range(1, KP + 1),
            key=lambda j: (d2(resid[i][s * SD : (s + 1) * SD], cw[(s, j)]), j),
        )
        for i in corp
        for s in range(MS)
    }
    want = []
    for q in qids:
        pcells = assign(V[q], NP)
        cand = [i for i in corp if acell[i] in pcells]
        adc = {
            i: sum(
                d2(
                    (V[q] - cent[acell[i]])[s * SD : (s + 1) * SD],
                    cw[(s, code[(i, s)])],
                )
                for s in range(MS)
            )
            for i in cand
        }
        short = sorted(cand, key=lambda i: (adc[i], i))[:SH]
        approx = set(sorted(short, key=lambda i: (d2(V[q], V[i]), i))[:KT])
        truth = set(sorted(corp, key=lambda i: (d2(V[q], V[i]), i))[:KT])
        want.append((q, len(approx & truth), len(cand), len(corp)))
    got = [
        (r.q_id, r.hits_at_10, r.n_scanned, r.n_corpus)
        for r in registry()["ivfpq_recall_det"].spark_fn(spark, sf_oracle).collect()
    ]
    assert got == want
    # liveness: the index finds real neighbors but is not the exact scan
    assert sum(h for _, h, _, _ in got) > 0
    assert all(ns < nc for _, _, ns, nc in got)
