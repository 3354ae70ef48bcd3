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
