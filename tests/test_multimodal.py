"""Multimodal plumbing contracts for the non-oracle kernels: resize
produces fixed-size payloads deterministically; extracted features feed
the similarity operators directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_snowflake_spark.operators import multimodal as mm
from dask_snowflake_spark.operators import similarity as sim
from dask_snowflake_spark.queries import _t


def test_resize_fixed_size_and_deterministic(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"].limit(50)
    assets = mm.attach_binary_assets(docs)
    a = {r.doc_id: bytes(r.asset) for r in mm.resize(assets, 16, 16).collect()}
    b = {r.doc_id: bytes(r.asset) for r in mm.resize(assets.repartition(7), 16, 16).collect()}
    assert a == b
    assert all(len(v) == 256 for v in a.values())


def test_features_feed_similarity_topk(spark, sf_oracle):
    docs = _t(spark, sf_oracle)["documents"].limit(100)
    feats = mm.extract_features(mm.attach_binary_assets(docs)).withColumnRenamed(
        "features", "embedding"
    ).withColumnRenamed("doc_id", "vec_id")
    top = sim.topk_bruteforce(feats, feats.filter(F.col("vec_id") < 2), k=5)
    rows = top.collect()
    assert {r.query_id for r in rows} <= {0, 1}
    assert all(r.rank <= 5 for r in rows)


def test_real_kernel_unavailable_raises_loudly(spark, sf_oracle):
    """Without Pillow the real kernel must fail at call time with a
    descriptive error — never silently fall back to the stub."""
    import pytest

    if mm.DECODE_AVAILABLE:
        pytest.skip("Pillow installed; covered by test_real_kernel_decodes_png")
    docs = _t(spark, sf_oracle)["documents"].limit(1)
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_metadata(mm.attach_binary_assets(docs), kernel="real")


def test_real_kernel_decodes_png(spark):
    """With Pillow present, kernel='real' reads true image dimensions
    through the same Arrow-batched plumbing as the stub."""
    import pytest

    if not mm.DECODE_AVAILABLE:
        pytest.skip("Pillow not installed in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, asset binary")
    row = mm.decode_metadata(df, kernel="real").collect()[0]
    assert (row.width, row.height, row.n_frames, row.codec) == (12, 7, 1, "png")


def test_kernel_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, asset binary")
    with pytest.raises(ValueError, match="kernel"):
        mm.decode_metadata(df, kernel="ffmpeg")


def test_ahash60_samples_span_whole_payload(spark):
    """Ceiling stride: for 60 < n < 120 the 60 samples must reach the
    payload TAIL (a floor stride of 1 sampled only the first 60 bytes,
    so a tail-only difference was invisible to the fingerprint)."""
    base = bytes([0x10]) * 61
    tail_changed = base[:-1] + bytes([0xFF])
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(tail_changed))],
        "doc_id long, asset binary",
    )
    hs = {r.doc_id: r.ahash for r in mm.ahash60(df).collect()}
    assert hs[1] == 0  # constant payload: no sample exceeds the mean
    assert hs[2] != hs[1], "tail byte must influence the fingerprint"


def test_decode_meta_null_assets_yield_null_metadata(spark):
    """NULL asset bytes (external-URI rows) must produce NULL metadata
    columns, not a len(None) TypeError killing the task."""
    from dask_snowflake_spark.operators.multimodal import decode_metadata

    df = spark.createDataFrame([(1, b"abc"), (2, None)], "doc_id long, asset binary")
    rows = {r.doc_id: r for r in decode_metadata(df).collect()}
    assert rows[1].n_bytes == 3 and rows[1].codec == "synthetic"
    assert rows[2].n_bytes is None and rows[2].width is None and rows[2].codec is None


def test_frame_sample_null_assets_and_bad_every_n(spark):
    from dask_snowflake_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([(1, b"x" * 40), (2, None)], "doc_id long, asset binary")
    rows = frame_sample(df, every_n=2).collect()
    assert {r.doc_id for r in rows} == {1}
    import pytest

    with pytest.raises(ValueError, match="every_n"):
        frame_sample(df, every_n=0)


def test_ahash_near_dup_excludes_empty_assets(spark):
    """NULL/empty assets share one constant fingerprint — they must not
    surface as an all-pairs 'duplicate' clique."""
    from dask_snowflake_spark.operators.multimodal import ahash_near_dup

    df = spark.createDataFrame(
        [(1, b""), (2, b""), (3, None), (4, b"payload-a"), (5, b"payload-a")],
        "doc_id long, asset binary",
    )
    pairs = {(r[0], r[1]) for r in ahash_near_dup(df).select("doc_a", "doc_b").collect()}
    assert pairs == {(4, 5)}
