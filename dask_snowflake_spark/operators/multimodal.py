"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no codec libraries, so the decode kernels are STUBS
(deterministic fakes clearly marked below); everything around them —
schema conventions, ``mapInPandas`` batch shape, partition sizing,
metadata extraction — is real and tested. Swapping ``_fake_decode`` for
PIL/ffmpeg is a one-function change on a real deployment.

Schema convention for a multimodal asset column group:
    <name>          binary        raw bytes (or NULL if external)
    <name>_uri      string        storage URI when bytes not inlined
    <name>_mime     string        media type
    <name>_meta     struct        decoded metadata (width/height/...)

Scale notes: binary payloads ride Spark's normal columnar path (parquet
BYTE_ARRAY); ``mapInPandas`` streams Arrow batches so one task never
holds more than spark.sql.execution.arrow.maxRecordsPerBatch assets;
decode is embarrassingly parallel — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_AVAILABLE = False  # flips when real codec libs are installed

META_SCHEMA = (
    "width int, height int, n_frames int, duration_ms double, codec string"
)


def attach_binary_assets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a binary asset column group from a text column —
    stands in for reading real image bytes; exercises the exact schema/
    partitioning path real assets would take."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("asset"),
        F.concat(F.lit("synthetic://asset/"), F.col(id_col)).alias("asset_uri"),
        F.lit("application/octet-stream").alias("asset_mime"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decode kernel. Deterministic metadata derived from the
    payload alone, so tests are stable. Replace with PIL / libav when
    available; raise to make accidental production use loud."""
    if DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real codec path not wired yet")
    n = len(payload)
    return {
        "width": 16 + n % 64,
        "height": 16 + (n // 64) % 64,
        "n_frames": 1 + n % 8,
        "duration_ms": float(n) / 10.0,
        "codec": "synthetic",
    }


def decode_metadata(df: DataFrame, asset_col: str = "asset", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""
    out_schema = f"{id_col} long, n_bytes long, width int, height int, n_frames int, duration_ms double, codec string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_fake_decode(b) for b in pdf[asset_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(b) for b in pdf[asset_col]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "codec": [m["codec"] for m in metas],
                }
            )

    return df.select(id_col, asset_col).mapInPandas(batches, out_schema)


def frame_sample(
    df: DataFrame, asset_col: str = "asset", id_col: str = "doc_id", every_n: int = 2
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame (here:
    fake frames from the stub decoder). Shows the 1->N mapInPandas
    shape a real video pipeline uses."""
    out_schema = f"{id_col} long, frame_idx int, frame_bytes binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for doc, payload in zip(pdf[id_col], pdf[asset_col]):
                meta = _fake_decode(payload)
                for i in range(0, meta["n_frames"], every_n):
                    ids.append(doc)
                    idxs.append(i)
                    # slice of the payload stands in for a decoded frame
                    blobs.append(payload[i::8][:32])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": blobs})

    return df.select(id_col, asset_col).mapInPandas(batches, out_schema)


def resize(
    df: DataFrame,
    width: int = 32,
    height: int = 32,
    asset_col: str = "asset",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: 1->1 mapInPandas producing a fixed-size payload
    per asset (STUB kernel: strided byte sampling cycled/truncated to
    width*height bytes — deterministic; a real deployment swaps in
    PIL.Image.resize). Output schema mirrors the input asset group with
    updated dimensions so downstream stages are size-bounded."""
    out_schema = f"{id_col} long, asset binary, width int, height int"
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for payload in pdf[asset_col]:
                # NULL assets (e.g. external-URI rows with no inlined
                # bytes) resize to an all-zero canvas instead of
                # failing the whole task
                if payload is None or len(payload) == 0:
                    resized.append(bytes(target))
                    continue
                reps = (target + len(payload) - 1) // len(payload)
                resized.append((bytes(payload) * reps)[:target])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "asset": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, asset_col).mapInPandas(batches, out_schema)


def extract_features(
    df: DataFrame, dim: int = 16, asset_col: str = "asset", id_col: str = "doc_id"
) -> DataFrame:
    """Feature extraction plumbing: binary asset -> dense array<double>
    embedding via an Arrow-batched kernel (STUB: normalized codepoint
    histogram mod ``dim`` — deterministic AND replicable in SQL, so the
    full Python-UDF path is value-checked by the oracle; a real
    deployment swaps in a vision encoder). The output column feeds the
    similarity operators directly (brute-force / IVF top-k)."""
    out_schema = f"{id_col} long, n_chars long, features array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, lens, feats = [], [], []
            for doc, payload in zip(pdf[id_col], pdf[asset_col]):
                # NULL asset -> zero-vector features, not a task failure
                s = "" if payload is None else bytes(payload).decode("utf-8", errors="replace")
                counts = [0] * dim
                for ch in s:
                    counts[ord(ch) % dim] += 1
                n = max(len(s), 1)
                ids.append(doc)
                lens.append(len(s))
                # integer quantization (floor at 1e-6), NOT float round:
                # count/n can land exactly on a 6-decimal halfway point
                # (e.g. 20/512) where Python's banker's rounding and
                # SQL's round-half-away disagree; c*1e6//n is pure
                # integer arithmetic, bit-identical everywhere
                feats.append([(c * 1_000_000 // n) / 1e6 for c in counts])
            yield pd.DataFrame({id_col: ids, "n_chars": lens, "features": feats})

    return df.select(id_col, asset_col).mapInPandas(batches, out_schema)
