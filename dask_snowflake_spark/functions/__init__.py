"""Engine function library: reusable column expressions shared by the
operator modules. All JVM-side (codegen-friendly) and engine-portable —
each has an exact DuckDB equivalent used by the correctness oracles.

- hashing: ``portable_hash`` (md5-derived 60-bit int64, identical
  across engines), MinHash affine parameters
- vectors: ``dot`` / ``norm`` / ``cosine`` over array<float> columns
- text: token counting, character classes, quality features
"""

from ..operators.dedup import MINHASH_PRIME, minhash_params, portable_hash
from .approx import approx_distinct, approx_median, approx_quantiles
from ..operators.similarity import cosine, dot, norm
from ..operators.text import (
    bpe_ish_token_count,
    char_classes,
    token_count,
)

__all__ = [
    "MINHASH_PRIME",
    "approx_distinct",
    "approx_median",
    "approx_quantiles",
    "minhash_params",
    "portable_hash",
    "cosine",
    "dot",
    "norm",
    "bpe_ish_token_count",
    "char_classes",
    "token_count",
]
