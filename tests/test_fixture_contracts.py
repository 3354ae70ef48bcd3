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
