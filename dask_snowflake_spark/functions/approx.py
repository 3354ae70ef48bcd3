"""Approximate aggregate helpers — the documented scale path for
unbounded-state exact aggregates.

Exact ``percentile()`` buffers every value of a group in one reducer's
aggregation state: correct, and what the oracle demands at test scale,
but at 100 TB a hot group holds billions of doubles on one task. These
wrappers are the bounded-state replacements (fixed sketch size per
group, mergeable partials, map-side combine):

- ``approx_quantiles``: GK-sketch quantiles (``percentile_approx``),
  error <= 1/accuracy of rank — state is O(accuracy * log n), not O(n).
- ``approx_distinct``: HyperLogLog++ (``approx_count_distinct``),
  relative error ~ ``rsd`` with a few KB of state per group.

Both are demonstrated side-by-side with their exact counterparts in the
``x04_approx_sketches`` query (rows-only check — approximate by
design); ``xfl_percentile_collect`` keeps the exact forms for the
oracle. Measured at sf0.1 (local[32]): exact grouped percentiles ~3.9 s
vs ~0.6 s for the same quantiles via ``approx_quantiles`` — see
SCALE.md "Percentiles".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_quantiles(
    col: Column | str, probabilities: Sequence[float], *, accuracy: int = 10_000
) -> Column:
    """Bounded-state quantiles: array of ``percentile_approx`` values at
    ``probabilities``. ``accuracy`` trades state size for rank error
    (1/accuracy); 10k ~= 0.01% rank error with KBs of state."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return F.percentile_approx(col, probs, F.lit(accuracy))


def approx_median(col: Column | str, *, accuracy: int = 10_000) -> Column:
    """Bounded-state median (``percentile_approx`` at 0.5)."""
    return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))


def approx_distinct(col: Column | str, *, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count with ~``rsd`` relative error."""
    return F.approx_count_distinct(col, rsd=rsd)
