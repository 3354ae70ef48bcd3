"""Dataset profiling: per-column statistics in one aggregation job.

Pipeline QA wants a quick shape check (nulls, ranges, cardinalities)
before and after every transform. ``profile`` computes every metric for
every requested column inside a single aggregation job — one reduce, no
per-column jobs like ``df.summary()``'s multi-pass approach — then
unpivots to the long (column, metric, value) form dashboards and diff
tools want.

Scale caveat: with exact distinct counts (the default), N distinct
aggregates compile to an Expand node that replicates every scanned row
~(N+1)× before the aggregation — so profiling many columns exactly is
NOT single-scan-priced, and the per-count state grows with cardinality.
Pass ``approx_distinct=True`` for HLL++ (no Expand, bounded state) when
profiling wide or high-cardinality tables at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str],
    *,
    approx_distinct: bool = False,
    round_digits: int = 4,
) -> DataFrame:
    """Long-format profile: one row per (column, metric) with metrics
    n_rows / n_nonnull / n_null / n_distinct / min / max / mean (all as
    double for a uniform value column)."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        distinct = (
            F.approx_count_distinct(c) if approx_distinct else F.countDistinct(c)
        )
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            F.round(F.min(c).cast("double"), round_digits).alias(f"__mn_{c}"),
            F.round(F.max(c).cast("double"), round_digits).alias(f"__mx_{c}"),
            F.round(F.avg(F.col(c).cast("double")), round_digits).alias(f"__av_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in columns:
        for metric, expr in (
            ("n_rows", "__n_rows"),
            ("n_nonnull", f"__nn_{c}"),
            ("n_null", f"__n_rows - __nn_{c}"),
            ("n_distinct", f"__nd_{c}"),
            ("min", f"__mn_{c}"),
            ("max", f"__mx_{c}"),
            ("mean", f"__av_{c}"),
        ):
            stack_args.append(f"'{c}', '{metric}', cast(({expr}) as double)")
    n = len(stack_args)
    return wide.select(
        F.expr(
            f"stack({n}, " + ", ".join(stack_args) + ") AS (column_name, metric, value)"
        )
    )
