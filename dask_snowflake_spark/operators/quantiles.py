"""Distributed EXACT group quantiles with bounded per-task state.

Spark's exact ``percentile()`` buffers every value of a group inside a
single aggregation state — O(group) memory on one reducer, the classic
scale ceiling for hot groups (a 100 TB corpus with a handful of group
keys puts billions of doubles in one task). ``percentile_approx`` fixes
the state but gives up exactness.

This operator keeps exactness with two distributed passes (the textbook
distributed-selection scheme), bucketing on a **log-scale (exponent)
histogram** so no min/max pre-pass is needed:

1. **Histogram pass** — each value maps to an order-preserving bucket
   ``sign-aware floor(log2(|v|) * S)`` (S sub-buckets per octave; a pure
   projection, no range join); a map-side-combinable
   ``groupBy(group, bucket).count()`` produces a tiny G×B table. A
   window over THAT table (G×B rows, not the data) locates, for every
   needed rank, the bucket containing it and the rank's offset within
   the bucket.
2. **Selection pass** — only rows falling in candidate buckets are
   re-read from the cached projection and collected sorted per (group,
   bucket) cell; ``element_at`` picks the exact offsets.

State per task is O(B) counters in pass 1 and O(candidate cell) values
in pass 2 — neither O(group). Interpolation follows Spark/DuckDB
``quantile_cont``: position ``p*(n-1)`` (0-based), result
``lo + (hi - lo) * frac``.

Degenerate distributions (a candidate cell holding most of a group —
only possible when the group is nearly constant within one 1/S octave)
can be re-split by raising ``buckets``; one level suffices for real
data and keeps the operator a fixed 2-pass plan. NaNs are not handled
(filter them like nulls before calling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import track_cache

# offset separating negative / zero / positive bucket ranges; |log2| of
# any double is <= 1074, so sub-octave indexes stay far inside it
_SIGN_OFF = 1_000_000


def _log_bucket(v: Column, sub_octave: int) -> Column:
    """Order-preserving integer bucket of a double, no range scan:
    sign-aware ``floor(log2(|v|) * S)``. Monotonic in v because log2 is
    monotonic on positives and the negative branch mirrors it below the
    zero bucket."""
    mag = F.floor(F.log2(F.abs(v)) * sub_octave).cast("long")
    clamped = F.least(F.greatest(mag, F.lit(-_SIGN_OFF + 1)), F.lit(_SIGN_OFF - 1))
    return (
        F.when(v > 0, F.lit(_SIGN_OFF) + clamped)
        .when(v < 0, F.lit(-_SIGN_OFF) - clamped)
        .otherwise(F.lit(0))
        .cast("long")
    )


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    *,
    buckets: int = 1024,
) -> DataFrame:
    """Exact ``quantile_cont`` per group for each probability.

    Returns one row per group with an array column ``quantiles``
    ordered like ``probs`` (plus the group columns). NULL values are
    ignored (SQL aggregate semantics); a group with zero non-null
    values produces no row. ``buckets`` tunes histogram resolution
    (``buckets/16`` sub-buckets per octave).
    """
    if not probs:
        raise ValueError("probs must name at least one quantile")
    if any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0, 1], got {probs}")
    sub_octave = max(1, buckets // 16)
    g = [F.col(c) for c in group_cols]

    # Single-scan projection with the bucket precomputed, cached: the
    # histogram pass and the selection pass both read it.
    vals = track_cache(
        df.filter(F.col(value_col).isNotNull())
        .select(*g, F.col(value_col).cast("double").alias("__v"))
        .withColumn("__b", _log_bucket(F.col("__v"), sub_octave))
    )

    # Pass 1: histogram — the ONLY full-data aggregation; everything
    # below the counts table is G×B-row arithmetic.
    counts = vals.groupBy(*group_cols, "__b").agg(F.count(F.lit(1)).alias("__c"))
    wg = W.partitionBy(*group_cols)
    wcum = wg.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    cum = track_cache(
        counts.withColumn("__n", F.sum("__c").over(wg)).withColumn(
            "__before", F.coalesce(F.sum("__c").over(wcum), F.lit(0))
        )
    )

    # 0-based position p*(n-1); ranks are 1-based row_numbers. Each
    # probability needs two ranks (floor/ceil of the position), emitted
    # as tagged rows so a single pivot aggregation recovers both — no
    # lo/hi self-joins.
    targets = (
        cum.select(*group_cols, "__n")
        .distinct()
        .select(
            *group_cols,
            "__n",
            F.posexplode(F.array(*[F.lit(float(p)) for p in probs])).alias("__pi", "__p"),
        )
        .withColumn("__pos", F.col("__p") * (F.col("__n") - 1))
        .select(
            *group_cols,
            "__pi",
            (F.col("__pos") - F.floor("__pos")).alias("__frac"),
            F.explode(
                F.array(
                    F.struct(
                        (F.floor("__pos") + 1).cast("long").alias("__rank"),
                        F.lit(0).alias("__role"),
                    ),
                    F.struct(
                        (F.least(F.ceil("__pos"), F.col("__n") - 1) + 1)
                        .cast("long")
                        .alias("__rank"),
                        F.lit(1).alias("__role"),
                    ),
                )
            ).alias("__t"),
        )
        .select(*group_cols, "__pi", "__frac", "__t.__rank", "__t.__role")
    )

    # cand is tiny (two rows per probability per group) but its subtree
    # contains the whole histogram pass — it feeds BOTH the
    # candidate-bucket filter and the final rank lookup, and each
    # broadcast materialization is a separate Spark job that would
    # re-run the pass uncached.
    cand = track_cache(
        targets.join(cum, group_cols)
        .filter(
            (F.col("__rank") > F.col("__before"))
            & (F.col("__rank") <= F.col("__before") + F.col("__c"))
        )
        .select(
            *group_cols,
            "__pi",
            "__frac",
            "__role",
            "__b",
            (F.col("__rank") - F.col("__before")).alias("__lr"),
        )
    )

    # Pass 2: collect ONLY candidate-bucket rows, sorted per (group,
    # bucket) cell — ≈ cell-sized agg state, never the whole group.
    need = cand.select(*group_cols, "__b").distinct()
    bvals = (
        vals.join(F.broadcast(need), [*group_cols, "__b"])
        .groupBy(*group_cols, "__b")
        .agg(F.sort_array(F.collect_list("__v")).alias("__vs"))
    )
    per_prob = (
        bvals.join(cand, [*group_cols, "__b"])
        .select(
            *group_cols,
            "__pi",
            "__frac",
            "__role",
            F.element_at("__vs", F.col("__lr").cast("int")).alias("__v"),
        )
        .groupBy(*group_cols, "__pi")
        .agg(
            F.min(F.when(F.col("__role") == 0, F.col("__v"))).alias("__vlo"),
            F.min(F.when(F.col("__role") == 1, F.col("__v"))).alias("__vhi"),
            F.first("__frac").alias("__frac"),
        )
        # Spark Percentile.getPercentile's formula: lo + (hi-lo)*frac
        .select(
            *group_cols,
            "__pi",
            (F.col("__vlo") + (F.col("__vhi") - F.col("__vlo")) * F.col("__frac")).alias("__q"),
        )
    )
    return per_prob.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("__pi", "__q")))["__q"].alias("quantiles")
    )
