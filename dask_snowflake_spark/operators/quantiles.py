"""Distributed EXACT group quantiles with bounded per-task state.

Spark's exact ``percentile()`` buffers every value of a group inside a
single aggregation state — O(group) memory on one reducer, the classic
scale ceiling for hot groups (a 100 TB corpus with a handful of group
keys puts billions of doubles in one task). ``percentile_approx`` fixes
the state but gives up exactness.

This operator keeps exactness with two distributed passes over a cached
single-scan projection (the textbook distributed-selection scheme):

1. **Histogram pass** — each value maps to one of ``buckets`` range
   buckets (per group, from the group's min/max); a map-side-combinable
   ``groupBy(group, bucket).count()`` produces a tiny G×B table. A
   window over THAT table (G×B rows, not the data) locates, for every
   needed rank, the bucket containing it and the rank's offset within
   the bucket.
2. **Selection pass** — only rows falling in candidate buckets (≈ n/B
   of each group per rank) are re-read from the cached projection and
   sorted per (group, bucket); ``row_number`` picks the exact offsets.

State per task is O(B) counters in pass 1 and O(candidate bucket) rows
in pass 2 — both knobs, neither O(group). Interpolation follows
Spark/DuckDB ``quantile_cont``: position ``p*(n-1)`` (0-based), result
``lo + (hi - lo) * frac``.

Degenerate distributions (a candidate bucket holding most of a group —
only possible when the group is nearly constant in that range) can be
re-split by raising ``buckets``; one level suffices for real data and
keeps the operator a fixed 2-pass plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import track_cache


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
    values produces no row.
    """
    if not probs:
        raise ValueError("probs must name at least one quantile")
    if any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0, 1], got {probs}")
    g = [F.col(c) for c in group_cols]

    # Single-scan projection, cached: the histogram pass and the
    # selection pass both read it; uncached the source would be
    # scanned twice.
    vals = track_cache(
        df.filter(F.col(value_col).isNotNull()).select(
            *g, F.col(value_col).cast("double").alias("__v")
        )
    )

    rng = vals.groupBy(*group_cols).agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count(F.lit(1)).alias("__n"),
    )

    # 0-based position p*(n-1); ranks are 1-based row_numbers.
    targets = (
        rng.select(
            *group_cols,
            "__n",
            F.posexplode(F.array(*[F.lit(float(p)) for p in probs])).alias("__pi", "__p"),
        )
        .withColumn("__pos", F.col("__p") * (F.col("__n") - 1))
        .select(
            *group_cols,
            "__pi",
            (F.floor("__pos") + 1).cast("long").alias("__lo"),
            (F.least(F.ceil("__pos"), F.col("__n") - 1) + 1).cast("long").alias("__hi"),
            (F.col("__pos") - F.floor("__pos")).alias("__frac"),
        )
    )
    ranks = (
        targets.select(
            *group_cols, F.explode(F.array("__lo", "__hi")).alias("__rank")
        ).distinct()
    )

    # Pass 1: range-bucket histogram. Constant groups (mn == mx)
    # collapse to bucket 0.
    bucketed = vals.join(F.broadcast(rng.select(*group_cols, "__mn", "__mx")), group_cols).withColumn(
        "__b",
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
            F.least(
                F.lit(buckets - 1),
                F.floor(
                    (F.col("__v") - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * buckets
                ).cast("int"),
            )
        ),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(F.count(F.lit(1)).alias("__c"))
    wcum = W.partitionBy(*group_cols).orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    cum = counts.withColumn("__before", F.coalesce(F.sum("__c").over(wcum), F.lit(0)))
    cand = (
        ranks.join(cum, group_cols)
        .filter(
            (F.col("__rank") > F.col("__before"))
            & (F.col("__rank") <= F.col("__before") + F.col("__c"))
        )
        .select(*group_cols, "__rank", "__b", (F.col("__rank") - F.col("__before")).alias("__lr"))
    )

    # Pass 2: sort ONLY candidate-bucket rows; window partitions are
    # (group, bucket) — ≈ n/buckets rows each, never the whole group.
    need = cand.select(*group_cols, "__b").distinct()
    crows = bucketed.join(F.broadcast(need), [*group_cols, "__b"]).select(
        *group_cols, "__b", "__v"
    )
    wsort = W.partitionBy(*group_cols, "__b").orderBy("__v")
    ranked = crows.withColumn("__rn", F.row_number().over(wsort))
    rankvals = (
        ranked.join(cand, [*group_cols, "__b"])
        .filter(F.col("__rn") == F.col("__lr"))
        .select(*group_cols, "__rank", "__v")
    )

    lo = rankvals.select(*group_cols, F.col("__rank").alias("__lo"), F.col("__v").alias("__vlo"))
    hi = rankvals.select(*group_cols, F.col("__rank").alias("__hi"), F.col("__v").alias("__vhi"))
    per_prob = (
        targets.join(lo, [*group_cols, "__lo"])
        .join(hi, [*group_cols, "__hi"])
        # Spark Percentile.getPercentile's formula: lo + (hi-lo)*frac
        .withColumn("__q", F.col("__vlo") + (F.col("__vhi") - F.col("__vlo")) * F.col("__frac"))
        .select(*group_cols, "__pi", "__q")
    )
    return per_prob.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("__pi", "__q")))["__q"].alias("quantiles")
    )
