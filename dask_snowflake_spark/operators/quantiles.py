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
   re-read from the cached projection; a ``row_number`` window sorted
   per (group, bucket) cell assigns local ranks and an equi-join with
   the target ranks picks the exact values.

State per task is O(B) counters in pass 1 and a disk-spillable window
sort over one candidate cell in pass 2 — neither holds O(group) values
in a single aggregation buffer. Interpolation follows Spark/DuckDB
``quantile_cont``: position ``p*(n-1)`` (0-based), result
``lo + (hi - lo) * frac``.

Degenerate cells: pass 1 also records per-cell min/max, so a cell whose
values are all identical (the one case finer bucketing cannot split —
e.g. a group dominated by a single repeated value; all zeros land in
bucket 0 regardless of resolution) short-circuits to that value with no
selection read at all. Non-constant heavy cells go through the window
sort, which spills to disk instead of materializing the cell as one
in-memory array. NaNs are not handled (filter them like nulls before
calling).
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
    counts = vals.groupBy(*group_cols, "__b").agg(
        F.count(F.lit(1)).alias("__c"),
        F.min("__v").alias("__bmin"),
        F.max("__v").alias("__bmax"),
    )
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
            "__bmin",
            "__bmax",
        )
    )

    # Constant cells (min == max): every value in the cell is the same
    # number — the one shape finer bucketing can't split — so the answer
    # is the cell min itself, with no second read of the data.
    const_picks = cand.filter(F.col("__bmin") == F.col("__bmax")).select(
        *group_cols, "__pi", "__frac", "__role", F.col("__bmin").alias("__v")
    )
    var_cand = cand.filter(F.col("__bmin") != F.col("__bmax")).select(
        *group_cols, "__pi", "__frac", "__role", "__b", F.col("__lr").cast("int").alias("__lr")
    )

    # Pass 2: re-read ONLY non-constant candidate cells; a row_number
    # window sorted within the cell assigns local ranks (external-sort
    # spillable — the cell never sits in one agg buffer as an array)
    # and the target ranks equi-join against it.
    need = var_cand.select(*group_cols, "__b").distinct()
    ranked = vals.join(F.broadcast(need), [*group_cols, "__b"]).withColumn(
        "__lr", F.row_number().over(W.partitionBy(*group_cols, "__b").orderBy("__v"))
    )
    var_picks = ranked.join(var_cand, [*group_cols, "__b", "__lr"]).select(
        *group_cols, "__pi", "__frac", "__role", "__v"
    )
    per_prob = (
        var_picks.unionByName(const_picks)
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
