"""Time-series regularization operators: time bucketing, gap filling,
forward fill.

Event streams are irregular; feature pipelines and rollups want dense,
regular series. ``gap_fill`` densifies each key's series to a fixed
bucket grid and forward-fills values — the standard prep step before
windowed feature extraction.

Scale shape: the spine (one row per key per bucket) is generated with
``sequence`` + ``explode`` from each key's own [min, max] bucket range —
per-key work, no global driver-side date range, no cross join. The
left join and the forward-fill window both shuffle on the key, so the
whole pipeline is one partitioning reused across stages. Bucket count
per key is bounded by its own span; a key with sparse history doesn't
pay for the corpus's full time range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import track_cache


def time_bucket(ts: Column, bucket_seconds: int) -> Column:
    """Floor a timestamp onto a regular grid (epoch-aligned)."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / bucket_seconds).cast("long") * bucket_seconds
    )


def gap_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    agg_cols: dict[str, Column],
    *,
    bucket_seconds: int = 21600,
    fill_forward: tuple[str, ...] = (),
    fill_zero: tuple[str, ...] = (),
) -> DataFrame:
    """Aggregate ``events`` per (key, bucket), densify each key's series
    over its own [min, max] bucket range, and fill the generated gaps:
    ``fill_zero`` columns get 0, ``fill_forward`` columns carry the last
    observed value (last(ignorenulls) over an ordered window).
    """
    bucket = time_bucket(F.col(ts_col), bucket_seconds)
    # persist the per-(key, bucket) aggregate: it is referenced by BOTH
    # the spine (min/max bounds) and the fill join, and Spark recomputes
    # shared subtrees — without this the raw events scan runs twice (or
    # more under AQE). The aggregate is keys x buckets, far smaller than
    # the input; callers with long-lived pipelines may unpersist the
    # result's lineage when done.
    actual = track_cache(
        events.groupBy(F.col(key_col), bucket.alias("bucket")).agg(
            *[expr.alias(name) for name, expr in agg_cols.items()]
        )
    )
    step = F.expr(f"INTERVAL {bucket_seconds} SECONDS")
    spine = (
        actual.groupBy(key_col)
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("__mn"), F.col("__mx"), step)).alias("bucket"),
        )
    )
    filled = spine.join(actual, [key_col, "bucket"], "left")
    w = W.partitionBy(key_col).orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cols = [F.col(key_col), F.col("bucket")]
    for name in agg_cols:
        if name in fill_zero:
            cols.append(F.coalesce(F.col(name), F.lit(0)).alias(name))
        elif name in fill_forward:
            cols.append(F.last(name, ignorenulls=True).over(w).alias(name))
        else:
            cols.append(F.col(name))
    return filled.select(*cols)
