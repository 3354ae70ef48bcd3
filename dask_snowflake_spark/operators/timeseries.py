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


def time_bucket(ts: Column, bucket_seconds: int) -> Column:
    """Floor a timestamp onto a regular grid (epoch-aligned).

    Semantics, engine-pair pinned (tests/test_engine_pair_idioms.py):
    truncate to whole SECONDS first (``unix_timestamp`` truncates the
    sub-second part toward zero — visible only pre-epoch, where
    23:59:59.4 lands in bucket 0, not -1), then FLOOR-divide the
    seconds (floor of a double division — exact for any timestamp
    within ±2^53 µs of the epoch). A DuckDB oracle must replicate BOTH
    steps: ``floor((epoch_us(ts) // 1000000) / <bucket>.0)`` — a bare
    ``epoch_us // (bucket * 1e6)`` TRUNCATES the division and buckets
    pre-epoch mid-bucket timestamps one slot higher than Spark.
    ``unix_timestamp`` (not a LONG cast) also keeps TIMESTAMP_NTZ
    inputs working — ANSI forbids casting NTZ to numeric."""
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
    ``fill_zero``/``fill_forward`` names must exist in ``agg_cols`` and
    not overlap — a typo would otherwise silently leave every gap row
    NULL in the column the caller thought was being filled.
    """
    fz, ff = set(fill_zero), set(fill_forward)
    unknown = (fz | ff) - set(agg_cols)
    if unknown:
        raise ValueError(
            f"fill columns not in agg_cols: {sorted(unknown)} "
            f"(agg_cols: {sorted(agg_cols)})"
        )
    if fz & ff:
        raise ValueError(f"columns in both fill_zero and fill_forward: {sorted(fz & ff)}")
    bucket = time_bucket(F.col(ts_col), bucket_seconds)
    # the per-(key, bucket) aggregate feeds BOTH the spine (min/max
    # bounds) and the fill join, but both consumers sit in ONE action —
    # ReuseExchange dedupes the shared aggregation exchange, and a
    # persist() here was MEASURED as a pure materialization barrier
    # (x20 at sf0.1: cached 1.20 s / 8 jobs vs uncached 1.15 s / 6 —
    # the CLAUDE.md cache counter-lesson's fifth datapoint)
    actual = events.groupBy(F.col(key_col), bucket.alias("bucket")).agg(
        *[expr.alias(name) for name, expr in agg_cols.items()]
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
