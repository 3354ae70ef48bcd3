"""Streaming-layer tests beyond the oracle gate: watermark-bounded
dedup, stateful counters, and the foreachBatch -> warehouse sink
(streaming writes through the connector, the shape a CDC/ingest
pipeline uses)."""

from __future__ import annotations

import duckdb

from dask_snowflake_spark.sources.snowflake import to_snowflake
from dask_snowflake_spark.streaming.windows import (
    _events_stream,
    run_stream_to_table,
    sliding_counts,
    tumbling_counts,
)


def test_tumbling_vs_batch(spark, sf_smoke):
    """Streaming tumbling agg over the bounded source == batch agg."""
    from dask_snowflake_spark.session import load_table
    from pyspark.sql import functions as F

    out = run_stream_to_table(tumbling_counts(_events_stream(spark, sf_smoke)), "t_tumb")
    streamed = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in out.collect()
    }
    batch = {
        (r.win.start, r.event_type): (r.n, r.total_value)
        for r in load_table(spark, sf_smoke, "events")
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert streamed == batch


def test_sliding_window_multiplicity(spark, sf_smoke):
    """12h/6h sliding windows: total window-row count == 2x event count."""
    out = run_stream_to_table(sliding_counts(_events_stream(spark, sf_smoke)), "t_slide")
    from pyspark.sql import functions as F

    total = out.agg(F.sum("n")).collect()[0][0]
    n_events = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert total == 2 * n_events


def test_foreach_batch_warehouse_sink(spark, sf_smoke, tmp_path):
    """Streaming -> foreachBatch -> to_snowflake: each micro-batch bulk-
    loads into the warehouse stub; totals match the source."""
    db = str(tmp_path / "wh.duckdb")
    ck = {"database": db}

    events = _events_stream(spark, sf_smoke).select("event_id", "user_id", "value")

    def sink(batch_df, epoch_id):
        to_snowflake(batch_df, "stream_sink", connection_kwargs=ck, backend="duckdb")

    q = events.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()

    con = duckdb.connect(db)
    n, s = con.execute('SELECT count(*), round(sum(value), 2) FROM "STREAM_SINK"').fetchone()
    con.close()
    src = spark.read.parquet(f"{sf_smoke}/events.parquet")
    from pyspark.sql import functions as F

    n0, s0 = src.agg(F.count(F.lit(1)), F.round(F.sum("value"), 2)).collect()[0]
    assert (n, s) == (n0, s0)
