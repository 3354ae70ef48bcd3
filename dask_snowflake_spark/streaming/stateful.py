"""Custom stateful streaming operator via applyInPandasWithState:
per-user running counters over the events stream.

This is the "custom operator Spark lacks" extension point for streams
(SURVEY.md §2.C): arbitrary per-key state evolved batch by batch — the
streaming analog of the engine's batch mapInPandas operators. State is
one fixed-width tuple per user (bounded by user cardinality, not event
count); this demo operator keeps NoTimeout because its oracle is the
full-history batch aggregate — a production deployment bounds idle-key
state with GroupStateTimeout.ProcessingTimeTimeout + a hasTimedOut
branch emitting/dropping the final state.

Determinism: the running total is an INTEGER number of cents, quantized
PER ROW JVM-side (floor(value * 100)) before the python kernel. Note
this is deterministic and engine-identical — both engines compute the
same IEEE double product and floor it — but NOT exact cents
(floor(0.29 * 100) == 28 because double(0.29)*100 rounds just below
29). What matters is that the oracle applies the IDENTICAL floor
(ext_queries.py:911), so the integer state sum is order-independent and
the final division by 100.0 is the identical correctly-rounded double
on Spark, DuckDB, and python — no pandas accumulation-order ulp, no
python banker's rounding (round() is banker's-on-binary; the engines
round half-up — the xb6 class). Do NOT copy this floor() to a site
whose oracle uses round(value*100) (x37/q03/x08 style) — mixed
floor/round on 3-decimal doubles IS an xb6-class divergence.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, n_batches long"
STATE_SCHEMA = "n long, total_cents long, batches long"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total_cents, batches = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_cents += int(pdf["__cents"].sum())  # exact integer sum
        batches += 1
    state.update((n, total_cents, batches))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            # exact integer / 100.0: the same correctly-rounded double
            # on every engine — never python round() (banker's)
            "total_value": [total_cents / 100.0],
            "n_batches": [batches],
        }
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Streaming per-user counters with arbitrary state. ``events`` must
    be a streaming DataFrame with (user_id, value)."""
    from pyspark.sql import functions as F

    from ..session import _ensure_runtime_confs

    _ensure_runtime_confs(events.sparkSession)
    return (
        events.select(
            "user_id",
            F.expr("cast(floor(value * 100) as bigint)").alias("__cents"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
