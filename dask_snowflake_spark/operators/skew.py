"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a single hot key (one customer with 10^9 events, one null-ish
default value) stalls the stage on one reducer. Two standard remedies,
expressed as reusable DataFrame transforms:

- ``salted_agg``: two-stage aggregation — group on (key, salt) first so
  the hot key's rows spread over N reducers, then re-aggregate partials
  by key. Works for any decomposable aggregate (sum/count/min/max).
- ``salted_broadcast_join``: replicate the small side N times (one copy
  per salt) so the big side can join on (key, salt) without a shuffle of
  the big side at all.

AQE's skew-join splitting (enabled in session defaults) handles sort-
merge skew automatically; these explicit forms cover aggregations and
the cases where the optimizer can't see the skew (e.g. key computed at
runtime).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_salts: int, deterministic_by: str | None = None) -> DataFrame:
    """Add a ``__salt`` column in [0, num_salts). With
    ``deterministic_by`` set, the salt derives from that column's hash
    (reproducible, oracle-friendly) — it must therefore be a column
    whose values VARY WITHIN each hot key's rows (an id, a timestamp);
    salting by the aggregation/join key itself hashes every hot-key row
    to the SAME salt and silently mitigates nothing (``salted_agg``
    rejects that). Otherwise the salt is random per row (better spread,
    nondeterministic)."""
    if num_salts < 1:
        # sequence(0, num_salts-1) silently DESCENDS for <= 0 and
        # pmod(hash, 0) is a runtime divide-by-zero deep in the job
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    if deterministic_by is not None:
        salt = F.pmod(F.hash(F.col(deterministic_by)), F.lit(num_salts))
    else:
        # Seeded: rand(seed) is deterministic per partition, so a task
        # retry regenerates identical salts — an unseeded rand() can
        # double/drop rows mid-aggregation when a task is re-run.
        salt = (F.rand(seed=0x5A17) * num_salts).cast("int")
    return df.withColumn("__salt", salt)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    num_salts: int = 16,
    salt_by: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name -> (partial_agg_expr, final_agg_expr)
    where the partial runs per (keys, salt) and the final re-combines
    partials per keys, e.g.::

        salted_agg(df, ["k"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("x"),         F.sum("total")),
            "mx":    (F.max("x"),         F.max("mx")),
        })

    The hot key's rows hit ``num_salts`` reducers in stage 1; stage 2
    reduces num_salts partial rows per key — never a hot partition.
    ``salt_by`` must vary within a key group, so the grouping keys
    themselves are rejected (hash(key) is constant across a hot key's
    rows — all of them would still land on one stage-1 reducer).
    """
    if salt_by is not None and salt_by in keys:
        raise ValueError(
            f"salt_by={salt_by!r} is one of the grouping keys: its hash is "
            "constant within each key group, so the hot key still lands on "
            "one reducer — salt by a column that varies within the key "
            "(an id, a timestamp), or pass salt_by=None for random salts"
        )
    salted = with_salt(df, num_salts, salt_by)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side by replicating the small
    side once per salt: big rows carry a random salt, small rows are
    exploded across all salts, the equi-join key becomes (on, salt).

    The big side never shuffles by the hot key; the small side grows
    num_salts x (still broadcastable). Use when the small side is modest
    but the big side's key distribution is pathological.

    Only ``inner`` and ``left`` joins are correct under replication: with
    ``right``/``full``, an unmatched small-side row would surface once
    per salt (num_salts duplicates), so those modes are rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_broadcast_join supports how='inner'|'left', got {how!r}: "
            "replicating the small side duplicates its unmatched rows "
            "num_salts times under right/full outer joins"
        )
    big_salted = with_salt(big, num_salts)
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return big_salted.join(F.broadcast(small_rep), [on, "__salt"], how).drop("__salt")
