"""Connected components over an edge list — the clustering step that
turns near-duplicate PAIRS (MinHash/SimHash/embedding candidates) into
dedup CLUSTERS with one kept representative per component.

No reference counterpart (the reference delegates all compute to the
warehouse, which has no iterative operator); this is the standard
hash-min label propagation used by large-scale dedup pipelines:

- state: one (vertex, label) row per vertex, label = smallest vertex id
  known reachable;
- iteration: every vertex takes the min of its neighbors' labels and
  its own (one equi-join + one min-aggregation — both shuffle on the
  vertex key, no all-pairs anything);
- termination: when no label changed (converges in O(component
  diameter) rounds; near-dup clusters are shallow — text corpora
  measure single-digit diameters).

Scale posture: per-round cost is one shuffle join of the edge list with
the label table plus a map-side-combinable min agg; per-task state is
O(1) per key. The only driver-side work is a per-round scalar
``changed`` count (size-independent). Lineage is truncated each round
with ``localCheckpoint`` so the plan doesn't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    max_iter: int = 30,
) -> DataFrame:
    """Label each vertex of the undirected graph ``edges`` with the
    minimum vertex id of its connected component.

    Returns ``(vertex, component)`` for every vertex that appears in at
    least one edge (isolated vertices aren't represented in an edge
    list). Deterministic: no RNG, no order dependence.

    Convergence is detected without a labels-to-labels join: labels
    only ever decrease, so the per-round ``sum(label)`` (exact, 38-digit
    decimal) is strictly monotone until fixpoint — one scalar
    aggregation per round instead of a join + count.
    """
    spark = edges.sparkSession
    # The loop's joins/aggs run over the (usually small) active label
    # frontier; a cluster-wide shuffle width means mostly-empty tasks
    # per round. Right-size for the rounds, restore after — a
    # production run sizes this to its edge cardinality instead.
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    resized = prev is not None and prev.isdigit() and int(prev) > 8
    if resized:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        und = (
            edges.select(F.col(src).alias("__u"), F.col(dst).alias("__v"))
            .union(edges.select(F.col(dst).alias("__u"), F.col(src).alias("__v")))
            .distinct()
            .localCheckpoint(eager=True)
        )

        # initial label: min over self and direct neighbors
        labels = und.groupBy("__u").agg(
            F.least(F.min("__v"), F.first("__u")).alias("__lbl")
        ).localCheckpoint(eager=True)
        lbl_sum = labels.agg(
            F.sum(F.col("__lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

        for _ in range(max_iter):
            # neighbor labels flow one hop: vertex u sees label of each
            # neighbor v; keep the min of (own label, neighbor labels)
            prop = und.join(
                labels.select(F.col("__u").alias("__v"), "__lbl"), "__v"
            ).select("__u", "__lbl")
            labels = (
                prop.unionByName(labels.select("__u", "__lbl"))
                .groupBy("__u")
                .agg(F.min("__lbl").alias("__lbl"))
            ).localCheckpoint(eager=True)
            new_sum = labels.agg(
                F.sum(F.col("__lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            if new_sum == lbl_sum:
                break
            lbl_sum = new_sum
    finally:
        if resized:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return labels.select(F.col("__u").alias("vertex"), F.col("__lbl").alias("component"))
