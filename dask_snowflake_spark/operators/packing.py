"""Sequence packing for LLM training-data preparation.

GPT-style pipelines concatenate documents in a deterministic order and
chunk the token stream into fixed-length training sequences (documents
may straddle chunk boundaries). That layout is pure prefix-sum
arithmetic, so it distributes as a window computation — no stateful
loop, no driver pass:

    start_i = running token sum before doc i   (one window per shard)
    doc i occupies chunks floor(start_i/C) .. floor((end_i - 1)/C)

Scale shape: the window partitions by a shard column (language here;
date/source shards in production), so each shard's prefix sum is an
independent in-partition sort — never a single global ordering. Chunk
ids are shard-local; (shard, chunk) is the training-sequence key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sequence_pack(
    docs: DataFrame,
    token_col: str,
    *,
    shard_col: str,
    order_col: str,
    chunk_tokens: int = 512,
) -> DataFrame:
    """Assign each document its span of fixed-size training chunks.

    Returns the input keys plus ``start_offset`` (token offset of the
    doc within its shard's stream), ``first_chunk``/``last_chunk``
    (inclusive chunk-id span) and ``n_chunks``. Deterministic given the
    (shard, order) columns; empty docs occupy zero chunks (first >
    last)."""
    w = (
        W.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    end = F.sum(token_col).over(w)
    start = end - F.col(token_col)
    first = F.floor(start / chunk_tokens)
    last = F.floor((end - 1) / chunk_tokens)
    return docs.select(
        shard_col,
        order_col,
        F.col(token_col),
        start.alias("start_offset"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        F.when(F.col(token_col) > 0, last - first + 1).otherwise(F.lit(0)).alias("n_chunks"),
    )


def chunk_summary(packed: DataFrame, *, shard_col: str, order_col: str) -> DataFrame:
    """Per-(shard, chunk) stats: how many documents touch each training
    sequence and the document-id span — the packing QA view. Explodes
    each doc over its chunk span (bounded by n_chunks, typically 1-2)."""
    spans = packed.filter(F.col("n_chunks") > 0).select(
        shard_col,
        order_col,
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    return spans.groupBy(shard_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )


def nfd_plan(
    hist: list[tuple[int, int]], cap: int
) -> tuple[list[dict[str, int]], int]:
    """Exact Next-Fit-Decreasing packing plan over a (length, count)
    histogram — the bounded-state member of the histogram-packing
    family (Krell et al. 2021 frame the production problem this way:
    sequence packing decisions depend only on the LENGTH HISTOGRAM,
    never on individual documents, because same-length documents are
    interchangeable).

    NFD keeps ONE open bin: items arrive in decreasing length order;
    an item that fits the open bin's remainder joins it, otherwise the
    bin is closed forever and a fresh one opens. Same-length items
    therefore process in bulk: ``fill = min(n, rem div L)`` join the
    open bin, the rest open ``ceil((n - fill) / (cap div L))`` new
    bins holding ``cap div L`` each, and the last new bin stays open.
    The whole fold is |distinct lengths| <= cap rounds of integer
    scalar state (open-bin id, remainder) — O(cap) work for ANY corpus
    size, which is what makes the plan computable driver-side at
    100 TB (the kmeans collect pattern: bounded decision state, one
    corpus scan to build the histogram, one to apply).

    Returns (per-class plan rows sorted by length desc, total bins).
    Each row: length, n, fill (items joining the inherited open bin),
    first_bin (its id, 0 when fill = 0), new_start (first freshly
    opened bin id, 0 when none), per_bin (= cap div length). An item
    of length L with within-class rank r (1-based, deterministic
    order) lands in ``first_bin`` when ``r <= fill`` else
    ``new_start + (r - fill - 1) div per_bin`` — pure integer closed
    form, identical on any engine.

    Raises on lengths outside [1, cap] (empty and oversize documents
    are the CALLER's declared branches, not silent drops here) and on
    non-positive counts.
    """
    plan: list[dict[str, int]] = []
    bins = 0
    rem = 0
    for length, n in sorted(hist, key=lambda t: -t[0]):
        if not 1 <= length <= cap:
            raise ValueError(
                f"nfd_plan: length {length} outside [1, {cap}] — empty and "
                "oversize documents must be separated by the caller before "
                "planning (they are counted branches, not packable items)"
            )
        if n <= 0:
            raise ValueError(f"nfd_plan: non-positive count {n} for length {length}")
        fill = min(n, rem // length)
        rem -= fill * length
        new_items = n - fill
        per_bin = cap // length
        first_bin = bins if fill else 0
        if new_items:
            new_start = bins + 1
            bins += (new_items + per_bin - 1) // per_bin
            rem = cap - ((new_items - 1) % per_bin + 1) * length
        else:
            new_start = 0
        plan.append(
            {
                "length": length,
                "n": n,
                "fill": fill,
                "first_bin": first_bin,
                "new_start": new_start,
                "per_bin": per_bin,
            }
        )
    return plan, bins


def pack_documents_atomic(
    docs: DataFrame,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    cap: int = 512,
) -> tuple[DataFrame, int, int, int]:
    """Document-ATOMIC sequence packing: whole documents into
    fixed-``cap`` training bins, never split across sequences — the
    production complement to ``sequence_pack`` (concat-and-chunk),
    which lets documents straddle chunk boundaries and so
    cross-contaminates attention unless masked (Krell et al. 2022,
    'Efficient Sequence Packing without Cross-contamination'; GPT-3 /
    T5 pipelines pack atomically for instruction-tuning corpora).

    Mechanism: ONE corpus scan aggregates the (length, count)
    histogram (<= cap + 2 classes — bounded driver state, the kmeans
    collect pattern), ``nfd_plan`` folds it into a per-class integer
    plan, and the plan broadcast-joins back so each document computes
    its bin id in closed form from its within-class rank (row_number
    partitioned by length, ordered by ``id_col`` — requires unique
    ids, the fixture contract). No shuffle beyond the rank window's
    length-keyed exchange; assignment is scan-speed at any corpus.

    Empty (0-token) and oversize (> cap) documents are EXCLUDED from
    packing and returned as counts — declared branches the caller
    reports (oversize documents need their own truncation/streaming
    policy; silently binning them would overfill bins).

    Returns (assignment DataFrame ``(id_col, length, bin_id)``,
    n_empty, n_oversize, n_bins).
    """
    hist_rows = (
        docs.select(F.col(token_col).cast("long").alias("L"))
        .groupBy("L")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    # NULL token counts are a declared EXCLUDED branch alongside empty:
    # the fixture contract keeps documents.text (hence n_tokens) non-NULL,
    # but the public operator surface must not hit a bare `None <= 0`
    # TypeError on other inputs — count NULLs into n_empty loudly.
    n_empty = sum(r.n for r in hist_rows if r.L is None or r.L <= 0)
    n_oversize = sum(r.n for r in hist_rows if r.L is not None and r.L > cap)
    packable = [(r.L, r.n) for r in hist_rows if r.L is not None and 1 <= r.L <= cap]
    plan, n_bins = nfd_plan(packable, cap)
    if not plan:
        empty = docs.sparkSession.createDataFrame(
            [], f"{id_col} long, length long, bin_id long"
        )
        return empty, n_empty, n_oversize, 0
    plan_df = docs.sparkSession.createDataFrame(
        [
            (p["length"], p["fill"], p["first_bin"], p["new_start"], p["per_bin"])
            for p in plan
        ],
        "length long, fill long, first_bin long, new_start long, per_bin long",
    )
    ranked = (
        docs.filter(
            (F.col(token_col) >= 1) & (F.col(token_col) <= cap)
        )
        .select(
            F.col(id_col),
            F.col(token_col).cast("long").alias("length"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                W.partitionBy("length").orderBy(F.col(id_col))
            ),
        )
    )
    assign = ranked.join(F.broadcast(plan_df), "length").select(
        F.col(id_col),
        "length",
        F.when(F.col("__r") <= F.col("fill"), F.col("first_bin"))
        .otherwise(
            F.col("new_start")
            + F.expr("(__r - fill - 1) div per_bin")
        )
        .cast("long")
        .alias("bin_id"),
    )
    return assign, n_empty, n_oversize, n_bins
