"""Benchmark decontamination: n-gram overlap against an eval set.

Training corpora must be screened for test-set contamination before
training — the standard detector is word-n-gram overlap between each
training document and the union of benchmark documents (GPT-3 used
13-grams, PaLM 8-grams; the n is a knob). This operator computes, per
training document, how many of its distinct n-grams appear anywhere in
the eval set.

Scale shape: the eval side collapses to DISTINCT n-grams (benchmarks
are tiny — thousands of docs — so the distinct-shingle set broadcasts);
the training side is the existing ``dedup.shingles`` long format (one
shuffle keyed by doc, shared with every other per-doc text operator).
The overlap join is a broadcast hash join: the 100 TB corpus never
shuffles for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def ngram_overlap(
    train: DataFrame,
    evalset: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-training-doc contamination stats vs the eval set's n-grams.

    Returns (doc, n_shingles, n_overlap, overlap_frac) — one row per
    training document that has at least one shingle. ``overlap_frac``
    is integer-quantized to 6 decimals (floor), engine-portable.

    Both counts come from ONE doc-keyed aggregation over the
    broadcast-marked shingle stream (a left join against the eval set
    with a hit marker; ``count(marker)`` counts non-nulls) — the
    two-aggregation + doc-join formulation paid a second full shuffle
    of the corpus shingles for the same numbers.

    Contract note: ``dedup.shingles`` emits one PARTIAL shingle for a
    document shorter than ``n`` words, so a 2-word training doc whose
    prefix appears in the eval set reports ``overlap_frac = 1.0`` from
    that single partial match. That is the shared shingling definition
    (the oracle replicates it identically); callers screening corpora
    with ultra-short documents should length-filter first if they want
    strictly-n-gram evidence.
    """
    tr = shingles(train, text_col, id_col, n)
    ev = shingles(evalset, text_col, id_col, n).select("shingle").distinct()
    return (
        tr.join(F.broadcast(ev.withColumn("__hit", F.lit(1))), "shingle", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),
        )
        .select(
            "doc",
            "n_shingles",
            "n_overlap",
            (F.expr("n_overlap * 1000000 div n_shingles") / 1e6).alias(
                "overlap_frac"
            ),
        )
    )
