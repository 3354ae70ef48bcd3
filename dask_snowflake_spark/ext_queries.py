"""Extension-operator queries (SURVEY.md §2.C): dedup, similarity
search, text analysis, as-of join, streaming windows, multimodal
plumbing, connector roundtrip — each oracle-checked where SQL can
express the semantics.

Portability notes (verified empirically):
- md5-derived 60-bit hashes are bit-identical Spark vs DuckDB, so the
  MinHash/SimHash/fingerprint oracles replicate signatures exactly;
- sequential double accumulation over arrays (Spark ``aggregate`` vs
  DuckDB ``list_sum(list_transform(...))``) is bit-identical, so cosine
  oracles compare after round(6);
- struct-array sorts tie-break identically (field order), so argmax
  logic matches.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import asof as asof_ops
from .operators import dedup as dedup_ops
from .operators import multimodal as mm_ops
from .operators import similarity as sim_ops
from .operators import text as text_ops
from .queries import _t, query
from .streaming import windows as stream_ops


def _scratch_db(prefix: str) -> str:
    """Unique duckdb scratch-database path under the repo's .tmp dir
    (shared by every warehouse-stub query; unique names keep parallel
    runs from colliding, and each query removes its file when done)."""
    tmp_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    return os.path.join(tmp_dir, f"{prefix}-{uuid.uuid4().hex}.duckdb")


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "xcx_dedup_exact",
    """
    SELECT min(doc_id) AS keep_id, count(*) AS n_copies, any_value(n_chars) AS n_chars
    FROM documents
    GROUP BY text
    ORDER BY keep_id
    """,
    "exact dedup: hash-groupBy on full text, deterministic min-id representative",
    ("dedup",),
)
def xcx_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["documents"]
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.first("n_chars").alias("n_chars"),
        )
        .select("keep_id", "n_copies", "n_chars")
        .orderBy("keep_id")
    )


# shingles carried as 60-bit md5 hashes (identical expression to the
# engine's portable_hash), so every downstream join/distinct matches
# the engine's hashed-shingle traffic value-for-value
_SHINGLE_SQL = """
    words AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id AS doc,
               ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT AS shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(greatest(len(w) - 2, 1)),
                          i -> concat_ws(' ', w[i+1], w[i+2], w[i+3]))) AS s
            FROM words)
    )
"""

_JACCARD_CTES = """
    sizes AS (SELECT doc, count(*) n FROM sh GROUP BY doc),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) c
        FROM cand p
        JOIN sh x ON x.doc = p.doc_a
        JOIN sh y ON y.doc = p.doc_b AND y.shingle = x.shingle
        GROUP BY p.doc_a, p.doc_b
    )
"""

_JACCARD_SQL = (
    _JACCARD_CTES
    + """
    SELECT i.doc_a, i.doc_b, round(i.c / (sa.n + sb.n - i.c), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc = i.doc_a
    JOIN sizes sb ON sb.doc = i.doc_b
"""
)


def _minhash_seeds_values() -> str:
    from .operators.dedup import minhash_params

    return ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(minhash_params(16))
    )


def _minhash_bands_sql() -> str:
    """CTEs producing LSH band keys ``bands(doc, band, band_sig)`` from
    ``sh`` (see ``_SHINGLE_SQL``)."""
    return f"""
    hashes AS (
        SELECT doc, shingle & 4294967295 AS h32
        FROM sh
    ),
    sig AS (
        SELECT doc, seed, min((a * h32 + b) % 4294967311) AS minhash
        FROM hashes CROSS JOIN (VALUES {_minhash_seeds_values()}) seeds(seed, a, b)
        GROUP BY doc, seed
    ),
    bands AS (
        SELECT doc, seed // 2 AS band,
               string_agg(minhash::VARCHAR, ',' ORDER BY seed) AS band_sig
        FROM sig GROUP BY doc, seed // 2
    )
"""


def _minhash_cand_sql() -> str:
    """CTEs producing LSH candidate pairs ``cand(doc_a, doc_b)`` from
    ``sh`` (see ``_SHINGLE_SQL``) — shared by the pair query and the
    connected-components clustering oracle."""
    return f"""{_minhash_bands_sql()},
    cand AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc < b.doc
    )
"""


@query(
    "xfy_dedup_minhash_lsh",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_SQL}
    WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ORDER BY doc_a, doc_b
    """,
    "MinHash+LSH near-dup: 3-gram shingles -> 16 md5 minhashes -> 8 bands -> bucket join -> exact-Jaccard verify",
    ("dedup",),
)
def xfy_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return dedup_ops.minhash_near_dup(
        t["documents"], shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    ).orderBy("doc_a", "doc_b")


@query(
    "x46_dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_SQL},
    cand AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    ),
    {_JACCARD_SQL}
    WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ORDER BY doc_a, doc_b
    """,
    "exact all-pairs n-gram Jaccard near-dup (the baseline MinHash is verified against)",
    ("dedup",),
)
def x46_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return dedup_ops.ngram_jaccard_pairs(t["documents"], shingle_n=3, threshold=0.8).orderBy(
        "doc_a", "doc_b"
    )


@query(
    "jaccard_prefix_join",
    f"""
    WITH {_SHINGLE_SQL},
    cand AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
    ),
    {_JACCARD_CTES}
    SELECT i.doc_a, i.doc_b, round(i.c / (sa.n + sb.n - i.c), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc = i.doc_a
    JOIN sizes sb ON sb.doc = i.doc_b
    WHERE i.c * 5 >= (sa.n + sb.n - i.c) * 4
    ORDER BY doc_a, doc_b
    """,
    "EXACT Jaccard similarity join at scale via prefix filtering "
    "(PPJoin candidate generation): each document exposes only its "
    "n - ceil(0.8n) + 1 RAREST shingles (global rarest-first order), "
    "candidates come from an equi-join on those prefixes plus a "
    "length filter, survivors get an exact intersection-count verify "
    "with the 0.8 threshold as an integer cross-multiplication. Same "
    "answer as the quarantined all-pairs baseline (the oracle computes "
    "it exhaustively) but cost is O(rare-token collisions), never "
    "O(n^2) — this is the scale-correct path for EXACT near-dup, "
    "complementing the approximate MinHash+LSH path",
    ("dedup",),
)
def jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return dedup_ops.jaccard_prefix_pairs(
        t["documents"], shingle_n=3, threshold=(4, 5)
    ).orderBy("doc_a", "doc_b")


@query(
    "xa6_dedup_simhash",
    """
    WITH words AS (
        SELECT DISTINCT doc_id AS doc, w
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
        WHERE w <> ''
    ),
    hashes AS (
        SELECT doc, ('0x' || substr(md5('0:' || w), 1, 15))::BIGINT AS h FROM words
    ),
    bits AS (SELECT unnest(range(60)) AS bit),
    votes AS (
        SELECT doc, bit, sum(((h >> bit) & 1) * 2 - 1) AS v
        FROM hashes CROSS JOIN bits
        GROUP BY doc, bit
    )
    SELECT doc AS doc_id,
           sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
    FROM votes GROUP BY doc ORDER BY doc_id
    """,
    "SimHash 60-bit fingerprint per document (majority vote of word-hash bits)",
    ("dedup",),
)
def xa6_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return dedup_ops.simhash(t["documents"], bits=60).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COSINE_SQL = """
    normed AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> x::DOUBLE /
                    sqrt(list_sum(list_transform(range(64),
                         i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE)))) AS nv
        FROM embeddings
    )
"""


def _pair_sim_sql(a: str = "a", b: str = "b") -> str:
    return f"round(list_sum(list_transform(range(64), i -> {a}.nv[i+1] * {b}.nv[i+1])), 6)"


@query(
    "x47_ann_topk_bruteforce",
    f"""
    WITH {_COSINE_SQL},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_pair_sim_sql('q', 'c')} AS sim
        FROM normed q JOIN normed c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    "brute-force cosine top-k ANN baseline: broadcast queries x full corpus scan + window top-k",
    ("similarity",),
)
def x47_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    return sim_ops.topk_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query(
    "xg1_ann_topk_ivf",
    f"""
    WITH {_COSINE_SQL},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_pair_sim_sql('q', 'c')} AS sim
        FROM normed q
        JOIN normed c ON c.label = q.label AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 20
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    "IVF-style pruned top-k: candidates restricted to the query's coarse cell (label)",
    ("similarity",),
)
def xg1_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    return sim_ops.ivf_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


@query(
    "x98_ann_embedding_near_dup",
    f"""
    WITH {_COSINE_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_pair_sim_sql()} AS sim
    FROM normed a JOIN normed b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_pair_sim_sql()} >= 0.45
    ORDER BY id_a, id_b
    """,
    "embedding-cosine near-dup pairs, candidates bucketed by coarse cell (IVF-style) — the join key collapses the cross product",
    ("similarity", "dedup"),
)
def x98_ann_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return sim_ops.embedding_near_dup_pairs_bucketed(t["embeddings"], threshold=0.45)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _lang_scores_sql() -> str:
    parts = []
    for lang, profile in sorted(text_ops.LANG_PROFILES.items()):
        arr = "[" + ",".join(f"'{w}'" for w in profile) + "]"
        parts.append(
            f"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
            f" x -> x <> '' AND list_contains({arr}, x))) AS score_{lang}"
        )
    return ", ".join(parts)


@query(
    "doc_stats",
    f"""
    WITH tok AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_ish,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
        FROM documents
    ),
    feat AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_words,
               len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS n_distinct,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> list_contains(['the','a','of','and','in','to','is'], lower(x)))) AS n_stop,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
        FROM documents
    ),
    ratios AS (
        SELECT doc_id, n_words,
               round(n_distinct / greatest(n_words, 1)::DOUBLE, 6) AS distinct_ratio,
               round(n_stop / greatest(n_words, 1)::DOUBLE, 6) AS stopword_ratio,
               round(n_punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
               round(n_digit / greatest(n_chars, 1)::DOUBLE, 6) AS digit_ratio,
               round(n_nonspace / greatest(n_words, 1)::DOUBLE, 6) AS mean_word_len
        FROM feat
    ),
    qual AS (
        SELECT *,
               round(CASE WHEN n_words < 5 THEN 0.0 ELSE
                   least(n_words / 100.0, 1.0) * 0.3
                   + distinct_ratio * 0.3
                   + least(stopword_ratio * 5.0, 1.0) * 0.2
                   + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2
               END, 8) AS quality_score
        FROM ratios
    ),
    scores AS (SELECT doc_id, lang, {_lang_scores_sql()} FROM documents),
    ranked AS (
        SELECT doc_id, lang,
               list_sort([{", ".join(f"{{'neg_s': -score_{lang}, 'l': '{lang}'}}" for lang in sorted(text_ops.LANG_PROFILES))}])[1] AS best
        FROM scores
    ),
    lang AS (
        SELECT doc_id, lang AS labeled_lang,
               CASE WHEN best.neg_s < 0 THEN best.l ELSE 'unknown' END AS detected_lang
        FROM ranked
    )
    SELECT t.doc_id, t.n_tokens, t.n_bpe_ish, t.n_chars, t.n_alpha, t.n_digit, t.n_punct,
           q.n_words, q.distinct_ratio, q.stopword_ratio, q.punct_ratio, q.digit_ratio,
           q.mean_word_len, q.quality_score,
           l.labeled_lang, l.detected_lang
    FROM tok t
    JOIN qual q ON q.doc_id = t.doc_id
    JOIN lang l ON l.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    "per-document text analysis: token counting (whitespace + BPE-ish "
    "regex) and character-class stats as pure column expressions; word-"
    "level stats (quality features + composite score + heuristic "
    "language ID) via the fused explode + two-aggregation word_profile "
    "path — codegen'd InSet membership, no interpreted HOF lambdas, "
    "zero Python anywhere.",
    ("text",),
)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    text = F.col("text")
    cc = text_ops.char_classes(text)
    chars = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text_ops.token_count(text).alias("n_tokens"),
        text_ops.bpe_ish_token_count(text).alias("n_bpe_ish"),
        cc["n_chars"].alias("n_chars"),
        cc["n_alpha"].alias("n_alpha"),
        cc["n_digit"].alias("n_digit"),
        cc["n_punct"].alias("n_punct"),
        cc["n_space"].alias("__n_space"),
    )
    # left join: empty/whitespace-only docs have no word rows
    j = chars.join(text_ops.word_profile(docs), "doc_id", "left")
    n_words = F.coalesce(F.col("n_words"), F.lit(0))
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    nc = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    langs = sorted(text_ops.LANG_PROFILES)
    ratios = j.select(
        "doc_id",
        "n_tokens",
        "n_bpe_ish",
        "n_chars",
        "n_alpha",
        "n_digit",
        "n_punct",
        n_words.cast("int").alias("n_words"),
        F.round(F.coalesce(F.col("n_distinct"), F.lit(0)) / nw, 6).alias("distinct_ratio"),
        F.round(F.coalesce(F.col("n_stop"), F.lit(0)) / nw, 6).alias("stopword_ratio"),
        F.round(F.col("n_punct") / nc, 6).alias("punct_ratio"),
        F.round(F.col("n_digit") / nc, 6).alias("digit_ratio"),
        F.round((F.col("n_chars") - F.col("__n_space")) / nw, 6).alias("mean_word_len"),
        "labeled_lang",
        *[F.coalesce(F.col(f"score_{l}"), F.lit(0)).alias(f"score_{l}") for l in langs],
    )
    score = F.when(F.col("n_words") < 5, 0.0).otherwise(
        F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.3
        + F.col("distinct_ratio") * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.2
    )
    best = F.array_sort(
        F.array(
            *[
                F.struct((-F.col(f"score_{l}")).alias("neg_s"), F.lit(l).alias("l"))
                for l in langs
            ]
        )
    )[0]
    return (
        ratios.select(
            "doc_id",
            "n_tokens",
            "n_bpe_ish",
            "n_chars",
            "n_alpha",
            "n_digit",
            "n_punct",
            "n_words",
            "distinct_ratio",
            "stopword_ratio",
            "punct_ratio",
            "digit_ratio",
            "mean_word_len",
            F.round(score, 8).alias("quality_score"),
            "labeled_lang",
            F.when(best["neg_s"] < 0, best["l"]).otherwise(F.lit("unknown")).alias(
                "detected_lang"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "x97_doc_fingerprint",
    """
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t FROM documents
    )
    SELECT doc_id,
           md5(t) AS content_hash,
           list_min(list_transform(range(1, greatest(length(t) - 7, 1) + 1, 4),
                i -> ('0x' || substr(md5('0:' || substr(t, i::INTEGER, 8)), 1, 15))::BIGINT)) AS winnow_fp
    FROM norm
    ORDER BY doc_id
    """,
    "document fingerprinting: normalized content hash + min-hash of character 8-grams",
    ("text",),
)
def x97_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        text_ops.fingerprint(t["documents"])
        .select("doc_id", "content_hash", "winnow_fp")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@query(
    "xdh_asof_join_events",
    """
    WITH clicks AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
    purchases AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
            FROM events WHERE event_type = 'purchase') WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           round(p.value, 2) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
    "as-of join: each click annotated with the user's most recent purchase at-or-before it (union-window implementation, one shuffle)",
    ("join", "asof"),
)
def xdh_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    joined = asof_ops.asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts", right_cols=["event_id", "value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_asof").alias("purchase_id"),
        F.col("ts_asof").alias("purchase_ts"),
        F.round("value_asof", 2).alias("purchase_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


@query(
    "xf3_flow_windows",
    """
    -- Spark's F.window FLOORS raw micros (pre-epoch 23:59:59.4 ->
    -- window 18:00 of the PREVIOUS bucket); DuckDB's BIGINT //
    -- truncates, so floor via double division (exact: |epoch_us| <<
    -- 2^53 and bucket boundaries are >1 quotient-ulp away from any
    -- integer micros) — engine-pair pinned
    SELECT 'tumbling' AS kind,
           make_timestamp(CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT) * 21600000000) AS window_start,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding',
           make_timestamp(CAST(floor((epoch_us(ts) - k.off * 21600000000) / 43200000000.0) AS BIGINT) * 43200000000
                          + k.off * 21600000000),
           event_type, count(*)
    FROM events CROSS JOIN (VALUES (0::BIGINT), (1::BIGINT)) k(off)
    GROUP BY 2, 3
    ORDER BY kind, window_start, event_type
    """,
    "Structured Streaming tumbling 6h windows AND sliding 12h/6h windows "
    "(each event lands in 2 overlapping windows) + watermark, both driven "
    "to completion over the bounded events source and tag-unioned",
    ("streaming",),
)
def xf3_flow_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_ops._events_stream(spark, sf_dir)
    tumb_t, slide_t = stream_ops.run_streams_to_tables(
        [
            (stream_ops.tumbling_counts(ev), "flow_tumbling_out"),
            (stream_ops.sliding_counts(ev), "flow_sliding_out"),
        ]
    )
    tumb = tumb_t.select(F.lit("tumbling").alias("kind"), "window_start", "event_type", "n")
    slide = slide_t.select(F.lit("sliding").alias("kind"), "window_start", "event_type", "n")
    return tumb.unionByName(slide).orderBy("kind", "window_start", "event_type")


@query(
    "xf4_flow_sessions",
    """
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    "session windows (30-min gap) per user: session_window agg == gaps-and-islands sessionization",
    ("streaming",),
)
def xf4_flow_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "xdu_flow_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
    """,
    "streaming dedup (dropDuplicatesWithinWatermark) — key set matches batch distinct",
    ("streaming", "dedup"),
)
def xdu_flow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_ops.streaming_dedup(stream_ops._events_stream(spark, sf_dir))
    out = stream_ops.run_stream_to_table(
        stream.select("user_id", "event_type"), "stream_dedup_out", output_mode="append"
    )
    return out.dropDuplicates().orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query(
    "mm_decode_meta",
    """
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id, n AS n_bytes,
           (16 + n % 64)::INTEGER AS width,
           (16 + (n // 64) % 64)::INTEGER AS height,
           (1 + n % 8)::INTEGER AS n_frames,
           n / 10.0 AS duration_ms,
           'synthetic' AS codec
    FROM b ORDER BY doc_id
    """,
    "multimodal metadata extraction: binary asset column -> Arrow-batched decode (stub kernel; real Spark plumbing)",
    ("multimodal",),
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    assets = mm_ops.attach_binary_assets(t["documents"])
    return mm_ops.decode_metadata(assets).orderBy("doc_id")


@query(
    "xa7_mm_frame_sample",
    """
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    fr AS (SELECT doc_id, n, unnest(range(0, 1 + n % 8, 2)) AS frame_idx FROM b)
    SELECT doc_id, frame_idx::INTEGER AS frame_idx,
           least(32, (n - frame_idx + 7) // 8)::BIGINT AS frame_len
    FROM fr
    ORDER BY doc_id, frame_idx
    """,
    "video-style frame sampling plumbing: 1->N mapInPandas over binary assets (stub frames)",
    ("multimodal",),
)
def xa7_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    assets = mm_ops.attach_binary_assets(t["documents"])
    frames = mm_ops.frame_sample(assets, every_n=2)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_bytes").cast("long").alias("frame_len")
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# Connector roundtrip
# ---------------------------------------------------------------------------


@query(
    "xd4_connector_roundtrip",
    """
    SELECT doc_id, lang, source FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id
    """,
    "read_snowflake through the duckdb warehouse stub: distributed batch fetch + bin-packed partitions",
    ("connector",),
)
def xd4_connector_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.snowflake import read_snowflake

    db = _scratch_db("roundtrip")
    import duckdb

    con = duckdb.connect(db)
    con.execute(
        "CREATE VIEW docs AS SELECT doc_id, lang, source FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    con.close()
    df = read_snowflake(
        "SELECT doc_id, lang, source FROM docs WHERE doc_id % 3 = 0",
        spark=spark,
        connection_kwargs={"database": db},
        backend="duckdb",
        npartitions=4,
    )
    # planning embedded the result batches into the partitions; the
    # warehouse file is no longer needed
    os.remove(db)
    return df.orderBy("doc_id")


@query(
    "connector_write_roundtrip",
    """
    SELECT o_custkey % 50 AS grp, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1
    ORDER BY grp
    """,
    "to_snowflake -> read_snowflake roundtrip through the duckdb warehouse "
    "stub: DDL bootstrap from df.schema, per-partition bulk write "
    "(PUT+COPY shape), then distributed read-back — the reference's "
    "flagship write path (core.py:70-124; test_core.py:54-65)",
    ("connector", "sink"),
)
def connector_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.snowflake import read_snowflake, to_snowflake

    db = _scratch_db("write-roundtrip")
    t = _t(spark, sf_dir)
    summary = (
        t["orders"]
        .groupBy((F.col("o_custkey") % 50).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .repartition(4)  # exercise the parallel per-partition write path
    )
    to_snowflake(summary, "cwrt", connection_kwargs={"database": db}, backend="duckdb")
    back = read_snowflake(
        # unquoted identifiers: the warehouse stores them upper-cased,
        # matching write_pandas(quote_identifiers=False) semantics
        "SELECT GRP, N, TOTAL FROM CWRT",
        spark=spark,
        connection_kwargs={"database": db},
        backend="duckdb",
    )
    os.remove(db)
    return back.select(
        F.col("GRP").alias("grp"), F.col("N").alias("n"), F.col("TOTAL").alias("total")
    ).orderBy("grp")


@query(
    "x93_partition_control",
    """
    SELECT 'coalesce' AS mode, 2::BIGINT AS n_partitions,
           (SELECT count(*) FROM documents) AS n_rows
    UNION ALL
    SELECT 'repartition', 3::BIGINT, (SELECT count(*) FROM documents)
    ORDER BY mode
    """,
    "explicit repartitioning control (SURVEY §2.B last row; reference "
    "npartitions kwarg core.py:206-207, test_core.py:128): repartition(3) "
    "yields exactly 3 partitions, coalesce(2) merges to exactly 2 — "
    "verified in-result via spark_partition_id()",
    ("repartition",),
)
def x93_partition_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    def part_stats(df: DataFrame, mode: str) -> DataFrame:
        return (
            df.select(F.spark_partition_id().alias("pid"))
            .agg(
                F.countDistinct("pid").alias("n_partitions"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .select(F.lit(mode).alias("mode"), "n_partitions", "n_rows")
        )

    rep = t["documents"].repartition(3)
    return part_stats(rep.coalesce(2), "coalesce").unionByName(
        part_stats(rep, "repartition")
    ).orderBy("mode")


# ---------------------------------------------------------------------------
# Skew mitigation
# ---------------------------------------------------------------------------


@query(
    "xae_agg_skew_salted",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total, round(max(value), 6) AS mx
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "salted two-stage aggregation over a hot-key distribution == plain aggregation (skew never stalls a reducer)",
    ("skew", "aggregation"),
)
def xae_agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_agg

    t = _t(spark, sf_dir)
    # events has only 5 event_type values — every key is hot; the salt
    # spreads each over 16 reducers, stage 2 folds 16 partials per key
    out = salted_agg(
        t["events"],
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total": (F.sum("value"), F.sum("total")),
            "mx": (F.max("value"), F.max("mx")),
        },
        num_salts=16,
        salt_by="event_id",
    )
    return out.select(
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
        F.round("mx", 6).alias("mx"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Custom stateful streaming
# ---------------------------------------------------------------------------


@query(
    "xg2_flow_stateful_counters",
    """
    -- integer-cents total (x66 idiom): floor(value*100) per row is
    -- exact IEEE on both engines (values non-negative), the BIGINT sum
    -- is order-independent, and /100.0 is the identical correctly-
    -- rounded double everywhere — the old round(sum(value), 2) paired
    -- a python banker's round over pandas partial sums against the SQL
    -- half-up round of a differently-ordered sum (fixture-luck green)
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "applyInPandasWithState custom stateful operator: per-user running counters (integer-cents state, engine-exact); final state == batch aggregation",
    ("streaming", "udf"),
)
def xg2_flow_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .streaming.stateful import running_user_counters
    from .streaming.windows import _events_stream, run_stream_to_table

    out = run_stream_to_table(
        running_user_counters(_events_stream(spark, sf_dir)),
        "stream_state_out",
        output_mode="update",
    )
    # the memory sink holds one row per (user, update); the final state
    # per user is the row with the highest event count
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
        .orderBy("user_id")
    )


@query(
    "flow_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           round(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
    "watermarked stream-stream interval join: purchases within 1h after each click",
    ("streaming", "join"),
)
def flow_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_ops._events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            "value",
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id", "user_id", F.round("value", 2).alias("purchase_value"))
    out = stream_ops.run_stream_to_table(joined, "stream_join_out", output_mode="append")
    return out.orderBy("click_id", "purchase_id")


@query(
    "xd3_pipeline_text_prep",
    f"""
    WITH feat AS (
        SELECT doc_id, text, lang,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_words,
               len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS n_distinct
        FROM documents
    ),
    quality AS (
        SELECT doc_id, text, lang, n_words
        FROM feat
        WHERE n_words >= 20 AND n_distinct / greatest(n_words, 1)::DOUBLE >= 0.2
    ),
    hashed AS (
        SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash
        FROM quality
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
            FROM hashed) WHERE rn = 1
    )
    SELECT lang, count(*) AS n_docs, sum(n_words)::BIGINT AS n_tokens
    FROM kept
    GROUP BY lang
    ORDER BY lang
    """,
    "composed training-data prep pipeline: quality filter -> exact dedup (content hash, min-id keeper) -> per-language token budget",
    ("text", "dedup", "pipeline"),
)
def xd3_pipeline_text_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    feat = t["documents"].select(
        "doc_id",
        "text",
        "lang",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    quality = feat.filter(
        (F.col("n_words") >= 20)
        & (F.col("n_distinct") / F.greatest(F.col("n_words"), F.lit(1)).cast("double") >= 0.2)
    )
    hashed = quality.withColumn(
        "content_hash", F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    )
    w = W.partitionBy("content_hash").orderBy("doc_id")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_words").cast("long").alias("n_tokens"))
        .orderBy("lang")
    )


@query(
    "x00_tfidf",
    """
    WITH terms AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    tc AS (SELECT doc_id, term, count(*) AS n_t FROM terms GROUP BY doc_id, term),
    dl AS (SELECT doc_id, sum(n_t) AS n_doc FROM tc GROUP BY doc_id),
    dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tc.doc_id, tc.term,
               round((tc.n_t / dl.n_doc) * (ln((n.n_docs + 1) / (dfq.df + 1)) + 1), 6) AS tfidf_r
        FROM tc
        JOIN dl ON dl.doc_id = tc.doc_id
        JOIN dfq ON dfq.term = tc.term
        CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf_r,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, tfidf_r, rnk FROM ranked WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
    "sparse TF-IDF (smoothed idf) over whitespace unigrams, top-3 terms "
    "per document; rank over the 6dp-rounded score so engine float tails "
    "can't flip ties",
    ("text",),
)
def x00_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    scored = text_ops.tfidf(t["documents"])
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_r").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf_r", "rnk")
        .orderBy("doc_id", "rnk")
    )


@query(
    "x18_simhash_near_dup",
    """
    WITH words AS (
        SELECT DISTINCT doc_id AS doc, w
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
        WHERE w <> ''
    ),
    hashes AS (
        SELECT doc, ('0x' || substr(md5('0:' || w), 1, 15))::BIGINT AS h FROM words
    ),
    bits AS (SELECT unnest(range(60)) AS bit),
    votes AS (
        SELECT doc, bit, sum(((h >> bit) & 1) * 2 - 1) AS v
        FROM hashes CROSS JOIN bits
        GROUP BY doc, bit
    ),
    sims AS (
        SELECT doc AS doc_id,
               sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM votes GROUP BY doc
    ),
    bands AS (
        SELECT doc_id, simhash, b.band, (simhash >> (b.band * 15)) & 32767 AS val
        FROM sims CROSS JOIN (SELECT unnest(range(4)) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa, b.doc_id AS doc_b, b.simhash AS sb
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INTEGER AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 3
    ORDER BY doc_a, doc_b
    """,
    "SimHash near-dup pairs: banded candidate generation (pigeonhole — "
    "hamming <= 3 pairs must agree exactly on one of 4 fifteen-bit bands, "
    "so candidates come from an equi-join, never all-pairs) + "
    "bit_count(xor) verify on candidates only",
    ("dedup",),
)
def x18_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return dedup_ops.simhash_near_dup(t["documents"], max_hamming=3).withColumn(
        "hamming", F.col("hamming").cast("int")
    ).orderBy("doc_a", "doc_b")


@query(
    "x19_dataset_split",
    """
    WITH b AS (
        SELECT doc_id,
               ('0x' || substr(md5('split:' || doc_id), 1, 15))::BIGINT % 1000000 AS bkt
        FROM documents
    ),
    assigned AS (
        SELECT doc_id,
               CASE WHEN bkt < 100000 THEN 'test'
                    WHEN bkt < 900000 THEN 'train'
                    ELSE 'val' END AS split
        FROM b
    )
    SELECT split, count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM assigned GROUP BY split ORDER BY split
    """,
    "deterministic train/val/test split (80/10/10) by content hash of the "
    "key — no RNG, reproducible across engines/retries/partitionings, and "
    "rows never migrate between splits as the corpus grows",
    ("sampling",),
)
def x19_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import split_assign

    t = _t(spark, sf_dir)
    assigned = split_assign(
        t["documents"], "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


@query(
    "x20_gap_fill",
    """
    WITH actual AS (
        -- trunc-to-second then FLOOR-divide, matching Spark's
        -- floor(unix_timestamp/21600) exactly: a bare epoch_us //
        -- 21600000000 TRUNCATES and diverges on pre-epoch mid-bucket
        -- timestamps (engine-pair pinned)
        SELECT user_id,
               make_timestamp(CAST(floor((epoch_us(ts) // 1000000) / 21600.0) AS BIGINT) * 21600000000) AS bucket,
               count(*) AS n,
               round(sum(value), 2) AS total
        FROM events
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id,
               unnest(generate_series(min(bucket), max(bucket), INTERVAL 6 HOUR)) AS bucket
        FROM actual GROUP BY user_id
    )
    SELECT s.user_id, s.bucket,
           coalesce(a.n, 0) AS n,
           last_value(a.total IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_ff
    FROM spine s LEFT JOIN actual a ON a.user_id = s.user_id AND a.bucket = s.bucket
    ORDER BY s.user_id, s.bucket
    """,
    "time-series gap fill: per-user 6h buckets densified over each "
    "user's own [min, max] range (sequence+explode spine, no global "
    "driver-side date range), zero-filled counts, forward-filled totals "
    "via last(ignorenulls) window",
    ("timeseries",),
)
def x20_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.timeseries import gap_fill

    t = _t(spark, sf_dir)
    return gap_fill(
        t["events"],
        "user_id",
        "ts",
        {
            "n": F.count(F.lit(1)),
            "total": F.round(F.sum("value"), 2),
        },
        bucket_seconds=21600,
        fill_zero=("n",),
        fill_forward=("total",),
    ).withColumnRenamed("total", "total_ff").orderBy("user_id", "bucket")


@query(
    "x21_ivf_trained_recall",
    None,  # iterative k-means training: float means are not bit-portable
    "trained-IVF ANN: spherical k-means centroids fit on a deterministic "
    "20% sample (Lloyd's via DataFrame ops, hash-seeded, no RNG), "
    "scan-speed argmax-cosine cell assignment, in-cell top-10 search, "
    "recall measured against the brute-force ground truth in-query — "
    "rows-only check by design (iterative float training)",
    ("similarity",),
)
def x21_ivf_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import deterministic_sample
    from .session import track_cache

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    # ONE persisted normalized projection shared by all four consumers —
    # k-means training sample, index side, probe side, AND the
    # brute-force ground truth (which previously re-normalized the whole
    # corpus through topk_bruteforce). iters=1: centroid movement after
    # the first Lloyd step doesn't change what this query demonstrates
    # (recall of a trained coarse quantizer), and each extra iteration
    # is two full jobs.
    base = track_cache(
        sim_ops.with_normalized(
            emb.select("vec_id", "embedding"), "embedding", "nv", ["vec_id"]
        )
    )
    train = deterministic_sample(base, "vec_id", 0.2, salt="ivf-train")
    cents = sim_ops.kmeans_fit(train, k=8, iters=1, vec_col="nv", normalized=True)
    assigned = sim_ops.assign_cells(base, cents)
    # query side probes its 3 closest cells (the IVF recall knob);
    # the index side stays single-cell
    qbase = base.filter(F.col("vec_id") < 5)
    q = sim_ops.assign_cells(qbase, cents, nprobe=3).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qv"), "cell"
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim_ops.dot(F.col("qv"), F.col("nv")), 6).alias("sim"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    ivf = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
    # ground truth off the SAME persisted base: broadcast the 5 query
    # vectors against the cached normalized corpus — one scan, no
    # second normalization pass
    qn = qbase.select(F.col("vec_id").alias("query_id"), F.col("nv").alias("qv"))
    tscored = (
        base.join(F.broadcast(qn), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim_ops.dot(F.col("qv"), F.col("nv")), 6).alias("sim"),
        )
    )
    truth = (
        tscored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    hits = truth.join(ivf.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
    return (
        truth.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_found")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            "n_true",
            F.coalesce(F.col("n_found"), F.lit(0)).alias("n_found"),
            F.round(F.coalesce(F.col("n_found"), F.lit(0)) / F.col("n_true"), 2).alias(
                "recall_at_10"
            ),
        )
        .orderBy("query_id")
    )


@query(
    "x22_mm_feature_extract",
    """
    SELECT doc_id,
           length(text) AS n_chars,
           list_transform(range(16), j ->
               (len(list_filter(
                   list_transform(range(length(text)), i -> ord(text[i+1]) % 16),
                   x -> x = j)) * 1000000 // greatest(length(text), 1)) / 1000000.0) AS features
    FROM documents
    ORDER BY doc_id
    """,
    "multimodal feature extraction: binary asset -> array<double> "
    "embedding via an Arrow-batched mapInPandas kernel (stub: normalized "
    "codepoint histogram, deliberately SQL-replicable so the whole "
    "Python-UDF path is value-checked); output feeds the ANN operators",
    ("multimodal",),
)
def x22_mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    assets = mm_ops.attach_binary_assets(t["documents"])
    return mm_ops.extract_features(assets, dim=16).orderBy("doc_id")


@query(
    "x23_asof_forward_tolerance",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
            FROM events WHERE event_type = 'purchase') WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN p.event_id END AS next_purchase_id,
           CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN p.ts END AS next_purchase_ts,
           CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN round(p.value, 2) END AS next_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
    """,
    "forward as-of join with tolerance (full merge_asof surface): each "
    "click annotated with the user's NEXT purchase, nulled when it is "
    "more than 1h later — same union-window one-shuffle implementation, "
    "frame reversed",
    ("join", "asof"),
)
def x23_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    joined = asof_ops.asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        direction="forward",
        tolerance_seconds=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_asof").alias("next_purchase_id"),
        F.col("ts_asof").alias("next_purchase_ts"),
        F.round("value_asof", 2).alias("next_purchase_value"),
    ).orderBy("event_id")


@query(
    "x24_stream_warehouse_sink",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "streaming CDC/ingest shape end-to-end: readStream over events -> "
    "foreachBatch -> to_snowflake per-micro-batch bulk load into the "
    "warehouse stub -> read_snowflake back -> aggregate; totals match "
    "the batch aggregation exactly",
    ("streaming", "connector", "sink"),
)
def x24_stream_warehouse_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.snowflake import read_snowflake, to_snowflake

    db = _scratch_db("stream-sink")

    events = stream_ops._events_stream(spark, sf_dir).select("event_type", "value")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # coalesce before the bulk load — SCALE.md's warehouse-ingest
        # pressure valve; a micro-batch doesn't need 32 COPY files
        to_snowflake(
            batch_df.coalesce(4),
            "stream_sink_q",
            connection_kwargs={"database": db},
            backend="duckdb",
        )

    q = events.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    back = read_snowflake(
        "SELECT EVENT_TYPE, VALUE FROM STREAM_SINK_Q",
        spark=spark,
        connection_kwargs={"database": db},
        backend="duckdb",
    )
    os.remove(db)
    return (
        back.groupBy(F.col("EVENT_TYPE").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("VALUE"), 2).alias("total"))
        .orderBy("event_type")
    )


@query(
    "x25_sequence_pack",
    """
    WITH toks AS (
        SELECT lang, doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT lang, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset,
               ((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512)::BIGINT AS first_chunk,
               ((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // 512)::BIGINT AS last_chunk
        FROM toks
    ),
    spans AS (
        SELECT lang, doc_id, unnest(range(first_chunk, last_chunk + 1)) AS chunk_id
        FROM packed WHERE n_tokens > 0
    )
    SELECT lang, chunk_id, count(*) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM spans
    GROUP BY lang, chunk_id
    ORDER BY lang, chunk_id
    """,
    "LLM sequence packing (concat-and-chunk): per-language token streams "
    "chunked into 512-token training sequences via prefix-sum windows "
    "(docs may straddle chunks); output = per-chunk packing QA stats. "
    "Shard-partitioned windows — no global ordering at any scale.",
    ("text", "packing"),
)
def x25_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.packing import chunk_summary, sequence_pack

    t = _t(spark, sf_dir)
    docs = t["documents"].select("lang", "doc_id", text_ops.token_count(F.col("text")).alias("n_tokens"))
    packed = sequence_pack(
        docs, "n_tokens", shard_col="lang", order_col="doc_id", chunk_tokens=512
    )
    return chunk_summary(packed, shard_col="lang", order_col="doc_id").orderBy(
        "lang", "chunk_id"
    )


@query(
    "x26_column_profile",
    """
    WITH base AS (
        -- means are QUANTIZED (exact integer 1e-4-unit sums / count):
        -- a raw avg() is summation-order dependent across engines and
        -- round(...,4) of it flips near halfway boundaries
        SELECT count(*) AS n_rows,
               count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
               round(min(l_quantity)::DOUBLE, 4) AS mn_q, round(max(l_quantity)::DOUBLE, 4) AS mx_q,
               round(CAST(sum(CAST(round(l_quantity::DOUBLE * 10000) AS BIGINT)) AS BIGINT)
                     / (10000.0 * count(l_quantity)), 4) AS av_q,
               count(l_extendedprice) AS nn_p, count(DISTINCT l_extendedprice) AS nd_p,
               round(min(l_extendedprice)::DOUBLE, 4) AS mn_p, round(max(l_extendedprice)::DOUBLE, 4) AS mx_p,
               round(CAST(sum(CAST(round(l_extendedprice::DOUBLE * 10000) AS BIGINT)) AS BIGINT)
                     / (10000.0 * count(l_extendedprice)), 4) AS av_p
        FROM lineitem
    )
    SELECT u.column_name, u.metric, u.value
    FROM base, LATERAL (VALUES
        ('l_quantity', 'n_rows', n_rows::DOUBLE),
        ('l_quantity', 'n_nonnull', nn_q::DOUBLE),
        ('l_quantity', 'n_null', (n_rows - nn_q)::DOUBLE),
        ('l_quantity', 'n_distinct', nd_q::DOUBLE),
        ('l_quantity', 'min', mn_q),
        ('l_quantity', 'max', mx_q),
        ('l_quantity', 'mean', av_q),
        ('l_extendedprice', 'n_rows', n_rows::DOUBLE),
        ('l_extendedprice', 'n_nonnull', nn_p::DOUBLE),
        ('l_extendedprice', 'n_null', (n_rows - nn_p)::DOUBLE),
        ('l_extendedprice', 'n_distinct', nd_p::DOUBLE),
        ('l_extendedprice', 'min', mn_p),
        ('l_extendedprice', 'max', mx_p),
        ('l_extendedprice', 'mean', av_p)
    ) u(column_name, metric, value)
    ORDER BY column_name, metric
    """,
    "dataset profiling QA: per-column n_rows/nonnull/null/distinct/min/"
    "max/mean in one aggregation job (no per-column jobs like "
    "df.summary's multi-pass), unpivoted to long form; exact distincts "
    "cost an Expand (~(N+1)x row replication) — approx_distinct=True is "
    "the Expand-free bounded-state option at corpus scale",
    ("profile",),
)
def x26_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import profile

    t = _t(spark, sf_dir)
    return profile(t["lineitem"], ["l_quantity", "l_extendedprice"]).orderBy(
        "column_name", "metric"
    )


@query(
    "x27_orc_roundtrip",
    """
    SELECT n_nationkey, n_name, count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_nationkey, n_name
    ORDER BY n_nationkey
    """,
    "ORC sink + source roundtrip (the third columnar format after "
    "parquet and the warehouse): write the supplier-nation join to ORC, "
    "read back, aggregate — hash-matched against the direct aggregation",
    ("source", "sink"),
)
def x27_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import _scratch_dir

    t = _t(spark, sf_dir)
    path = _scratch_dir("x27_orc", sf_dir)
    joined = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("n_nationkey", "n_name", "s_suppkey", "s_acctbal")
    joined.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("n_nationkey", "n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"), F.round(F.sum("s_acctbal"), 2).alias("total_bal"))
        .orderBy("n_nationkey")
    )


@query(
    "xe9_decontaminate_evals",
    """
    WITH sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i+1:i+4], ' ') AS shingle
        FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents),
             LATERAL unnest(range(greatest(len(w) - 3, 1))) AS t(i)
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    tr AS (SELECT * FROM sh WHERE doc_id % 50 != 0),
    per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
    hits AS (
        SELECT tr.doc_id, count(*) AS n_overlap
        FROM tr JOIN ev USING (shingle) GROUP BY tr.doc_id
    )
    SELECT p.doc_id                                   AS doc,
           p.n_shingles,
           coalesce(h.n_overlap, 0)                   AS n_overlap,
           coalesce(h.n_overlap, 0) * 1000000 // p.n_shingles / 1e6 AS overlap_frac
    FROM per_doc p LEFT JOIN hits h ON h.doc_id = p.doc_id
    WHERE coalesce(h.n_overlap, 0) > 0
    ORDER BY doc
    """,
    "benchmark decontamination: per-training-doc word-4-gram overlap "
    "against the eval set's distinct shingles (doc_id % 50 = 0 stands in "
    "for the benchmark) — broadcast semi-join of the corpus shingles "
    "against the tiny eval n-gram set, the GPT-3/PaLM-style contamination "
    "detector; only contaminated docs returned",
    ("text", "decontam"),
)
def xe9_decontaminate_evals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.decontam import ngram_overlap

    t = _t(spark, sf_dir)
    docs = t["documents"]
    train = docs.filter(F.col("doc_id") % 50 != 0)
    evalset = docs.filter(F.col("doc_id") % 50 == 0)
    return (
        ngram_overlap(train, evalset, n=4)
        .filter(F.col("n_overlap") > 0)
        .orderBy("doc")
    )


@query(
    "x29_pii_redact",
    """
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 2 THEN text
                    ELSE text || ' contact user' || doc_id ||
                         '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                         ' ip 10.0.' || doc_id % 256 || '.1'
               END AS text
        FROM documents
    ),
    red AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email,
               len(regexp_extract_all(text, '\\b\\d{3}-\\d{4}\\b'))                               AS n_phone,
               len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))   AS n_ipv4,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
                   '\\b\\d{3}-\\d{4}\\b', '[PHONE]', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS redacted
        FROM seeded
    )
    SELECT doc_id, n_email, n_phone, n_ipv4,
           length(redacted) AS redacted_len,
           md5(redacted)    AS redacted_md5
    FROM red
    ORDER BY doc_id
    """,
    "PII detect + redact: engine-portable regex (RE2-and-Java subset) "
    "counts and placeholder-replaces emails/phones/IPv4s in one "
    "codegen'd projection — synthetic PII seeded deterministically from "
    "doc_id on both sides (corpus text has none); md5 of the redacted "
    "text value-checks the full replacement",
    ("text", "pii"),
)
def x29_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pii import redact

    t = _t(spark, sf_dir)
    seeded = t["documents"].select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 2, F.col("text"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" ip 10.0."),
                F.col("doc_id") % 256,
                F.lit(".1"),
            )
        )
        .alias("text"),
    )
    return (
        redact(seeded, "text")
        .select(
            "doc_id",
            "n_email",
            "n_phone",
            "n_ipv4",
            F.length("redacted").alias("redacted_len"),
            F.md5("redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "x30_repetition_filter",
    """
    WITH words AS (
        SELECT doc_id, lower(u.w) AS w
        FROM documents, LATERAL unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
        WHERE u.w != ''
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
    stats AS (
        -- BIGINT casts: DuckDB sums BIGINT into HUGEINT, which pandas
        -- renders as float64 — a driver-hash divergence vs Spark's long
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, count(*) AS n_distinct,
               max(c) AS max_count,
               CAST(sum(length(w) * c) AS BIGINT) AS sum_len
        FROM wc GROUP BY doc_id
    )
    SELECT doc_id                                                    AS doc,
           n_words,
           n_distinct,
           (n_words - n_distinct) * 1000000 // n_words / 1e6         AS dup_word_frac,
           max_count * 1000000 // n_words / 1e6                      AS top_word_frac,
           sum_len * 1000000 // n_words / 1e6                        AS mean_word_len,
           ((n_words - n_distinct) * 1000000 // n_words / 1e6 > 0.68
            OR max_count * 1000000 // n_words / 1e6 > 0.2)           AS low_quality
    FROM stats
    ORDER BY doc
    """,
    "Gopher-style repetition quality filter: per-doc duplicate-word "
    "fraction, top-word fraction, mean word length (integer-quantized "
    "ratios) + low_quality flag — one explode keyed by doc, two "
    "cascaded map-side-combinable aggregations",
    ("text", "quality"),
)
def x30_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import repetition_stats

    t = _t(spark, sf_dir)
    s = repetition_stats(t["documents"])
    return s.select(
        "doc",
        "n_words",
        "n_distinct",
        "dup_word_frac",
        "top_word_frac",
        "mean_word_len",
        ((F.col("dup_word_frac") > 0.68) | (F.col("top_word_frac") > 0.2)).alias(
            "low_quality"
        ),
    ).orderBy("doc")


@query(
    "xd5_dedup_cluster_cc",
    f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT reach.u, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    labels AS (SELECT u, least(u, min(r)) AS cluster_id FROM reach GROUP BY u)
    SELECT cluster_id,
           count(*) AS cluster_size,
           array_to_string(list_sort(list(u)), ',') AS members
    FROM labels
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
    "near-dup CLUSTERS, not just pairs: MinHash+LSH candidate pairs -> "
    "hash-min connected components (one equi-join + min-agg per round, "
    "O(diameter) rounds, lineage checkpoint-truncated) -> one cluster "
    "row with min-id representative; the oracle replays the clustering "
    "as a recursive transitive closure",
    ("dedup", "graph"),
)
def xd5_dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import connected_components

    t = _t(spark, sf_dir)
    pairs = dedup_ops.minhash_near_dup(
        t["documents"], shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    cc = connected_components(pairs, "doc_a", "doc_b")
    return (
        cc.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list("vertex")), lambda x: x.cast("string")),
                ",",
            ).alias("members"),
        )
        .orderBy("cluster_id")
    )


@query(
    "x32_multires_rollup",
    """
    WITH b AS (
        SELECT event_type, value,
               date_trunc('hour', ts) AS h1,
               date_trunc('day', ts) + (extract(hour FROM ts)::BIGINT // 6) * 6 * INTERVAL 1 HOUR AS h6,
               date_trunc('day', ts) AS d1
        FROM events
    )
    SELECT CASE WHEN h1 IS NOT NULL THEN '1h'
                WHEN h6 IS NOT NULL THEN '6h'
                ELSE '1d' END AS resolution,
           coalesce(h1, h6, d1) AS bucket_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM b
    GROUP BY GROUPING SETS ((h1, event_type), (h6, event_type), (d1, event_type))
    ORDER BY resolution, bucket_start, event_type
    """,
    "hypertable-style multi-resolution rollup: 1h/6h/1d downsampled "
    "aggregates of the event stream in ONE Expand-based grouping-sets "
    "pass (no triple scan), tagged by resolution",
    ("timeseries", "aggregation"),
)
def x32_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    b = t["events"].select(
        "event_type",
        "value",
        F.date_trunc("hour", F.col("ts")).alias("h1"),
        F.expr(
            "date_trunc('day', ts) + make_interval(0, 0, 0, 0, CAST(floor(hour(ts) / 6) * 6 AS INT), 0, 0)"
        ).alias("h6"),
        F.date_trunc("day", F.col("ts")).alias("d1"),
    )
    return (
        b.groupingSets(
            [["h1", "event_type"], ["h6", "event_type"], ["d1", "event_type"]],
            "h1",
            "h6",
            "d1",
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.when(F.col("h1").isNotNull(), F.lit("1h"))
            .when(F.col("h6").isNotNull(), F.lit("6h"))
            .otherwise(F.lit("1d"))
            .alias("resolution"),
            F.coalesce("h1", "h6", "d1").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("resolution", "bucket_start", "event_type")
    )


@query(
    "x33_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t_view
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t_click
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT count(v.user_id)                                        AS n_view,
           count(c.user_id)                                        AS n_click,
           count(p.user_id)                                        AS n_purchase,
           count(c.user_id) * 1000000 // count(v.user_id) / 1e6    AS view_to_click,
           count(p.user_id) * 1000000 // count(v.user_id) / 1e6    AS view_to_purchase
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
    "ordered conversion funnel over the event stream: first view -> "
    "first click at-or-after it -> first purchase at-or-after that, "
    "per-stage user counts + integer-quantized conversion rates; "
    "stage aggregations shuffle once on user_id each",
    ("events", "analytics"),
)
def x33_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    funnel = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return funnel.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
        (F.expr("count(t_click) * 1000000 div count(t_view)") / 1e6).alias("view_to_click"),
        (F.expr("count(t_purchase) * 1000000 div count(t_view)") / 1e6).alias("view_to_purchase"),
    )


@query(
    "x34_vocab_topk",
    """
    WITH words AS (
        SELECT doc_id, lower(u.w) AS w
        FROM documents, LATERAL unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
        WHERE u.w != ''
    )
    SELECT w AS word,
           count(*) AS corpus_freq,
           count(DISTINCT doc_id) AS doc_freq
    FROM words
    GROUP BY w
    ORDER BY corpus_freq DESC, word
    LIMIT 20
    """,
    "corpus vocabulary head: global top-20 words by corpus frequency "
    "with document frequency — explode + one combined agg + "
    "TakeOrderedAndProject top-k (per-partition heap, no full sort), "
    "deterministic word tie-break",
    ("text", "aggregation"),
)
def x34_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    words = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .select("doc_id", F.lower("w").alias("word"))
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("corpus_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("corpus_freq").desc(), "word")
        .limit(20)
    )


@query(
    "x35_scd2_history",
    """
    WITH p AS (
        SELECT user_id, ts, value, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events
        WHERE event_type = 'purchase' AND user_id % 20 = 0
    ),
    d AS (SELECT user_id, ts, value FROM p WHERE rn = 1)
    SELECT user_id,
           round(value, 2) AS value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM d
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ORDER BY user_id, valid_from
    """,
    "SCD-2 dimension history build from a CDC-style change stream: "
    "per-key change rows -> validity intervals via lead() (valid_from, "
    "valid_to, is_current), deduplicated deterministically at equal "
    "timestamps; one shuffle keyed by the dimension key",
    ("cdc", "window"),
)
def x35_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    p = (
        t["events"]
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 20 == 0))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    w = W.partitionBy("user_id").orderBy("ts")
    return (
        p.select(
            "user_id",
            F.round("value", 2).alias("value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "valid_from")
    )


@query(
    "x36_quality_resample",
    """
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               least(1.0, n_chars / 2000.0) AS q,
               (('0x' || substr(md5('7:' || doc_id), 1, 15))::BIGINT % 1000000) / 1e6 AS u
        FROM documents
    )
    SELECT lang,
           count(*) AS n_total,
           CAST(count(CASE WHEN u < q THEN 1 END) AS BIGINT) AS n_kept,
           count(CASE WHEN u < q THEN 1 END) * 1000000 // count(*) / 1e6 AS kept_frac,
           CAST(sum(CASE WHEN u < q THEN n_chars END) AS BIGINT) AS kept_chars
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
    "deterministic quality-weighted corpus resampling: keep probability "
    "proportional to a quality score, decided by a content-keyed md5 "
    "hash instead of RNG — reproducible across engines, retries, and "
    "partitionings (same determinism contract as the split operator); "
    "pure projection + one aggregation, zero extra shuffle",
    ("sampling", "quality"),
)
def x36_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    q = F.least(F.lit(1.0), F.col("n_chars") / 2000.0)
    u = (dedup_ops.portable_hash(F.col("doc_id").cast("string"), 7) % 1000000) / 1e6
    scored = t["documents"].select(
        "lang", "n_chars", q.alias("q"), u.alias("u")
    )
    kept = F.when(F.col("u") < F.col("q"), F.lit(1))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(kept).alias("n_kept"),
            (F.expr("count(CASE WHEN u < q THEN 1 END) * 1000000 div count(1)") / 1e6).alias(
                "kept_frac"
            ),
            F.sum(F.when(F.col("u") < F.col("q"), F.col("n_chars"))).alias("kept_chars"),
        )
        .orderBy("lang")
    )


@query(
    "x37_anomaly_zscore",
    """
    -- the ENTIRE statistic pipeline is exact-integer-sourced (x66
    -- idiom taken to its conclusion): per-row integer cents make the
    -- windowed sums S1/S2 exact and order-independent, every derived
    -- double (mean, sample variance in one fixed expression order,
    -- sqrt, z) is then the IDENTICAL correctly-rounded value on both
    -- engines — the previous avg/stddev windows summed floats in
    -- engine-specific orders, so floor(z*1e4) could flip on an ulp.
    -- z is quantized by MAGNITUDE with the sign reapplied (flooring
    -- the signed z would let negative outliers pass at |z|>2.9999).
    WITH c AS (
        SELECT user_id, event_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    w AS (
        SELECT user_id, event_id, cents,
               sum(cents)         OVER win AS s1,
               sum(cents * cents) OVER win AS s2,
               count(*)           OVER win AS n_win
        FROM c
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT user_id, event_id, cents, s1, n_win,
               (s2 - s1 * s1 / (1.0 * n_win)) / (n_win - 1) AS var_c,
               cents - s1 / (1.0 * n_win) AS dev_c
        FROM w WHERE n_win >= 5
    ),
    q AS (
        SELECT user_id, event_id, cents, s1, n_win, dev_c,
               CAST(floor(abs(dev_c) / sqrt(var_c) * 10000) AS BIGINT) AS zq_mag
        FROM z WHERE var_c > 0
    )
    SELECT user_id, event_id,
           cents / 100.0 AS value,
           ((s1 * 100) // n_win) / 1e4 AS trailing_mean,
           (CASE WHEN dev_c >= 0 THEN zq_mag ELSE -zq_mag END) / 1e4 AS zscore
    FROM q
    WHERE zq_mag > 30000
    ORDER BY user_id, event_id
    """,
    "streaming-style anomaly detection on the event stream: per-user "
    "trailing-window mean/stddev (ROWS frame, bounded state) -> z-score "
    "-> |z| > 3 outlier flag; one shuffle keyed by user, deterministic "
    "(ts, event_id) ordering",
    ("events", "window", "quality"),
)
def x37_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    win = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    c = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    w = c.select(
        "user_id",
        "event_id",
        "cents",
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n_win"),
    ).filter(F.col("n_win") >= 5)
    # fixed expression order, every operand an exact integer or a
    # single division of exact integers -> identical doubles everywhere
    z = w.select(
        "user_id",
        "event_id",
        "cents",
        "s1",
        "n_win",
        ((F.col("s2") - F.col("s1") * F.col("s1") / (1.0 * F.col("n_win")))
         / (F.col("n_win") - 1)).alias("var_c"),
        (F.col("cents") - F.col("s1") / (1.0 * F.col("n_win"))).alias("dev_c"),
    ).filter(F.col("var_c") > 0)
    q = z.select(
        "user_id",
        "event_id",
        "cents",
        "s1",
        "n_win",
        "dev_c",
        F.floor(F.abs(F.col("dev_c")) / F.sqrt("var_c") * 10000)
        .cast("long")
        .alias("zq_mag"),
    ).filter(F.col("zq_mag") > 30000)
    return q.select(
        "user_id",
        "event_id",
        (F.col("cents") / 100.0).alias("value"),
        (F.expr("(s1 * 100) div n_win") / 1e4).alias("trailing_mean"),
        (
            F.when(F.col("dev_c") >= 0, F.col("zq_mag")).otherwise(-F.col("zq_mag"))
            / 1e4
        ).alias("zscore"),
    ).orderBy("user_id", "event_id")


@query(
    "x38_incremental_agg",
    """
    WITH base AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               count(*) AS n,
               sum(l_extendedprice) AS sum_price
        FROM lineitem WHERE l_orderkey % 10 != 0
        GROUP BY l_returnflag, l_linestatus
    ),
    delta AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               count(*) AS n,
               sum(l_extendedprice) AS sum_price
        FROM lineitem WHERE l_orderkey % 10 = 0
        GROUP BY l_returnflag, l_linestatus
    ),
    merged AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(sum_qty) AS BIGINT) AS sum_qty,
               CAST(sum(n) AS BIGINT) AS n,
               sum(sum_price) AS sum_price
        FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
        GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, sum_qty, n,
           round(sum_price, 2) AS sum_price,
           round(sum_price / n, 4) AS avg_price
    FROM merged
    ORDER BY l_returnflag, l_linestatus
    """,
    "incremental materialized-aggregate maintenance: a base aggregate "
    "table merged with a delta batch by COMBINING partial states "
    "(sums/counts re-summed, avg derived at read) instead of "
    "recomputing over the full corpus — the foreachBatch/CDC update "
    "pattern; equals the full recompute exactly",
    ("aggregation", "cdc"),
)
def x38_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("sum_price"),
        )

    base = partial(li.filter(F.col("l_orderkey") % 10 != 0))
    delta = partial(li.filter(F.col("l_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("sum_qty").cast("long").alias("sum_qty"),
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_price").alias("sum_price"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "n",
        F.round("sum_price", 2).alias("sum_price"),
        F.round(F.col("sum_price") / F.col("n"), 4).alias("avg_price"),
    ).orderBy("l_returnflag", "l_linestatus")


@query(
    "x39_snapshot_diff",
    """
    WITH old AS (
        SELECT o_orderkey AS k, o_totalprice, o_orderstatus FROM orders
        WHERE o_orderkey % 7 != 0
    ),
    new AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 3 != 0
    ),
    diff AS (
        SELECT coalesce(o.k, n.k) AS k,
               CASE WHEN o.k IS NULL THEN 'insert'
                    WHEN n.k IS NULL THEN 'delete'
                    WHEN o.o_totalprice != n.o_totalprice
                         OR o.o_orderstatus != n.o_orderstatus THEN 'update'
                    ELSE 'unchanged' END AS change
        FROM old o FULL OUTER JOIN new n ON o.k = n.k
    )
    SELECT change, count(*) AS n, min(k) AS min_key, max(k) AS max_key
    FROM diff
    GROUP BY change
    ORDER BY change
    """,
    "snapshot diff / change-data-feed between two table versions: "
    "full outer join on the key classifying insert/delete/update/"
    "unchanged (row-hash comparison) — the table-format CDF pattern "
    "computed relationally; one shuffle keyed by the table key",
    ("cdc", "join"),
)
def x39_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    o = t["orders"]
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), "o_totalprice", "o_orderstatus"
    )
    new = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    change = (
        F.when(F.col("o.k").isNull(), F.lit("insert"))
        .when(F.col("n.k").isNull(), F.lit("delete"))
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"), change.alias("change"))
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"), F.min("k").alias("min_key"), F.max("k").alias("max_key"))
        .orderBy("change")
    )


@query(
    "x40_stream_outer_join",
    """
    WITH horizon AS (
        SELECT least(
            (SELECT max(ts) FROM events WHERE event_type = 'click' AND user_id % 5 = 0),
            (SELECT max(ts) FROM events WHERE event_type = 'purchase')
        ) - INTERVAL 2 HOUR AS w
    )
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           round(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id % 5 = 0) c
    CROSS JOIN horizon h
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
    WHERE c.ts + INTERVAL 31 MINUTE <= h.w
    ORDER BY click_id, purchase_id NULLS FIRST
    """,
    "watermarked stream-stream LEFT OUTER interval join: clicks with no "
    "purchase within 30min still emit (null right side) once the "
    "watermark passes — the state-eviction semantics the inner "
    "flow_stream_join can't show. A bounded source's final watermark "
    "stops 2h short of max event time, so clicks whose join window has "
    "not fully expired are withheld by design; both engine and oracle "
    "restrict to clicks inside the emitted horizon (margin over the "
    "eviction boundary), making the bounded run equal the batch outer "
    "join exactly",
    ("streaming", "join"),
)
def x40_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the final watermark of the bounded run, computed batch-side: the
    # stream only emits unmatched clicks whose 30-min join window fully
    # expired before it (1-min margin keeps eviction boundary semantics
    # out of the compare)
    t = _t(spark, sf_dir)
    ev_b = t["events"]
    horizon = (
        ev_b.agg(
            (
                F.least(
                    F.max(
                        F.when(
                            (F.col("event_type") == "click") & (F.col("user_id") % 5 == 0),
                            F.col("ts"),
                        )
                    ),
                    F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                )
                - F.expr("INTERVAL 2 HOURS")
            ).alias("w")
        ).collect()[0]["w"]
    )
    ev = stream_ops._events_stream(spark, sf_dir)
    # NOTE: the stream itself must NOT be pre-filtered to the horizon —
    # the click-side watermark derives from the stream's own max event
    # time, so a ts filter lowers the watermark by the same amount and
    # the eviction horizon chases the filter (measured: exactly the
    # tail rows stay withheld). The horizon is applied to the
    # MATERIALIZED output instead.
    clicks = (
        ev.filter((F.col("event_type") == "click") & (F.col("user_id") % 5 == 0))
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            "value",
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        "click_id", "purchase_id", "user_id", "click_ts", F.round("value", 2).alias("purchase_value")
    )
    out = stream_ops.run_stream_to_table(joined, "stream_outer_join_out", output_mode="append")
    return (
        out.filter(F.col("click_ts") + F.expr("INTERVAL 31 MINUTES") <= F.lit(horizon))
        .select("click_id", "purchase_id", "user_id", "purchase_value")
        .orderBy("click_id", F.col("purchase_id").asc_nulls_first())
    )


@query(
    "x41_pq_adc_recall",
    None,  # iterative per-subspace k-means: float means are not bit-portable
    "product-quantization ANN: per-subspace codebooks trained on a "
    "deterministic 20% sample (euclidean Lloyd's via DataFrame aggs, "
    "hash-seeded), corpus encoded to m=4 one-byte codes (16x "
    "compression of the float corpus), asymmetric-distance shortlist "
    "via per-query lookup tables (the corpus scan does NO vector math "
    "— sum of m table lookups per row), exact re-rank of the 10x "
    "shortlist only (the PQ-prune + re-rank production pattern), "
    "recall measured against the exact euclidean ground truth "
    "in-query. NOTE the testdata embeddings are isotropic random unit "
    "vectors (pairwise d2 = 2.0 +/- 0.25 measured): distance "
    "concentration bounds ANY quantizer's recall on them, so the "
    "deliverable here is the mechanism (lookup-only scan, bounded "
    "codebooks, exact re-rank), not the recall value — rows-only "
    "check by design (iterative float training). The VALUE-ORACLED "
    "form of this family is ivfpq_recall_det (r14): deterministic "
    "integer training hash-matches end-to-end; x41 deliberately keeps "
    "exercising the float pq_fit/pq_encode/pq_adc_topk primitive "
    "surface (Lloyd's over DataFrame aggs) that production float "
    "pipelines use",
    ("similarity",),
)
def x41_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.sampling import deterministic_sample
    from .session import track_cache

    t = _t(spark, sf_dir)
    emb = track_cache(t["embeddings"].select("vec_id", "embedding"))
    train = deterministic_sample(emb, "vec_id", 0.2, salt="pq-train")
    # iters=1 per subspace: codebook movement after the first Lloyd
    # step doesn't change what the query demonstrates (PQ prune +
    # re-rank recall), and every extra iteration is m more jobs
    books = sim_ops.pq_fit(train, m=4, k=16, iters=1)
    codes = sim_ops.pq_encode(emb, books).select("vec_id", "codes")

    qbase = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # ADC prunes the corpus to a 10x shortlist; only the shortlist pays
    # full-precision distance math (re-rank) — the scan stays
    # lookup-only, which is the whole point of PQ at 10^9 vectors
    shortlist = sim_ops.pq_adc_topk(
        qbase, codes.filter(F.col("vec_id") >= 5), books, k=100
    ).select("q_id", "vec_id")
    rr_w = W.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    approx = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(qbase), "q_id")
        .select(
            "q_id", "vec_id", sim_ops._l2sq(F.col("q_vec"), F.col("embedding")).alias("d2")
        )
        .withColumn("rnk", F.row_number().over(rr_w))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )

    # exact euclidean ground truth off the same cached corpus
    scored = (
        emb.filter(F.col("vec_id") >= 5)
        .join(F.broadcast(qbase))
        .select(
            "q_id",
            "vec_id",
            sim_ops._l2sq(F.col("q_vec"), F.col("embedding")).alias("d2"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("d2"), F.col("vec_id"))
    truth = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )
    hits = truth.join(approx, ["q_id", "vec_id"])
    return (
        truth.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_found")), "q_id", "left")
        .select(
            "q_id",
            "n_true",
            F.coalesce(F.col("n_found"), F.lit(0)).alias("n_found"),
            F.round(F.coalesce(F.col("n_found"), F.lit(0)) / F.col("n_true"), 2).alias(
                "recall_at_10"
            ),
        )
        .orderBy("q_id")
    )


@query(
    "x42_segment_bitmask",
    """
    WITH m AS (
        SELECT user_id,
               bit_or(CASE event_type
                      WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 4
                      WHEN 'error' THEN 8 WHEN 'signup' THEN 16 ELSE 32 END) AS mask
        FROM events
        GROUP BY user_id
    )
    SELECT mask,
           count(*) AS n_users,
           (mask & 4 != 0) AS has_purchase,
           CAST(min(user_id) AS BIGINT) AS min_user
    FROM m
    GROUP BY mask
    ORDER BY mask
    """,
    "bitmap segmentation: per-user behavior bitmask via bit_or "
    "aggregation (one bit per event type), then segment distribution "
    "with bitwise predicates — the roaring-bitmap-style audience "
    "pattern in two map-side-combinable aggregations",
    ("events", "aggregation", "bitwise"),
)
def x42_segment_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "error", 8)
        .when(F.col("event_type") == "signup", 16)
        .otherwise(32)
    )
    m = (
        t["events"]
        .select("user_id", bit.alias("b"))
        .groupBy("user_id")
        .agg(F.expr("bit_or(b)").alias("mask"))
    )
    return (
        m.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_users"), F.min("user_id").alias("min_user"))
        .select(
            "mask",
            "n_users",
            (F.col("mask").bitwiseAND(4) != 0).alias("has_purchase"),
            "min_user",
        )
        .orderBy("mask")
    )


@query(
    "xdt_data_mixture",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
               (('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT % 1000000) / 1e6 AS u
        FROM documents
    ),
    totals AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens FROM toks GROUP BY lang),
    corpus AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS all_tokens FROM totals),
    rates AS (
        SELECT t.lang, t.lang_tokens,
               least(1.0, (CASE t.lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.2
                           WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15 ELSE 0.1 END)
                          * c.all_tokens * 0.5 / t.lang_tokens) AS rate
        FROM totals t CROSS JOIN corpus c
    )
    SELECT k.lang,
           r.lang_tokens,
           round(r.rate, 6) AS rate,
           count(*) AS n_kept,
           CAST(sum(k.n_tokens) AS BIGINT) AS kept_tokens
    FROM toks k
    JOIN rates r ON r.lang = k.lang
    WHERE k.u < r.rate
    GROUP BY k.lang, r.lang_tokens, r.rate
    ORDER BY k.lang
    """,
    "LLM data mixing: target language proportions (en .4 / zh .2 / "
    "de .15 / fr .15 / es .1) over a 50% global token budget -> "
    "per-language sampling rate from the corpus's own token totals -> "
    "deterministic hash-decided downsampling to the mixture (same "
    "no-RNG contract as the split/resample operators); the rate table "
    "is a broadcast-sized aggregate, the keep decision a pure "
    "projection",
    ("sampling", "text", "pipeline"),
)
def xdt_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")).alias(
            "n_tokens"
        ),
        (
            (dedup_ops.portable_hash(F.col("doc_id").cast("string"), F.lit("mix")) % 1000000)
            / 1e6
        ).alias("u"),
    )
    totals = toks.groupBy("lang").agg(F.sum("n_tokens").cast("long").alias("lang_tokens"))
    corpus = totals.agg(F.sum("lang_tokens").cast("long").alias("all_tokens"))
    weight = (
        F.when(F.col("lang") == "en", 0.4)
        .when(F.col("lang") == "zh", 0.2)
        .when(F.col("lang") == "de", 0.15)
        .when(F.col("lang") == "fr", 0.15)
        .otherwise(0.1)
    )
    rates = totals.join(F.broadcast(corpus)).select(
        "lang",
        "lang_tokens",
        F.least(
            F.lit(1.0), weight * F.col("all_tokens") * 0.5 / F.col("lang_tokens")
        ).alias("rate"),
    )
    return (
        toks.join(F.broadcast(rates), "lang")
        .filter(F.col("u") < F.col("rate"))
        .groupBy("lang", "lang_tokens", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
        )
        .select(
            "lang",
            "lang_tokens",
            F.round("rate", 6).alias("rate"),
            "n_kept",
            "kept_tokens",
        )
        .orderBy("lang")
    )


@query(
    "x44_hll_mergeable_sketches",
    None,  # datasketches HLL binary images are engine-specific
    "mergeable distinct-count sketches — the pre-aggregation pattern "
    "that makes 100 TB distinct-user rollups incremental: per-(day, "
    "event_type) HLL sketches (one pass over events), then weekly "
    "distinct-user estimates by MERGING the daily sketch states "
    "(hll_union_agg — never re-scanning events), compared in-query "
    "against the exact weekly distinct and a relative-error bound; "
    "rows-only by design (sketch binaries are engine-specific)",
    ("aggregation", "sketch", "timeseries"),
)
def x44_hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"].select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("week", F.col("ts")).alias("week"),
        "user_id",
    )
    # pass 1 (the only scan): daily sketch table — this is what a real
    # pipeline would PERSIST and maintain incrementally
    daily = ev.groupBy("week", "day", "event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").alias("exact_daily"),
    )
    # weekly rollup: union of daily sketch STATES, no second scan
    weekly = daily.groupBy("week", "event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_distinct"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("exact_daily").alias("sum_daily_exact"),
    )
    exact = ev.groupBy("week", "event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        weekly.join(exact, ["week", "event_type"])
        .select(
            "week",
            "event_type",
            "n_days",
            "exact_distinct",
            F.col("est_distinct").cast("long").alias("est_distinct"),
            # sketches must beat naive daily-sum double counting AND
            # land within HLL's error envelope
            (
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= 0.05
            ).alias("within_5pct"),
            (F.col("sum_daily_exact") >= F.col("exact_distinct")).alias(
                "naive_sum_overcounts"
            ),
        )
        .orderBy("week", "event_type")
    )


@query(
    "x45_heavy_hitters",
    None,  # freqItems candidate sets are sketch-dependent (over-approximate)
    "distributed heavy hitters over the corpus vocabulary: one-pass "
    "frequent-items sketch (df.stat.freqItems, Karp/Misra-Gries "
    "family — per-partition candidate counters, merged map-side, no "
    "full vocabulary shuffle) at 1% support, verified in-query against "
    "the exact word frequencies: every TRUE >=1% word must be in the "
    "candidate set (the algorithm's containment guarantee) — rows-only "
    "by design (the candidate superset is sketch-dependent)",
    ("text", "sketch", "aggregation"),
)
def x45_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    words = track_cache(
        t["documents"]
        .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    support = 0.01
    cand_row = words.stat.freqItems(["w"], support).collect()[0]
    candidates = set(cand_row["w_freqItems"])
    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    total = words.count()
    thresh = int(total * support)
    return (
        exact.filter(F.col("n") >= thresh)
        .select(
            F.col("w").alias("word"),
            "n",
            (F.expr(f"n * 1000000 div {total}") / 1e6).alias("freq"),
            F.col("w").isin(*candidates).alias("in_candidates"),
        )
        .orderBy(F.col("n").desc(), "word")
    )


@query(
    "dedup_apply",
    f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT reach.u, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    labels AS (SELECT u, least(u, min(r)) AS cluster_id FROM reach GROUP BY u)
    SELECT d.doc_id,
           coalesce(l.cluster_id, d.doc_id) AS cluster_id,
           (coalesce(l.cluster_id, d.doc_id) = d.doc_id) AS kept
    FROM documents d LEFT JOIN labels l ON l.u = d.doc_id
    ORDER BY d.doc_id
    """,
    "end-to-end dedup APPLICATION over the corpus: MinHash+LSH pairs -> "
    "connected-component clusters -> keep exactly the min-id "
    "representative per cluster, emit the keep/drop decision for EVERY "
    "document (singletons keep themselves via the left join) — the "
    "materialization a training pipeline actually ships; the oracle "
    "replays clustering as a recursive transitive closure",
    ("dedup", "graph", "pipeline"),
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import connected_components

    t = _t(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup_ops.minhash_near_dup(
        docs, shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    cc = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed("vertex", "doc_id")
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("doc_id")).alias("kept"),
        )
        .orderBy("doc_id")
    )


@query(
    "x50_gopher_rules",
    """
    WITH feat AS (
        SELECT doc_id, lang,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_words,
               len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))) AS n_distinct,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> list_contains(['the','a','of','and','in','to','is'], lower(x)))) AS n_stop,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
        FROM documents
    ),
    flags AS (
        SELECT doc_id, lang, n_words,
               (n_words >= 5 AND n_words <= 5000) AS ok_word_count,
               (n_nonspace >= n_words * 2 AND n_nonspace <= n_words * 12) AS ok_mean_word_len,
               (n_stop >= 2) AS ok_stopwords,
               (n_punct * 10 <= n_chars * 3) AS ok_symbol_ratio,
               (n_digit * 5 <= n_chars) AS ok_digit_ratio,
               (n_distinct * 10 >= n_words * 3) AS ok_repetition
        FROM feat
    )
    SELECT doc_id, lang, n_words,
           ok_word_count, ok_mean_word_len, ok_stopwords,
           ok_symbol_ratio, ok_digit_ratio, ok_repetition,
           -- coalesce: DuckDB's array_to_string of an all-NULL-filtered
           -- (empty) list is NULL, Spark's array_join is ''
           coalesce(array_to_string(list_filter([
               CASE WHEN NOT ok_word_count THEN 'word_count' END,
               CASE WHEN NOT ok_mean_word_len THEN 'mean_word_len' END,
               CASE WHEN NOT ok_stopwords THEN 'stopwords' END,
               CASE WHEN NOT ok_symbol_ratio THEN 'symbol_ratio' END,
               CASE WHEN NOT ok_digit_ratio THEN 'digit_ratio' END,
               CASE WHEN NOT ok_repetition THEN 'repetition' END
           ], x -> x IS NOT NULL), ','), '') AS reasons,
           (ok_word_count AND ok_mean_word_len AND ok_stopwords
            AND ok_symbol_ratio AND ok_digit_ratio AND ok_repetition) AS passes
    FROM flags
    ORDER BY doc_id
    """,
    "Gopher/C4-style rule-based quality filter: per-document pass/fail "
    "per rule + failed-rule audit trail, every threshold an integer "
    "cross-multiplication (no float ratio can flip membership on an "
    "engine rounding ulp); pure codegen projections, scan-speed",
    ("text", "quality", "pipeline"),
)
def x50_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    out = text_ops.gopher_rules(t["documents"])
    return out.select(
        "doc_id",
        "lang",
        "n_words",
        *[F.col(f"ok_{n}") for n in text_ops.GOPHER_RULES],
        "reasons",
        "passes",
    ).orderBy("doc_id")


@query(
    "x51_semantic_dedup_apply",
    f"""
    WITH RECURSIVE {_COSINE_SQL},
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM normed a JOIN normed b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_pair_sim_sql()} >= 0.45
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT reach.u, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    labels AS (SELECT u, least(u, min(r)) AS cluster_id FROM reach GROUP BY u)
    SELECT e.vec_id,
           coalesce(l.cluster_id, e.vec_id) AS cluster_id,
           (coalesce(l.cluster_id, e.vec_id) = e.vec_id) AS kept
    FROM embeddings e LEFT JOIN labels l ON l.u = e.vec_id
    ORDER BY e.vec_id
    """,
    "semantic dedup APPLICATION (SemDeDup-style): embedding-cosine "
    "near-dup pairs from cell-bucketed candidates (the cross product "
    "collapses on the cell key, same plan as x98_ann_embedding_near_dup) -> "
    "connected-component clusters -> per-vector keep/drop with the "
    "min-id representative kept; the oracle replays clustering as a "
    "recursive transitive closure over the same pair SQL",
    ("similarity", "dedup", "graph", "pipeline"),
)
def x51_semantic_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import connected_components

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    pairs = sim_ops.embedding_near_dup_pairs_bucketed(emb, threshold=0.45)
    cc = connected_components(pairs, "id_a", "id_b").withColumnRenamed("vertex", "vec_id")
    cluster = F.coalesce(F.col("component"), F.col("vec_id"))
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("vec_id")).alias("kept"),
        )
        .orderBy("vec_id")
    )


@query(
    "x52_skyline_frontier",
    """
    WITH g AS (
        SELECT p_size AS sz, min(p_retailprice) AS pr
        FROM part GROUP BY p_size
    ),
    r AS (
        SELECT sz, pr,
               min(pr) OVER (ORDER BY sz DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevbest
        FROM g
    ),
    sky AS (SELECT sz, pr FROM r WHERE prevbest IS NULL OR pr < prevbest)
    SELECT s.sz AS p_size, s.pr AS best_price,
           count(*) AS n_parts, min(p.p_partkey) AS min_partkey
    FROM sky s JOIN part p ON p.p_size = s.sz AND p.p_retailprice = s.pr
    GROUP BY s.sz, s.pr
    ORDER BY p_size
    """,
    "skyline / Pareto frontier (maximize p_size, minimize "
    "p_retailprice): dominance collapses to a map-side-combinable "
    "per-size min + ONE window over the DISTINCT-size table (50 rows, "
    "never the data) + a broadcast join back for the frontier rows — "
    "the grid-reduction shape the Spark-SQL skyline literature uses "
    "for low-dimensional skylines instead of an all-pairs NOT EXISTS",
    ("window", "aggregation", "analytics"),
)
def x52_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    part = t["part"]
    g = part.groupBy(F.col("p_size").alias("sz")).agg(F.min("p_retailprice").alias("pr"))
    # window over the distinct-size table only (bounded by the dimension
    # domain, 50 rows here) — the single-partition sort is deliberate
    # and size-independent of the corpus
    w = W.orderBy(F.col("sz").desc()).rowsBetween(W.unboundedPreceding, -1)
    sky = (
        g.withColumn("prevbest", F.min("pr").over(w))
        .filter(F.col("prevbest").isNull() | (F.col("pr") < F.col("prevbest")))
        .select("sz", "pr")
    )
    return (
        part.join(
            F.broadcast(sky),
            (part["p_size"] == sky["sz"]) & (part["p_retailprice"] == sky["pr"]),
        )
        .groupBy("sz", "pr")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.min("p_partkey").alias("min_partkey"))
        .select(
            F.col("sz").alias("p_size"),
            F.col("pr").alias("best_price"),
            "n_parts",
            "min_partkey",
        )
        .orderBy("p_size")
    )


@query(
    "x53_corpus_freq_score",
    """
    WITH words AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')) AS w
        FROM documents
    ),
    vocab AS (SELECT w, count(*) AS c FROM words GROUP BY w),
    n AS (SELECT sum(c) AS total FROM vocab),
    scored AS (
        SELECT words.doc_id, count(*) AS n_words,
               CAST(sum(v.c) AS BIGINT) AS sum_freq
        FROM words JOIN vocab v USING (w)
        GROUP BY words.doc_id
    )
    SELECT doc_id, n_words,
           -- integer quantization: sum_freq/(n_words*total) is an exact
           -- rational; *1e6 with integer floor-div is bit-identical on
           -- both engines (no float before the final /1e6 display cast)
           CAST(sum_freq * 1000000 // (n_words * (SELECT total FROM n)) AS BIGINT) / 1e6
               AS mean_corpus_freq
    FROM scored
    ORDER BY doc_id
    """,
    "CCNet-style corpus-frequency quality signal: each document scored "
    "by the mean corpus frequency of its word occurrences (high = "
    "common-word prose, low = rare-token/garbage text). One map-side-"
    "combinable vocab aggregation + one word-keyed shuffle join; the "
    "score is an exact integer-quantized rational so both engines agree "
    "bit-for-bit. At petabyte scale swap the BIGINT products for "
    "DECIMAL(38,0) (sum_freq*1e6 approaches int64 range there)",
    ("text", "quality", "pipeline"),
)
def x53_corpus_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    words = track_cache(
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = track_cache(words.groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    # corpus total rides in-plan as a broadcast one-row aggregate (the
    # r7 scalar-fold pattern — the r13 verdict's last watch item): no
    # driver round-trip, one fewer job per run
    total = vocab.agg(F.sum("c").cast("long").alias("__total"))
    return (
        words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"), F.sum("c").alias("sum_freq"))
        .join(F.broadcast(total))
        .select(
            "doc_id",
            "n_words",
            (F.expr("sum_freq * 1000000 div (n_words * __total)") / 1e6).alias(
                "mean_corpus_freq"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "x54_chunk_overlap",
    """
    WITH words AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               unnest(range(0, greatest(len(w) - 16, 1), 48)) AS start,
               w
        FROM words
    )
    SELECT doc_id,
           CAST(start // 48 AS BIGINT) AS chunk_idx,
           least(64, len(w) - start) AS n_tokens,
           md5(array_to_string(w[start + 1 : start + 64], ' ')) AS chunk_hash
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    "RAG/training-style document chunking: fixed 64-token windows with "
    "16-token overlap (stride 48), emitted as (doc, chunk_idx, hash) — "
    "pure map-side explode of per-doc start offsets, zero shuffle "
    "except the presentation sort; chunk content carried as md5 so the "
    "output stays narrow",
    ("text", "pipeline"),
)
def x54_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    C, O, stride = 64, 16, 48
    words = t["documents"].select(
        "doc_id",
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "").alias("w"),
    )
    n = F.size("w")
    # same start set as DuckDB range(0, greatest(n-O, 1), stride):
    # sequence's stop is inclusive, so stop at greatest(n-O-1, 0)
    starts = F.sequence(F.lit(0), F.greatest(n - O - 1, F.lit(0)), F.lit(stride))
    return (
        words.select("doc_id", "w", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_idx"),
            F.least(F.lit(C), F.size("w") - F.col("start")).alias("n_tokens"),
            F.md5(F.array_join(F.slice("w", F.col("start") + 1, C), " ")).alias(
                "chunk_hash"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "x55_cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT) AS week_offset,
           count(*) AS n_users
    FROM firsts f JOIN active a USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
    "cohort retention over the event stream: first-activity week per "
    "user -> distinct active weeks -> (cohort, week-offset) user "
    "counts; two map-side-combinable aggregations + one user-keyed "
    "join, week arithmetic exact (day diffs between week-truncated "
    "timestamps are multiples of 7)",
    ("events", "aggregation", "analytics"),
)
def x55_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        firsts.join(active, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "x56_fuzzy_match_blocked",
    """
    WITH named AS (
        SELECT p_partkey, split_part(p_name, ' ', 1) AS block,
               split_part(p_name, ' ', 2) AS noun
        FROM part
    ),
    d AS (
        SELECT block, noun, min(p_partkey) AS rep_id, count(*) AS n
        FROM named GROUP BY block, noun
    )
    SELECT a.block AS block, a.noun AS noun_a, b.noun AS noun_b,
           levenshtein(a.noun, b.noun) AS dist,
           a.n AS n_a, b.n AS n_b
    FROM d a JOIN d b ON a.block = b.block AND a.noun < b.noun
    WHERE levenshtein(a.noun, b.noun) <= 2
    ORDER BY 1, 2, 3
    """,
    "blocked fuzzy matching (entity-resolution shape): block on the "
    "first name token, edit-distance verify ONLY within blocks of the "
    "DISTINCT-name table — candidates bounded by block sizes, the "
    "corpus-sized table is touched once by a map-side-combinable "
    "distinct agg; levenshtein(<=2) is integer-exact on both engines",
    ("join", "dedup", "text"),
)
def x56_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    named = t["part"].select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("block"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    d = named.groupBy("block", "noun").agg(
        F.min("p_partkey").alias("rep_id"), F.count(F.lit(1)).alias("n")
    )
    a = d.alias("a")
    b = d.alias("b")
    dist = F.levenshtein(F.col("a.noun"), F.col("b.noun"))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.noun") < F.col("b.noun")))
        .filter(dist <= 2)
        .select(
            F.col("a.block").alias("block"),
            F.col("a.noun").alias("noun_a"),
            F.col("b.noun").alias("noun_b"),
            dist.alias("dist"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .orderBy("block", "noun_a", "noun_b")
    )


@query(
    "x57_shingle_containment",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    sizes AS (SELECT doc, count(*) n FROM sh GROUP BY doc),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) c
        FROM cand p
        JOIN sh x ON x.doc = p.doc_a
        JOIN sh y ON y.doc = p.doc_b AND y.shingle = x.shingle
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.c * 1000000 // sa.n AS BIGINT) / 1e6 AS contain_a_in_b,
           CAST(i.c * 1000000 // sb.n AS BIGINT) / 1e6 AS contain_b_in_a
    FROM inter i
    JOIN sizes sa ON sa.doc = i.doc_a
    JOIN sizes sb ON sb.doc = i.doc_b
    WHERE i.c * 10 >= sa.n * 9 OR i.c * 10 >= sb.n * 9
    ORDER BY doc_a, doc_b
    """,
    "shingle CONTAINMENT (asymmetric Jaccard |A∩B|/|A|): detects a "
    "document near-embedded in another (boilerplate wrapping, quote "
    "expansion) that symmetric-Jaccard dedup misses when sizes differ; "
    "candidates from the same LSH bands, intersection counted once per "
    "pair, >=90%% threshold as an integer cross-multiplication, scores "
    "integer-quantized — no float in filter or output arithmetic",
    ("dedup", "text"),
)
def x57_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    docs = t["documents"]
    sh = track_cache(dedup_ops.hashed_shingles(docs, "text", "doc_id", 3))
    # prehashed=True is CORRECTNESS-relevant, not just speed: the oracle
    # builds its bands from the hashed shingle longs, so re-hashing here
    # would put Spark on a different LSH family — a different candidate
    # superset that only happens to contain the same verified pairs.
    # Bands cached: the candidate self-join reads both sides.
    sig = dedup_ops.minhash_signatures(sh, num_hashes=16, prehashed=True)
    bands = track_cache(dedup_ops.lsh_bands(sig, rows_per_band=2))
    cand = dedup_ops.lsh_candidate_pairs(bands)
    # intersection + sizes in one array-verify pass (dedup.pair_
    # intersections): two doc-keyed joins, no per-candidate explosion
    inter = dedup_ops.pair_intersections(sh, cand).withColumnRenamed("n_common", "c")
    return (
        inter.filter(
            (F.col("c") * 10 >= F.col("n_a") * 9) | (F.col("c") * 10 >= F.col("n_b") * 9)
        )
        .select(
            "doc_a",
            "doc_b",
            (F.expr("c * 1000000 div n_a") / 1e6).alias("contain_a_in_b"),
            (F.expr("c * 1000000 div n_b") / 1e6).alias("contain_b_in_a"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "x58_split_leakage",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    assigned AS (
        SELECT doc_id,
               CASE WHEN bkt < 100000 THEN 'test'
                    WHEN bkt < 900000 THEN 'train'
                    ELSE 'val' END AS split
        FROM (
            SELECT doc_id,
                   ('0x' || substr(md5('split:' || doc_id), 1, 15))::BIGINT % 1000000 AS bkt
            FROM documents
        )
    )
    SELECT p.doc_a, p.doc_b, a1.split AS split_a, a2.split AS split_b
    FROM pairs p
    JOIN assigned a1 ON a1.doc_id = p.doc_a
    JOIN assigned a2 ON a2.doc_id = p.doc_b
    WHERE a1.split <> a2.split
    ORDER BY p.doc_a, p.doc_b
    """,
    "train/test split LEAKAGE detector: near-dup pairs (MinHash+LSH, "
    "Jaccard >= 0.8) whose endpoints land in DIFFERENT hash-decided "
    "splits — the eval-contamination QA gate a pipeline runs before "
    "shipping a split; two broadcast-able joins of the tiny pair set "
    "against the split assignment",
    ("dedup", "sampling", "pipeline"),
)
def x58_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import split_assign

    t = _t(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup_ops.minhash_near_dup(
        docs, shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    ).select("doc_a", "doc_b")
    assigned = split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).select(
        "doc_id", "split"
    )
    a1 = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    a2 = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(a1, "doc_a")
        .join(a2, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
        .orderBy("doc_a", "doc_b")
    )


@query(
    "x59_event_pattern_negation",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
    FROM events c
    JOIN events p ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id
          AND e.ts > c.ts AND e.ts < p.ts
    )
    ORDER BY click_id, purchase_id
    """,
    "event-sequence pattern with NEGATION (CEP / MATCH_RECOGNIZE "
    "shape): click followed by a purchase within 1h for the same user "
    "with NO error event between them — interval join for the positive "
    "legs, LEFT ANTI range join for the negative leg; both shuffle on "
    "user_id only, per-user range predicates evaluated within "
    "co-partitioned rows",
    ("events", "join", "analytics"),
)
def x59_event_pattern_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    matched = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    clean = matched.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") < F.col("p_ts")),
        "left_anti",
    )
    return clean.select("click_id", "purchase_id", "user_id").orderBy(
        "click_id", "purchase_id"
    )


@query(
    "x60_dup_span_detect",
    r"""
    WITH words AS (SELECT doc_id, regexp_split_to_array(text, '\s+') w FROM documents),
    spans AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT AS span_h
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(len(w) - 7),
                          i -> concat_ws(' ', w[i+1], w[i+2], w[i+3], w[i+4],
                                         w[i+5], w[i+6], w[i+7], w[i+8]))) AS s
            FROM words WHERE len(w) >= 8)
    ),
    dup AS (SELECT span_h FROM spans GROUP BY span_h HAVING count(DISTINCT doc_id) >= 2),
    per AS (
        SELECT s.doc_id, count(*) AS n_spans, count(d.span_h) AS n_dup
        FROM spans s LEFT JOIN dup d ON d.span_h = s.span_h
        GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(p.n_dup, 0) * 1000000 // greatest(coalesce(p.n_spans, 0), 1) AS BIGINT) / 1e6 AS dup_frac,
           (coalesce(p.n_dup, 0) * 10 >= coalesce(p.n_spans, 0) * 3
            AND coalesce(p.n_spans, 0) > 0) AS flagged
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    "exact duplicated-SPAN detection (substring-level dedup, Lee et al. "
    "2022): every 8-word window hashed map-side (60-bit longs), a span "
    "is corpus-duplicated when >= 2 distinct docs contain it; per-doc "
    "duplicated-span fraction + integer-cross-multiplied flag. Catches "
    "the copied-paragraph-inside-unique-doc case doc-level MinHash "
    "misses. One groupBy(span_hash) + one equi-join back — O(tokens), "
    "never all-pairs",
    ("dedup", "text"),
)
def x60_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return dedup_ops.dup_span_stats(
        t["documents"], span_words=8, dup_num=3, dup_den=10
    ).orderBy("doc_id")


@query(
    "x61_dedup_incremental",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_bands_sql()},
    mem AS (
        SELECT doc_id AS doc,
               ('0x' || substr(md5('inc:' || doc_id), 1, 15))::BIGINT % 1000000 < 800000 AS in_corpus
        FROM documents
    ),
    cand AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM bands a
        JOIN mem ma ON ma.doc = a.doc AND NOT ma.in_corpus
        JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
        JOIN mem mb ON mb.doc = b.doc AND mb.in_corpus
    ),
    {_JACCARD_CTES},
    ver AS (
        SELECT i.doc_a, i.doc_b, round(i.c / (sa.n + sb.n - i.c), 6) AS j
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    )
    SELECT doc_a AS doc_id, min(doc_b) AS dup_of,
           count(*) AS n_matches, max(j) AS best_jaccard
    FROM ver GROUP BY doc_a ORDER BY doc_id
    """,
    "INCREMENTAL dedup (nightly-ingest pattern): a hash-decided 20%% "
    "'incoming' batch matched against the 80%% existing corpus only — "
    "incoming band keys equi-join the corpus band index (cost ~ batch x "
    "collisions, independent of corpus size beyond the probe; corpus "
    "pairs never re-checked), exact-Jaccard verify on candidates, min "
    "corpus id as canonical dup target",
    ("dedup", "pipeline"),
)
def x61_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    incoming = (
        F.pmod(dedup_ops.portable_hash(F.col("doc_id"), F.lit("inc")), F.lit(1_000_000))
        >= 800_000
    )
    return dedup_ops.incremental_near_dup(docs, incoming, threshold=0.8).orderBy("doc_id")


@query(
    "x62_stratified_sample_exact",
    """
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5('fix:' || doc_id), 1, 15))::BIGINT % 1000000,
                            doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, lang, rk FROM ranked WHERE rk <= 20 ORDER BY lang, rk
    """,
    "EXACT-size stratified sampling: exactly min(n, 20) docs per "
    "language, chosen by hash-ordered row_number (df.sample/limit are "
    "irreproducible; this is deterministic across engines/retries/"
    "partitionings and stable per doc as the corpus grows). One window "
    "per stratum partition — no global sort",
    ("sampling", "pipeline"),
)
def x62_stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    h = F.pmod(dedup_ops.portable_hash(F.col("doc_id"), F.lit("fix")), F.lit(1_000_000))
    rk = F.row_number().over(W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc()))
    return (
        t["documents"]
        .select("doc_id", "lang", rk.alias("rk"))
        .filter(F.col("rk") <= 20)
        .orderBy("lang", "rk")
    )


@query(
    "x63_bm25_topk",
    r"""
    WITH dl AS (SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS dl FROM documents),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (
        SELECT doc_id, word, count(*) AS tf
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
        WHERE word IN ('spark', 'window', 'join')
        GROUP BY doc_id, word
    ),
    dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY word),
    per_term AS (
        SELECT t.doc_id, t.word,
               ln(1 + (st.n_docs - d.dft + 0.5) / (d.dft + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl * st.n_docs / st.sum_dl))) AS s
        FROM tf t
        JOIN dfq d ON d.word = t.word
        JOIN dl l ON l.doc_id = t.doc_id
        CROSS JOIN st
    ),
    pivoted AS (
        SELECT doc_id,
               coalesce(max(CASE WHEN word = 'join' THEN s END), 0) AS s_join,
               coalesce(max(CASE WHEN word = 'spark' THEN s END), 0) AS s_spark,
               coalesce(max(CASE WHEN word = 'window' THEN s END), 0) AS s_window
        FROM per_term GROUP BY doc_id
    ),
    scored AS (
        SELECT doc_id, round(s_join + s_spark + s_window, 6) AS score
        FROM pivoted
    )
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rk
    FROM scored
    QUALIFY rk <= 10
    ORDER BY rk
    """,
    "BM25 relevance search (k1=1.2, b=0.75) for query terms "
    "{spark, window, join}: tf/df/doclen aggregates + one broadcast "
    "scalar (n_docs, sum_dl — avgdl derived as a ratio of EXACT integer "
    "sums, so both engines divide the same integers); per-term scores "
    "pivoted to fixed columns and added in a FIXED order (float "
    "addition isn't associative — an agg-order sum would differ by an "
    "ulp between engines); rank over the 6dp-rounded score, top 10",
    ("text", "search"),
)
def x63_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    docs = t["documents"]
    terms = ["spark", "window", "join"]
    dl = docs.select("doc_id", F.size(F.split("text", r"\s+")).cast("long").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word").isin(terms))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("dft"))
    per_term = (
        tf.join(F.broadcast(dfq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            "word",
            (
                F.log(F.lit(1) + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (0.25 + 0.75 * (F.col("dl") * F.col("n_docs") / F.col("sum_dl")))
                )
            ).alias("s"),
        )
    )
    pivoted = per_term.groupBy("doc_id").agg(
        *[
            F.coalesce(F.max(F.when(F.col("word") == w, F.col("s"))), F.lit(0.0)).alias(
                f"s_{w}"
            )
            for w in ("join", "spark", "window")
        ]
    )
    scored = pivoted.select(
        "doc_id",
        F.round(F.col("s_join") + F.col("s_spark") + F.col("s_window"), 6).alias("score"),
    )
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
    # global sort), then rank the 10 surviving rows: the unpartitioned
    # row_number window only ever sees k rows, not the corpus
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    rk = F.row_number().over(W.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
    return top.select("doc_id", "score", rk.alias("rk")).orderBy("rk")


@query(
    "x64_domain_cap",
    """
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS src_total
        FROM documents
    )
    SELECT source, doc_id, n_chars, rk, src_total
    FROM ranked WHERE rk <= 5 ORDER BY source, rk
    """,
    "per-DOMAIN document cap (anti-over-representation: web corpora cap "
    "docs per domain before training): keep the top-5 longest docs per "
    "source with a deterministic doc_id tie-break, carrying the "
    "domain's pre-cap total for the audit trail; one row_number + one "
    "count window over the same partition — a single shuffle on source",
    ("sampling", "pipeline"),
)
def x64_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    p = W.partitionBy("source")
    return (
        t["documents"]
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number()
            .over(p.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()))
            .alias("rk"),
            F.count(F.lit(1)).over(p).alias("src_total"),
        )
        .filter(F.col("rk") <= 5)
        .orderBy("source", "rk")
    )


@query(
    "x65_training_order_shard",
    r"""
    WITH assigned AS (
        SELECT doc_id,
               len(regexp_split_to_array(text, '\s+')) AS n_tok,
               ('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT % 8 AS shard,
               ('0x' || substr(md5('order:' || doc_id), 1, 15))::BIGINT % 1000000 AS ord_h
        FROM documents
    ),
    positioned AS (
        SELECT doc_id, n_tok, shard,
               row_number() OVER (PARTITION BY shard ORDER BY ord_h, doc_id) AS pos
        FROM assigned
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min_by(doc_id, pos) AS first_doc,
           max_by(doc_id, pos) AS last_doc,
           CAST(sum(doc_id * pos) AS BIGINT) AS order_checksum
    FROM positioned
    GROUP BY shard
    ORDER BY shard
    """,
    "deterministic training-order SHARDING: every doc hashed to one of "
    "8 shards, ordered within its shard by a second independent hash — "
    "the reproducible global-shuffle + shard step an LLM data pipeline "
    "runs last (RNG shuffles can't be re-derived after a failed run; "
    "this is a pure function of doc_id). Per-shard audit row carries an "
    "order checksum (sum of doc_id x position — exact integers, "
    "order-independent sum, but any reordering changes it), so the "
    "oracle verifies the ORDER itself, not just membership. One "
    "shuffle on shard; within-shard row_number streams the sorted "
    "partition",
    ("sampling", "pipeline"),
)
def x65_training_order_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ph = dedup_ops.portable_hash
    assigned = t["documents"].select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tok"),
        F.pmod(ph(F.col("doc_id"), F.lit("shard")), F.lit(8)).alias("shard"),
        F.pmod(ph(F.col("doc_id"), F.lit("order")), F.lit(1_000_000)).alias("ord_h"),
    )
    pos = F.row_number().over(
        W.partitionBy("shard").orderBy(F.col("ord_h").asc(), F.col("doc_id").asc())
    )
    return (
        assigned.withColumn("pos", pos)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min_by("doc_id", "pos").alias("first_doc"),
            F.max_by("doc_id", "pos").alias("last_doc"),
            F.sum(F.col("doc_id") * F.col("pos")).alias("order_checksum"),
        )
        .orderBy("shard")
    )


@query(
    "x66_unigram_logprob",
    r"""
    WITH words AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
        FROM documents
    ),
    vocab AS (SELECT word, count(*) AS cnt FROM words GROUP BY word),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    -- per-WORD negative log-prob, integer-quantized ONCE at the vocab
    -- level: per-doc sums are then exact integer arithmetic (a float
    -- sum over words would differ by engine summation order)
    nll AS (
        SELECT v.word,
               CAST(floor(ln(t.total / v.cnt) * 1000000) AS BIGINT) AS q
        FROM vocab v CROSS JOIN tot t
    )
    SELECT w.doc_id,
           count(*) AS n_tokens,
           CAST(sum(n.q) AS BIGINT) AS nll_sum_q,
           CAST(sum(n.q) // count(*) AS BIGINT) / 1e6 AS mean_nll,
           sum(n.q) > count(*) * 5000000 AS flagged
    FROM words w JOIN nll n ON n.word = w.word
    GROUP BY w.doc_id
    ORDER BY w.doc_id
    """,
    "unigram log-prob quality score (the cheap 'perplexity filter' "
    "proxy of CCNet/Gopher pipelines, no LM needed): corpus unigram "
    "distribution -> per-word negative log-prob quantized to integer "
    "micro-nats ONCE at the vocab level -> per-doc mean NLL as exact "
    "integer sums (float summation order can't flip anything) -> "
    "flagged when mean NLL > 5 nats via integer cross-multiplication. "
    "Vocab is bounded, broadcast into the word stream; everything else "
    "is map-side + one groupBy(doc)",
    ("text", "pipeline"),
)
def x66_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    words = t["documents"].select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    nll = (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "word",
            F.floor(F.log(F.col("total") / F.col("cnt")) * 1_000_000)
            .cast("long")
            .alias("q"),
        )
    )
    return (
        words.join(F.broadcast(nll), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("q").alias("nll_sum_q"),
            F.expr("CAST(sum(q) div count(1) AS BIGINT)").alias("__m"),
            (F.sum("q") > F.count(F.lit(1)) * 5_000_000).alias("flagged"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "nll_sum_q",
            (F.col("__m") / 1e6).alias("mean_nll"),
            "flagged",
        )
        .orderBy("doc_id")
    )


@query(
    "x67_mad_outliers",
    """
    WITH pv AS (
        SELECT user_id, value FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    med AS (SELECT user_id, round(median(value), 4) AS med FROM pv GROUP BY user_id),
    dev AS (
        SELECT p.user_id, m.med, abs(p.value - m.med) AS dev
        FROM pv p JOIN med m USING (user_id)
    ),
    mad AS (SELECT user_id, round(median(dev), 4) AS mad FROM dev GROUP BY user_id)
    SELECT d.user_id, count(*) AS n, min(d.med) AS med, min(a.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > 5.1891 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (user_id)
    GROUP BY d.user_id ORDER BY d.user_id
    """,
    "robust (MAD-based) outlier detection per user: median and median "
    "absolute deviation via the SAME bounded-state two-pass exact "
    "quantile operator q11 uses (never an O(group) agg buffer), outlier "
    "= deviation > 3.5 sigma-equivalents (3.5 x 1.4826 = 5.1891). "
    "Unlike the x37 trailing z-score, MAD doesn't let one spike inflate "
    "its own threshold. Quantiles are 4dp-quantized AT THE STAGE SEAM "
    "(before the deviation pass), so all downstream arithmetic is "
    "identical doubles on both engines — no ulp-dependent membership",
    ("events", "analytics", "quality"),
)
def x67_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantiles import exact_group_quantiles
    from .session import track_cache

    t = _t(spark, sf_dir)
    # NULL values dropped on BOTH sides: the quantile operator emits no
    # row for an all-NULL group, so an unfiltered oracle would keep a
    # user the Spark side drops
    pv = track_cache(
        t["events"]
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("user_id", "value")
    )
    med = exact_group_quantiles(pv, ["user_id"], "value", [0.5]).select(
        "user_id", F.round(F.col("quantiles")[0], 4).alias("med")
    )
    dev = track_cache(
        pv.join(med, "user_id").select(
            "user_id", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
        )
    )
    mad = exact_group_quantiles(dev, ["user_id"], "dev", [0.5]).select(
        "user_id", F.round(F.col("quantiles")[0], 4).alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > F.lit(5.1891) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("user_id")
    )


@query(
    "x68_drift_psi",
    """
    WITH pv AS (
        SELECT CAST(least(floor(value / 20), 19) AS BIGINT) AS bin,
               day(ts) <= 15 AS base
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    bins AS (SELECT unnest(range(20)) AS bin),
    agg AS (
        SELECT bin,
               CAST(sum(CASE WHEN base THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN NOT base THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM pv GROUP BY bin
    ),
    counts AS (
        SELECT b.bin, coalesce(a.n_a, 0) AS n_a, coalesce(a.n_b, 0) AS n_b
        FROM bins b LEFT JOIN agg a ON a.bin = b.bin
    ),
    tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM counts),
    terms AS (
        SELECT c.bin, c.n_a, c.n_b,
               CAST(floor(
                   (((c.n_a + 1.0) / (t.ta + 20)) - ((c.n_b + 1.0) / (t.tb + 20)))
                   * ln(((c.n_a + 1.0) * (t.tb + 20)) / ((c.n_b + 1.0) * (t.ta + 20)))
                   * 1000000000
               ) AS BIGINT) AS term_q
        FROM counts c CROSS JOIN tot t
    )
    SELECT bin, n_a, n_b,
           term_q / 1e9 AS psi_term,
           CAST(sum(term_q) OVER () AS BIGINT) / 1e9 AS psi_total
    FROM terms
    ORDER BY bin
    """,
    "data DRIFT detection via Population Stability Index: purchase-value "
    "histograms (20 fixed-width bins, dense bin spine so empty bins "
    "still contribute) for days 1-15 vs 16-31, Laplace-smoothed "
    "proportions as exact integer rationals, per-bin PSI term "
    "(p-q)ln(p/q) integer-quantized at 1e-9 BEFORE the cross-bin sum "
    "(float summation order can't flip the total); the rollout QA gate "
    "that catches a feature distribution shifting between dataset "
    "versions. Two map-side-combinable aggs + a 20-row spine join",
    ("events", "quality", "analytics"),
)
def x68_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    pv = (
        t["events"]
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            F.least(F.floor(F.col("value") / 20), F.lit(19)).cast("long").alias("bin"),
            (F.dayofmonth("ts") <= 15).alias("base"),
        )
    )
    bins = spark.range(20).select(F.col("id").alias("bin"))
    # aggregate BEFORE the spine join: the corpus reduces map-side to
    # <=20 rows per task, so the 20-key shuffle carries partial counts,
    # never raw events (a spine-first left join would funnel each bin's
    # full row stream through one reducer)
    agg = pv.groupBy("bin").agg(
        F.sum(F.when(F.col("base"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("base"), 1).otherwise(0)).alias("n_b"),
    )
    counts = bins.join(agg, "bin", "left").select(
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.floor(
            (
                (F.col("n_a") + 1.0) / (F.col("ta") + 20)
                - (F.col("n_b") + 1.0) / (F.col("tb") + 20)
            )
            * F.log(
                ((F.col("n_a") + 1.0) * (F.col("tb") + 20))
                / ((F.col("n_b") + 1.0) * (F.col("ta") + 20))
            )
            * 1_000_000_000
        )
        .cast("long")
        .alias("term_q"),
    )
    return (
        terms.select(
            "bin",
            "n_a",
            "n_b",
            (F.col("term_q") / 1e9).alias("psi_term"),
            (F.sum("term_q").over(W.partitionBy()) / 1e9).alias("psi_total"),
        )
        .orderBy("bin")
    )


def _pagerank_iter_sql(iters: int) -> str:
    """Chained integer-PageRank CTEs pr0..pr{iters} over ``und``/``deg``
    (the loop unrolled — DuckDB replays exactly the per-round integer
    arithmetic of ``graph.pagerank_integer``)."""
    ctes = [
        """nv AS (SELECT count(*) AS n FROM deg),
    pbase AS (SELECT CAST((15 * (1000000000000 // n)) // 100 AS BIGINT) AS b FROM nv),
    pr0 AS (SELECT u, CAST(1000000000000 // n AS BIGINT) AS pr FROM deg CROSS JOIN nv)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pr{k} AS (
        SELECT e.v AS u, CAST(b.b + (85 * sum(p.pr // d.deg)) // 100 AS BIGINT) AS pr
        FROM und e JOIN pr{k - 1} p ON p.u = e.u JOIN deg d ON d.u = e.u
        CROSS JOIN pbase b
        GROUP BY e.v, b.b
    )"""
        )
    return ",\n    ".join(ctes)


@query(
    "xfo_graph_pagerank",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    und AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
    {_pagerank_iter_sql(5)}
    SELECT u AS doc_id, pr AS pr_q,
           row_number() OVER (ORDER BY pr DESC, u) AS rk
    FROM pr5
    QUALIFY rk <= 20
    ORDER BY rk
    """,
    "graph centrality over the near-dup graph: INTEGER-arithmetic "
    "PageRank (all state in integer mass units, every op integer "
    "mul/div/add — float PageRank can't be value-checked because "
    "incoming-contribution sums depend on aggregation order) ranks the "
    "HUB documents of boilerplate neighborhoods; 5 rounds, each one "
    "edge-join + map-side-combinable sum, checkpoint-truncated lineage; "
    "oracle replays the unrolled rounds as chained CTEs",
    ("dedup", "graph", "analytics"),
)
def xfo_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.graph import pagerank_integer

    t = _t(spark, sf_dir)
    pairs = dedup_ops.minhash_near_dup(
        t["documents"], shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    pr = pagerank_integer(pairs, "doc_a", "doc_b", iters=5)
    top = pr.orderBy(F.col("pr_q").desc(), F.col("vertex").asc()).limit(20)
    rk = F.row_number().over(W.orderBy(F.col("pr_q").desc(), F.col("vertex").asc()))
    return top.select(
        F.col("vertex").alias("doc_id"), "pr_q", rk.alias("rk")
    ).orderBy("rk")


@query(
    "x94_triangle_census",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    e AS (SELECT doc_a AS u, doc_b AS v FROM pairs),
    und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
    s AS (
        SELECT count(*) AS n_nodes,
               CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
               CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e ab JOIN e bc ON bc.u = ab.v JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    )
    SELECT s.n_nodes, s.n_edges, s.n_wedges, tri.n_triangles,
           CASE WHEN s.n_wedges = 0 THEN 0.0
                ELSE CAST(3 * tri.n_triangles * 1000000 // s.n_wedges AS BIGINT) / 1e6
           END AS global_cc
    FROM s, tri
    """,
    "triangle census of the near-dup graph (degree-ordered orientation, "
    "the O(m^1.5) compact-forward algorithm: orient each edge toward "
    "its higher-degree endpoint so wedge enumeration is bounded by "
    "sqrt(m) out-degrees, close wedges with one semi-join) — node/edge/"
    "wedge/triangle counts and the integer-quantized global clustering "
    "coefficient; triangles measure how clique-like duplicate clusters "
    "are, complementing PageRank hubs (x69) and CC clusters",
    ("dedup", "graph", "analytics"),
)
def x94_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import triangle_stats

    t = _t(spark, sf_dir)
    pairs = dedup_ops.minhash_near_dup(
        t["documents"], shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    return triangle_stats(pairs, "doc_a", "doc_b")


@query(
    "x70_pit_dimension_join",
    """
    WITH p AS (
        SELECT user_id, ts, value, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events
        WHERE event_type = 'purchase' AND user_id % 20 = 0
    ),
    d AS (SELECT user_id, ts, value FROM p WHERE rn = 1),
    dim AS (
        SELECT user_id, round(value, 2) AS dim_value,
               ts AS valid_from, lead(ts) OVER w AS valid_to
        FROM d
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click' AND user_id % 20 = 0
    )
    SELECT c.event_id AS click_id, c.user_id, m.dim_value, m.valid_from
    FROM clicks c
    JOIN dim m ON m.user_id = c.user_id
     AND c.ts >= m.valid_from
     AND (m.valid_to IS NULL OR c.ts < m.valid_to)
    ORDER BY click_id
    """,
    "point-in-time (AS OF) dimension join: facts joined to the SCD-2 "
    "validity interval in force at their event time (the x35 history "
    "build consumed downstream — how a warehouse resolves 'what was "
    "the dimension value WHEN this happened'). Equi-join on the "
    "dimension key with the interval predicate evaluated inside the "
    "co-partitioned rows: each fact matches exactly one interval, no "
    "row multiplication",
    ("cdc", "join", "events"),
)
def x70_pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"]
    p = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 20 == 0))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    w = W.partitionBy("user_id").orderBy("ts")
    dim = p.select(
        "user_id",
        F.round("value", 2).alias("dim_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    clicks = ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 20 == 0)
    ).select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
    return (
        clicks.join(
            dim,
            (clicks["user_id"] == dim["user_id"])
            & (F.col("c_ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("c_ts") < F.col("valid_to"))),
        )
        .select("click_id", clicks["user_id"].alias("user_id"), "dim_value", "valid_from")
        .orderBy("click_id")
    )


@query(
    "x71_percentile_length_gate",
    """
    WITH thr AS (
        SELECT lang, round(quantile_cont(n_chars, 0.10), 4) AS p10
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN d.n_chars > t.p10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           sum(CASE WHEN d.n_chars > t.p10 THEN 1 ELSE 0 END) * 1000000 // count(*) / 1e6 AS kept_frac,
           min(t.p10) AS p10
    FROM documents d JOIN thr t ON t.lang = d.lang
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    "percentile-threshold quality gate: drop each language's shortest "
    "10%% of documents — the threshold comes from the bounded-state "
    "exact-quantile operator (per-language p10), 4dp-quantized at the "
    "stage seam, broadcast back into the corpus scan; integer counts "
    "vs a quantized threshold, so membership is engine-exact. The "
    "per-stratum relative cut a fixed global length filter can't "
    "express",
    ("text", "quality", "pipeline"),
)
def x71_percentile_length_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantiles import exact_group_quantiles

    t = _t(spark, sf_dir)
    docs = t["documents"]
    thr = exact_group_quantiles(docs, ["lang"], "n_chars", [0.10]).select(
        "lang", F.round(F.col("quantiles")[0], 4).alias("p10")
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("n_chars") > F.col("p10"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            (
                F.expr(
                    "sum(CASE WHEN n_chars > p10 THEN 1 ELSE 0 END) * 1000000 div count(1)"
                )
                / 1e6
            ).alias("kept_frac"),
            F.min("p10").alias("p10"),
        )
        .orderBy("lang")
    )


@query(
    "x72_growth_accounting",
    """
    WITH f AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ),
    d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    daily AS (
        SELECT d.day,
               count(*) AS dau,
               CAST(sum(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END) AS BIGINT) AS new_users
        FROM d JOIN f USING (user_id)
        GROUP BY d.day
    )
    SELECT day, dau, new_users,
           dau - new_users AS returning_users,
           CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily ORDER BY day
    """,
    "growth accounting: daily active users split into new (first-seen "
    "that day) vs returning, plus cumulative acquired users — the "
    "product-analytics daily rollup. Two user-keyed aggs + one join; "
    "the cumulative window runs over one row PER DAY (bounded by the "
    "calendar, not the corpus), so the unpartitioned frame is safe at "
    "any scale",
    ("events", "analytics"),
)
def x72_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"]
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    d = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    daily = (
        d.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.sum(F.when(F.col("first_day") == F.col("day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
        )
    )
    return daily.select(
        "day",
        "dau",
        "new_users",
        (F.col("dau") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users")
        .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_users"),
    ).orderBy("day")


@query(
    "x73_ab_test_proportions",
    """
    WITH arms AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5('ab:' || user_id), 1, 15))::BIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               max(CASE WHEN event_type = 'purchase' AND value > 250 THEN 1 ELSE 0 END) AS converted
        FROM events
        GROUP BY user_id
    ),
    agg AS (
        SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        FROM arms
    )
    , zq AS (
        SELECT *,
               CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0
                    ELSE CAST(floor(abs(
                        ((conv_a * 1.0 / n_a) - (conv_b * 1.0 / n_b))
                        / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                               * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b))
                    ) * 1000000) AS BIGINT) END AS z_mag_q,
               CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN 0
                    ELSE CAST(sign((conv_a * 1.0 / n_a) - (conv_b * 1.0 / n_b)) AS BIGINT)
               END AS z_sign
        FROM agg
    )
    SELECT n_a, conv_a, n_b, conv_b,
           conv_a * 1000000 // n_a / 1e6 AS rate_a,
           conv_b * 1000000 // n_b / 1e6 AS rate_b,
           z_sign * z_mag_q / 1e6 AS z,
           z_mag_q > 1960000 AS significant
    FROM zq
    """,
    "A/B experiment readout: hash-decided arm assignment (deterministic "
    "— the same user always lands in the same arm), per-arm conversion "
    "counts as exact integers, two-sample pooled-proportion z-statistic "
    "computed from those integers (identical doubles on both engines — "
    "sqrt is IEEE-exact), quantized at 1e-6, significance as an INTEGER "
    "compare against 1.96e6. One user-keyed agg + one 4-counter "
    "combine; scan-speed at any corpus size",
    ("events", "analytics", "sampling"),
)
def x73_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    arm = F.when(
        F.pmod(dedup_ops.portable_hash(F.col("user_id"), F.lit("ab")), F.lit(2)) == 0, "A"
    ).otherwise("B")
    arms = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 250), 1
                ).otherwise(0)
            ).alias("converted")
        )
        .select(arm.alias("arm"), "converted")
    )
    agg = arms.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    p_pool = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z_raw = (
        (F.col("conv_a") * 1.0 / F.col("n_a")) - (F.col("conv_b") * 1.0 / F.col("n_b"))
    ) / F.sqrt(p_pool * (1 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    # degenerate pools (all or none converted) have an undefined z;
    # define 0 rather than divide by zero (ANSI mode raises). The
    # MAGNITUDE is quantized (floor(abs(z)*1e6)) with the sign carried
    # separately — flooring the signed value would move negative z
    # away from zero, making the significance cut asymmetric between
    # arms.
    degenerate = (F.col("conv_a") + F.col("conv_b") == 0) | (
        F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")
    )
    z_mag_q = (
        F.when(degenerate, F.lit(0)).otherwise(F.floor(F.abs(z_raw) * 1_000_000)).cast("long")
    )
    z_sign = F.when(degenerate, F.lit(0)).otherwise(F.signum(z_raw)).cast("long")
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        (F.expr("conv_a * 1000000 div n_a") / 1e6).alias("rate_a"),
        (F.expr("conv_b * 1000000 div n_b") / 1e6).alias("rate_b"),
        (z_sign * z_mag_q / 1e6).alias("z"),
        (z_mag_q > 1_960_000).alias("significant"),
    )


@query(
    "x74_mm_phash_near_dup",
    """
    WITH sized AS (
        SELECT doc_id, text, length(text) AS n,
               (length(text) + 59) // 60 AS stride
        FROM documents
        WHERE length(text) > 0
    ),
    samples AS (
        SELECT doc_id, js.j,
               ascii(substr(text, ((js.j * stride) % n) + 1, 1)) AS c
        FROM sized CROSS JOIN (SELECT unnest(range(60)) AS j) js
    ),
    stats AS (SELECT doc_id, sum(c) AS s FROM samples GROUP BY doc_id),
    fps AS (
        SELECT sa.doc_id,
               CAST(sum(CASE WHEN sa.c * 60 > st.s THEN (1::BIGINT << sa.j) ELSE 0 END) AS BIGINT) AS ahash
        FROM samples sa JOIN stats st USING (doc_id)
        GROUP BY sa.doc_id
    ),
    bands AS (
        SELECT doc_id, ahash, bs.b AS band, (ahash >> (bs.b * 15)) & 32767 AS val
        FROM fps CROSS JOIN (SELECT unnest(range(4)) AS b) bs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.ahash AS sa, b2.doc_id AS doc_b, b2.ahash AS sb
        FROM bands a
        JOIN bands b2 ON a.band = b2.band AND a.val = b2.val AND a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INTEGER AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 3
    ORDER BY doc_a, doc_b
    """,
    "multimodal asset near-dup via PERCEPTUAL hash: 60-bit aHash per "
    "binary asset computed in the Arrow-batched mapInPandas kernel "
    "(evenly-strided sample bytes, integer-cross-multiplied mean "
    "threshold — a real deployment hashes the decoded luma plane with "
    "identical packing), then the SAME banded-hamming equi-join as the "
    "SimHash text path (pigeonhole: hamming<=3 agrees on one of 4 "
    "15-bit bands). The oracle replays the kernel in SQL over the "
    "synthetic ASCII payloads (byte == codepoint), so the whole "
    "Python-kernel path is value-checked",
    ("multimodal", "dedup"),
)
def x74_mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    assets = mm_ops.attach_binary_assets(t["documents"].filter(F.length("text") > 0))
    return (
        mm_ops.ahash_near_dup(assets, "asset", "doc_id", max_hamming=3)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "x75_recursive_hierarchy",
    """
    WITH RECURSIVE nodes AS (SELECT DISTINCT user_id AS u FROM events),
    tree(u, root, depth) AS (
        SELECT u, u, 0 FROM nodes WHERE u < 2
        UNION ALL
        SELECT n.u, t.root, t.depth + 1
        FROM nodes n JOIN tree t ON t.u = n.u // 2
        WHERE n.u >= 2
    )
    SELECT depth, count(*) AS n_nodes, min(u) AS min_id, max(u) AS max_id,
           CAST(sum(u) AS BIGINT) AS sum_ids
    FROM tree GROUP BY depth ORDER BY depth
    """,
    "Recursive hierarchy traversal (org chart / BOM expansion — the "
    "WITH RECURSIVE shape): a synthetic binary hierarchy over the "
    "event users (parent = id div 2) walked root-down by "
    "graph.tree_descend — a BOUNDED checkpointed-frontier loop whose "
    "round count is the closed-form depth bound floor(log2(max_id)) "
    "(a halving parent key), zero convergence probes; per-depth "
    "rollup with an id checksum. Oracle = the equivalent WITH "
    "RECURSIVE in DuckDB. Spark 4's own recursive CTE computes the "
    "identical result but its UnionLoop re-plans every level (66 jobs "
    "/ 4.1 s at sf0.1 vs 31 / 2.6 s for this loop, measured "
    "interleaved r9) — the engine surface stays pinned by "
    "test_graph.py::test_spark_recursive_cte_matches_tree_descend",
    ("sql", "graph"),
)
def x75_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from .operators.graph import tree_descend
    from .session import track_cache

    t = _t(spark, sf_dir)
    nodes = track_cache(t["events"].select(F.col("user_id").alias("u")).distinct())
    # parent = u div 2 halves the id every level, so depth(u) <=
    # floor(log2(max_id)) — ONE tiny agg job buys an exact loop bound
    # and deletes every per-round convergence probe
    max_id = nodes.agg(F.max("u")).first()[0]
    rounds = int(math.floor(math.log2(max_id))) if max_id is not None and max_id >= 2 else 0
    tree = tree_descend(
        nodes.filter(F.col("u") >= 2).select("u", F.expr("u div 2").alias("p")),
        nodes.filter(F.col("u") < 2).select("u", F.col("u").alias("root")),
        child="u",
        parent="p",
        node="u",
        max_depth=rounds,
    )
    return (
        tree.groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("u").alias("min_id"),
            F.max("u").alias("max_id"),
            F.sum("u").cast("long").alias("sum_ids"),
        )
        .orderBy("depth")
    )


def _morton_sql(u: str, d: str, shift_op: bool) -> str:
    """16-bit × 16-bit Morton interleave as a sum of bit extracts —
    pure integer ops, identical value on both engines. ``shift_op``
    picks the dialect: DuckDB's ``<<``/``>>`` operators vs Spark SQL's
    ``shiftleft``/``shiftright`` functions."""
    terms = []
    for j in range(16):
        if shift_op:
            terms.append(f"((({u} >> {j}) & 1) << {2 * j + 1})")
            terms.append(f"((({d} >> {j}) & 1) << {2 * j})")
        else:
            terms.append(f"shiftleft(shiftright({u}, {j}) & 1, {2 * j + 1})")
            terms.append(f"shiftleft(shiftright({d}, {j}) & 1, {2 * j})")
    return " + ".join(terms)


@query(
    "x76_zorder_layout",
    f"""
    WITH pts AS (
        SELECT user_id & 65535 AS u, day(ts) AS d
        FROM events
    ),
    coded AS (
        SELECT u, d, ({_morton_sql('u', 'd', True)}) AS morton
        FROM pts
    )
    SELECT morton // 64 AS bucket,
           count(*) AS n,
           min(u) AS min_u, max(u) AS max_u,
           min(d) AS min_d, max(d) AS max_d
    FROM coded
    GROUP BY morton // 64
    ORDER BY bucket
    """,
    "Z-ORDER (Morton-code) layout clustering: interleave the bits of "
    "(user_id, day) so sorting by one integer key co-locates rows that "
    "are close in BOTH dimensions — the data-layout trick behind "
    "multi-dimensional file pruning (Delta/Iceberg OPTIMIZE ZORDER): a "
    "scan filtered on either dimension touches few Morton buckets. "
    "Pure integer bit arithmetic (engine-exact); the per-bucket min/max "
    "spans ARE the file-skipping statistics a writer would persist",
    ("layout", "events"),
)
def x76_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    pts = t["events"].select(
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("u"),
        F.dayofmonth("ts").alias("d"),
    )
    coded = pts.select("u", "d", F.expr(_morton_sql("u", "d", False)).alias("morton"))
    return (
        coded.groupBy(F.expr("morton div 64").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("u").alias("min_u"),
            F.max("u").alias("max_u"),
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
        )
        .orderBy("bucket")
    )


@query(
    "x77_last_touch_attribution",
    """
    WITH touches0 AS (
        SELECT user_id, ts, event_type AS channel, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('click', 'view')
    ),
    touches AS (SELECT user_id, ts, channel FROM touches0 WHERE rn = 1),
    attributed AS (
        SELECT p.event_id, p.value,
               coalesce(
                   (SELECT t.channel FROM touches t
                    WHERE t.user_id = p.user_id
                      AND t.ts <= p.ts
                      AND t.ts >= p.ts - INTERVAL 24 HOUR
                    ORDER BY t.ts DESC LIMIT 1),
                   'direct') AS channel
        FROM events p WHERE p.event_type = 'purchase'
    )
    SELECT channel, count(*) AS n_conversions, round(sum(value), 2) AS revenue
    FROM attributed GROUP BY channel ORDER BY channel
    """,
    "LAST-TOUCH marketing attribution: each purchase credited to the "
    "user's most recent click/view within a 24h lookback (unattributed "
    "-> 'direct'), rolled up to channel conversions + revenue. The "
    "as-of union-window operator does the heavy lifting — one shuffle "
    "on user_id, no correlated per-row probing (the oracle's LIMIT-1 "
    "subquery is the semantics statement, not the plan)",
    ("events", "analytics", "asof"),
)
def x77_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"]
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("event_type").alias("channel"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_ops.asof_join(
        purchases,
        touches,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["channel"],
        direction="backward",
        tolerance_seconds=86400,
    )
    return (
        j.select(F.coalesce("channel_asof", F.lit("direct")).alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@query(
    "x78_weighted_sample_topk",
    """
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5('es:' || doc_id), 1, 15))::BIGINT % 1000000 AS b
        FROM documents
        WHERE n_chars > 0
    ),
    scored AS (
        SELECT doc_id, lang, n_chars,
               CAST(floor(ln((b + 1) / 1000000.0) / n_chars * 1000000000) AS BIGINT) AS key_q
        FROM keyed
    )
    SELECT lang, doc_id, n_chars, key_q,
           row_number() OVER (PARTITION BY lang ORDER BY key_q DESC, doc_id) AS rk
    FROM scored
    QUALIFY rk <= 10
    ORDER BY lang, rk
    """,
    "WEIGHTED sampling without replacement (Efraimidis-Spirakis A-ES): "
    "per-item key ln(u)/w with u hash-decided (not RNG — the sample is "
    "reproducible across engines/retries and stable per item), top-10 "
    "per language by key = a w-weighted uniform draw without "
    "replacement; the reservoir-sampling primitive behind quality-"
    "weighted corpus subsetting. Key quantized at 1e-9 from identical "
    "integer inputs; one window per stratum",
    ("sampling", "pipeline"),
)
def x78_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    b = F.pmod(dedup_ops.portable_hash(F.col("doc_id"), F.lit("es")), F.lit(1_000_000))
    scored = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.floor(F.log((b + 1) / 1000000.0) / F.col("n_chars") * 1_000_000_000)
            .cast("long")
            .alias("key_q"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("key_q").desc(), F.col("doc_id").asc())
    )
    return (
        scored.select("lang", "doc_id", "n_chars", "key_q", rk.alias("rk"))
        .filter(F.col("rk") <= 10)
        .orderBy("lang", "rk")
    )


@query(
    "x79_flow_static_enrich",
    """
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_purchases,
           round(sum(p.value), 2) AS revenue
    FROM events p JOIN customer c ON c.c_custkey = p.user_id
    WHERE p.event_type = 'purchase'
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
    "STREAM-STATIC enrichment join (the third streaming join shape "
    "after stream-stream inner and left-outer): the purchase stream "
    "joined against the static customer dimension — broadcast per "
    "micro-batch, NO join state kept (only the aggregation holds "
    "state), which is why stream-static is the preferred enrichment "
    "pattern at scale — then a complete-mode segment rollup; the batch "
    "oracle is the time-complete result",
    ("streaming", "join"),
)
def x79_flow_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import load_table

    ev = stream_ops._events_stream(spark, sf_dir)
    clone = stream_ops._stream_session(spark)
    dim = load_table(clone, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )
    out = stream_ops.run_stream_to_table(
        enriched, "stream_static_enrich", output_mode="complete"
    )
    return out.orderBy("segment")


@query(
    "x80_pmi_cooccurrence",
    r"""
    WITH words AS (
        SELECT DISTINCT doc_id, w AS word
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
        WHERE w <> ''
    ),
    vocab AS (
        SELECT word, count(*) AS c_w,
               row_number() OVER (ORDER BY count(*) DESC, word) AS vrk
        FROM words GROUP BY word
        QUALIFY vrk <= 20
    ),
    inc AS (SELECT w.doc_id, w.word, v.c_w FROM words w JOIN vocab v USING (word)),
    nd AS (SELECT count(*) AS n FROM documents),
    pairs AS (
        SELECT a.word AS word_a, b.word AS word_b,
               min(a.c_w) AS c_a, min(b.c_w) AS c_b, count(*) AS c_ab
        FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.word < b.word
        GROUP BY a.word, b.word
    )
    SELECT word_a, word_b, c_a, c_b, c_ab,
           CAST(floor(ln((c_ab * n * 1.0) / (c_a * c_b)) * 1000000) AS BIGINT) / 1e6 AS pmi,
           row_number() OVER (
               ORDER BY CAST(floor(ln((c_ab * n * 1.0) / (c_a * c_b)) * 1000000) AS BIGINT) DESC,
                        word_a, word_b
           ) AS rk
    FROM pairs CROSS JOIN nd
    QUALIFY rk <= 15
    ORDER BY rk
    """,
    "word CO-OCCURRENCE statistics (pointwise mutual information) over "
    "the corpus head: document-level incidence restricted to the top-20 "
    "vocabulary (broadcast — caps the within-doc pair explosion at "
    "C(20,2) per doc regardless of corpus size), doc-frequency and "
    "co-occurrence counts as exact integers, PMI = ln(N*c_ab/(c_a*c_b)) "
    "quantized at 1e-6 from identical integer ratios; top-15 "
    "associations. The collocation/topic-signal pass of a corpus "
    "analysis pipeline",
    ("text", "analytics"),
)
def x80_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    docs = t["documents"]
    words = (
        docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .dropDuplicates(["doc_id", "word"])
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .withColumn(
            "vrk",
            F.row_number().over(W.orderBy(F.col("c_w").desc(), F.col("word").asc())),
        )
        .filter(F.col("vrk") <= 20)
        .select("word", "c_w")
    )
    inc = words.join(F.broadcast(vocab), "word")
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    a = inc.select("doc_id", F.col("word").alias("word_a"), F.col("c_w").alias("ca"))
    b = inc.select("doc_id", F.col("word").alias("word_b"), F.col("c_w").alias("cb"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.min("ca").alias("c_a"), F.min("cb").alias("c_b"), F.count(F.lit(1)).alias("c_ab"))
    )
    pmi_q = F.floor(
        F.log((F.col("c_ab") * F.col("n") * 1.0) / (F.col("c_a") * F.col("c_b"))) * 1_000_000
    ).cast("long")
    scored = pairs.crossJoin(F.broadcast(nd)).select(
        "word_a", "word_b", "c_a", "c_b", "c_ab", pmi_q.alias("__q")
    )
    top = scored.orderBy(F.col("__q").desc(), "word_a", "word_b").limit(15)
    rk = F.row_number().over(W.orderBy(F.col("__q").desc(), "word_a", "word_b"))
    return top.select(
        "word_a", "word_b", "c_a", "c_b", "c_ab", (F.col("__q") / 1e6).alias("pmi"), rk.alias("rk")
    ).orderBy("rk")


@query(
    "x81_conversion_latency",
    """
    WITH clicks AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    conv AS (
        SELECT c.user_id, c.ts AS c_ts,
               (SELECT min(p.ts) FROM events p
                WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                  AND p.ts > c.ts) AS p_ts
        FROM clicks c
    ),
    lat AS (
        -- exact microsecond diff / 1e6 on BOTH engines: date_diff('second')
        -- counts boundary crossings in DuckDB but floor-truncates in Spark
        SELECT user_id % 5 AS cohort,
               date_diff('microsecond', c_ts, p_ts) / 1e6 AS sec
        FROM conv WHERE p_ts IS NOT NULL
    )
    SELECT cohort,
           count(*) AS n_conversions,
           round(median(sec), 4) AS p50_sec,
           round(quantile_cont(sec, 0.90), 4) AS p90_sec
    FROM lat GROUP BY cohort ORDER BY cohort
    """,
    "conversion LATENCY distribution: click -> next purchase gap in "
    "seconds per user cohort, p50/p90 via the bounded-state exact "
    "quantile operator (third consumer after q11/x67) — the ops metric "
    "a funnel count can't express. The next-purchase lookup is the "
    "as-of union-window shape (one shuffle on user_id), not a "
    "correlated probe; quantiles 4dp-seam-rounded",
    ("events", "analytics", "quality"),
)
def x81_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantiles import exact_group_quantiles

    t = _t(spark, sf_dir)
    ev = t["events"]
    # forward as-of via the union-window operator (one shuffle on
    # user_id — never a per-user clicks x purchases product); the
    # strictly-after semantics come from probing at ts + 1 microsecond,
    # since forward as-of includes ties
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("ts") + F.expr("INTERVAL 1 MICROSECOND")).alias("probe_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    ).dropDuplicates(["user_id", "ts"])
    nxt = asof_ops.asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="probe_ts",
        right_ts="ts",
        direction="forward",
    ).filter(F.col("ts_asof").isNotNull())
    from .session import track_cache

    # cached: the as-of subtree feeds BOTH the quantile pass and the
    # count aggregation below
    lat = track_cache(
        nxt.select(
            F.pmod(F.col("user_id"), F.lit(5)).alias("cohort"),
            (F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("ts_asof")) / 1e6).alias("sec"),
        )
    )
    q = exact_group_quantiles(lat, ["cohort"], "sec", [0.5, 0.90])
    n = lat.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_conversions"))
    return (
        n.join(q, "cohort")
        .select(
            "cohort",
            "n_conversions",
            F.round(F.col("quantiles")[0], 4).alias("p50_sec"),
            F.round(F.col("quantiles")[1], 4).alias("p90_sec"),
        )
        .orderBy("cohort")
    )


@query(
    "x82_session_bounce",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ),
    per_session AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) / 1e6 AS bounce_rate,
           CAST(max(n_events) AS BIGINT) AS longest_session
    FROM per_session
    """,
    "session BOUNCE rate: gaps-and-islands sessionization (30-min "
    "inactivity boundary, deterministic event_id tie-break) -> "
    "single-event-session fraction as an integer-quantized ratio — the "
    "engagement metric on top of the same sessionization xf4_flow_sessions "
    "verifies against streaming session_window; two windows + one agg, "
    "all partitioned by user",
    ("events", "analytics"),
)
def x82_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = t["events"].select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("__prev")
    )
    new_s = F.when(
        F.col("__prev").isNull()
        | (F.timestamp_diff("MICROSECOND", F.col("__prev"), F.col("ts")) > 1_800_000_000),
        1,
    ).otherwise(0)
    sessions = marked.select(
        "user_id",
        "ts",
        F.sum(new_s)
        .over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("session_id"),
    )
    per = sessions.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("long").alias("n_bounces"),
        (
            F.expr("sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 div count(1)") / 1e6
        ).alias("bounce_rate"),
        F.max("n_events").alias("longest_session"),
    )


@query(
    "x83_referential_audit",
    """
    SELECT 'lineitem_without_order' AS check_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'order_without_customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer_without_nation',
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier_without_nation',
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
    ORDER BY check_name
    """,
    "referential-integrity AUDIT across the star schema: orphan counts "
    "for each foreign-key edge via LEFT ANTI joins (the data-quality "
    "gate a warehouse load runs post-ingest); each check is one "
    "broadcast-or-shuffle anti-join, zero row multiplication, results "
    "tagged and unioned into one report",
    ("quality", "join"),
)
def x83_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    def orphans(name, left, lk, right, rk):
        return (
            left.join(right.select(F.col(rk).alias(lk)), lk, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("check_name"), "n_orphans")
        )

    checks = [
        orphans("lineitem_without_order", t["lineitem"].select("l_orderkey"), "l_orderkey", t["orders"], "o_orderkey"),
        orphans("order_without_customer", t["orders"].select("o_custkey"), "o_custkey", t["customer"], "c_custkey"),
        orphans("customer_without_nation", t["customer"].select("c_nationkey"), "c_nationkey", t["nation"], "n_nationkey"),
        orphans("supplier_without_nation", t["supplier"].select("s_nationkey"), "s_nationkey", t["nation"], "n_nationkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


@query(
    "x84_metric_correlation",
    """
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM per_user
    )
    SELECT n, sx, sy,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN 0
                ELSE CAST(floor(
                    (n * sxy - sx * sy) * 1.0
                    / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
                    * 1000000
                ) AS BIGINT) END / 1e6 AS pearson_r
    FROM s
    """,
    "metric CORRELATION (Pearson r between per-user click and purchase "
    "counts) from EXACT integer moment sums — corr() aggregates float "
    "partial states in nondeterministic order and can't be hash-"
    "compared; the five integer moments are order-independent, the "
    "final r is one double expression over identical integers on both "
    "engines, 1e-6-quantized, degenerate variance guarded to 0. Two "
    "map-side-combinable aggs total",
    ("events", "analytics"),
)
def x84_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    per_user = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r_q = F.when((vx == 0) | (vy == 0), F.lit(0)).otherwise(
        F.floor(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * 1.0
            / F.sqrt(vx * 1.0 * vy)
            * 1_000_000
        )
    ).cast("long")
    return s.select("n", "sx", "sy", (r_q / 1e6).alias("pearson_r"))


@query(
    "x85_journey_paths",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ordered WHERE rn <= 5
        GROUP BY user_id
    )
    SELECT path, count(*) AS n_users,
           row_number() OVER (ORDER BY count(*) DESC, path) AS rk
    FROM paths
    GROUP BY path
    QUALIFY rk <= 10
    ORDER BY rk
    """,
    "user JOURNEY paths (product analytics): each user's first five "
    "events in time order compressed to a path string, top-10 most "
    "common journeys — the behavioral-funnel exploration query. One "
    "user-partitioned window (rn <= 5 prunes early), ordered "
    "string_agg == collect_list sorted by position, TakeOrdered top-k",
    ("events", "analytics"),
)
def x85_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ordered = t["events"].select(
        "user_id",
        "event_type",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    ).filter(F.col("rn") <= 5)
    paths = ordered.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("rn", "event_type")))["event_type"],
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    top = counts.orderBy(F.col("n_users").desc(), F.col("path").asc()).limit(10)
    rk = F.row_number().over(W.orderBy(F.col("n_users").desc(), F.col("path").asc()))
    return top.select("path", "n_users", rk.alias("rk")).orderBy("rk")


@query(
    "x86_embed_dim_stats",
    """
    WITH vals AS (
        -- CAST to DOUBLE first: DuckDB would otherwise multiply in
        -- single precision (FLOAT * INT -> FLOAT) where Spark promotes
        -- to double, flooring to different integers on some values
        SELECT u.dim - 1 AS dim,
               CAST(floor(CAST(u.v AS DOUBLE) * 1000000) AS BIGINT) AS vq
        FROM (
            SELECT unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ) u
    )
    SELECT dim,
           count(*) AS n,
           CAST(sum(vq) AS BIGINT) AS sum_q,
           CAST(sum(vq) // count(*) AS BIGINT) / 1e6 AS mean,
           min(vq) / 1e6 AS min_v,
           max(vq) / 1e6 AS max_v
    FROM vals GROUP BY dim ORDER BY dim
    """,
    "per-DIMENSION embedding statistics (the whitening/standardization "
    "pre-pass a vector pipeline runs before PQ or PCA): each float32 "
    "component integer-quantized at 1e-6 AT THE SOURCE so the per-dim "
    "sums are exact and order-independent (a float mean() would differ "
    "by engine summation order); mean via integer division, min/max "
    "exact. One posexplode + one map-side-combinable agg over 64 "
    "fixed-dimension keys",
    ("similarity", "quality"),
)
def x86_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    vals = t["embeddings"].select(
        F.posexplode("embedding").alias("dim", "v")
    ).select("dim", F.floor(F.col("v").cast("double") * 1_000_000).cast("long").alias("vq"))
    return (
        vals.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vq").alias("sum_q"),
            F.expr("CAST(sum(vq) div count(1) AS BIGINT)").alias("__m"),
            F.min("vq").alias("__mn"),
            F.max("vq").alias("__mx"),
        )
        .select(
            "dim",
            "n",
            "sum_q",
            (F.col("__m") / 1e6).alias("mean"),
            (F.col("__mn") / 1e6).alias("min_v"),
            (F.col("__mx") / 1e6).alias("max_v"),
        )
        .orderBy("dim")
    )


@query(
    "x87_behavior_entropy",
    """
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    totals AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY user_id),
    terms AS (
        SELECT c.user_id,
               CAST(floor((c.c * 1.0 / t.n) * ln(t.n * 1.0 / c.c) * 1000000000) AS BIGINT) AS term_q
        FROM counts c JOIN totals t USING (user_id)
    )
    SELECT user_id,
           CAST(sum(term_q) AS BIGINT) / 1e9 AS entropy_nats,
           CAST((SELECT n FROM totals t WHERE t.user_id = terms.user_id) AS BIGINT) AS n_events
    FROM terms
    GROUP BY user_id
    ORDER BY user_id
    """,
    "behavioral diversity: Shannon entropy of each user's event-type "
    "distribution — p ln(1/p) computed per (user, type) from exact "
    "integer counts and quantized at 1e-9 BEFORE the cross-type sum "
    "(at most 5 terms, but their float-sum order still differs per "
    "engine), so the per-user total is exact integer addition. The "
    "bot-vs-human behavioral signal; one map-side-combinable agg, a "
    "user-keyed window sum for the totals (r12: the former totals "
    "self-join sat on an AQE broadcast threshold and flipped 6/7 jobs "
    "run-to-run — the window plan is deterministic and one exchange "
    "cheaper; same-keyed groupBy after it is exchange-free)",
    ("events", "analytics", "quality"),
)
def x87_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    counts = t["events"].groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    # r12: per-user totals as a window sum instead of a totals
    # self-join — the join's broadcast decision flipped with AQE's
    # runtime size estimate (6 vs 7 jobs across passes in ONE session,
    # the lone r11 plan_stable delta); the window form is deterministic,
    # drops the join exchanges, and the same-keyed groupBy after it is
    # exchange-free (CLAUDE.md r7 totals-self-join rule)
    terms = counts.select(
        "user_id",
        F.sum("c").over(W.partitionBy("user_id")).cast("long").alias("n"),
        "c",
    ).select(
        "user_id",
        "n",
        F.floor(
            (F.col("c") * 1.0 / F.col("n"))
            * F.log(F.col("n") * 1.0 / F.col("c"))
            * 1_000_000_000
        )
        .cast("long")
        .alias("term_q"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            (F.sum("term_q") / 1e9).alias("entropy_nats"),
            F.min("n").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "x88_dedup_report",
    f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT reach.u, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    labels AS (SELECT u, least(u, min(r)) AS cluster_id FROM reach GROUP BY u),
    csize AS (SELECT cluster_id, count(*) AS sz FROM labels GROUP BY cluster_id),
    nd AS (SELECT count(*) AS n_docs FROM documents)
    SELECT sz AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(sz - 1) AS BIGINT) AS docs_removed,
           CAST(sum(sz - 1) * 1000000 // min(nd.n_docs) AS BIGINT) / 1e6 AS removal_rate
    FROM csize CROSS JOIN nd
    GROUP BY sz
    ORDER BY cluster_size
    """,
    "dedup REPORT (the QA summary a dedup run ships): near-dup cluster "
    "SIZE distribution + per-size docs-removed counts + integer-"
    "quantized corpus removal rate — the number a data lead reads "
    "before approving a dedup config. Reuses the full LSH -> frontier-"
    "CC pipeline; the report itself is two bounded aggs over one row "
    "per cluster",
    ("dedup", "quality", "graph"),
)
def x88_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import connected_components

    t = _t(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup_ops.minhash_near_dup(
        docs, shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    cc = connected_components(pairs, "doc_a", "doc_b")
    csize = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        csize.crossJoin(F.broadcast(nd))
        .groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(F.col("sz") - 1).alias("docs_removed"),
            (F.expr("sum(sz - 1) * 1000000 div min(n_docs)") / 1e6).alias("removal_rate"),
        )
        .orderBy("cluster_size")
    )


@query(
    "x89_dedup_threshold_sweep",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    ver AS (
        SELECT round(i.c / (sa.n + sb.n - i.c), 6) AS j
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
    )
    SELECT count(*) AS n_candidates,
           CAST(sum(CASE WHEN j >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_070,
           CAST(sum(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_080,
           CAST(sum(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_090,
           CAST(sum(CASE WHEN j >= 0.999999 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
    FROM ver
    """,
    "dedup threshold SENSITIVITY sweep (config tuning): exact Jaccard "
    "computed ONCE for every LSH candidate pair, then pair counts at "
    "thresholds 0.7/0.8/0.9/exact as conditional aggregates — the "
    "one-pass table a data lead reads before choosing a dedup cutoff "
    "(x88 reports the consequences of the chosen one). Same bucketed "
    "candidate pipeline; the sweep itself adds zero extra passes",
    ("dedup", "quality"),
)
def x89_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    sh = track_cache(dedup_ops.hashed_shingles(t["documents"], "text", "doc_id", 3))
    sig = dedup_ops.minhash_signatures(sh, 16, prehashed=True)
    bands = track_cache(dedup_ops.lsh_bands(sig, 2))
    cand = dedup_ops.lsh_candidate_pairs(bands)
    jac = dedup_ops.jaccard(sh, cand)
    return jac.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("jaccard") >= 0.7, 1).otherwise(0)).cast("long").alias("n_at_070"),
        F.sum(F.when(F.col("jaccard") >= 0.8, 1).otherwise(0)).cast("long").alias("n_at_080"),
        F.sum(F.when(F.col("jaccard") >= 0.9, 1).otherwise(0)).cast("long").alias("n_at_090"),
        F.sum(F.when(F.col("jaccard") >= 0.999999, 1).otherwise(0)).cast("long").alias("n_exact"),
    )


def _ivfpq_det_oracle_sql() -> str:
    """DuckDB mirror of the deterministic integer IVF-PQ spec (see
    operators/similarity.ivfpq_det_recall): dim-level CTEs, every CTE
    MATERIALIZED (the kcore lesson -- multiply-consumed CTEs otherwise
    inline into exponential subtree copies). All divisions are BIGINT
    // BIGINT (truncating, like Spark div -- engine-pair pinned);
    md5-hex ordering is plain lexicographic on both engines."""
    d2q = (
        "list_sum(list_transform(range(1, 65),"
        " i -> (eq.v[i]-ec.v[i])*(eq.v[i]-ec.v[i])))"
    )
    return f"""
    WITH ev AS MATERIALIZED (
        SELECT vec_id AS id, label,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings
    ),
    dims AS MATERIALIZED (
        SELECT id, label, u.d, u.x FROM (
            SELECT id, label, unnest(v) AS x,
                   generate_subscripts(v, 1) AS d
            FROM ev
        ) u
    ),
    cent AS MATERIALIZED (
        SELECT label AS cell, d,
               CAST(CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT)
                    AS BIGINT) AS c
        FROM dims WHERE id >= 5 GROUP BY label, d
    ),
    ark AS MATERIALIZED (
        SELECT id, cell,
               row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rk
        FROM (
            SELECT dm.id, ct.cell,
                   CAST(sum((dm.x - ct.c) * (dm.x - ct.c)) AS BIGINT) AS d2
            FROM dims dm JOIN cent ct ON ct.d = dm.d
            GROUP BY dm.id, ct.cell
        )
    ),
    assigned AS MATERIALIZED (
        SELECT id, cell FROM ark WHERE rk = 1 AND id >= 5
    ),
    probes AS MATERIALIZED (
        SELECT id AS q_id, cell FROM ark WHERE rk <= 2 AND id < 5
    ),
    resid AS MATERIALIZED (
        SELECT dm.id, a.cell,
               CAST((dm.d - 1) // 16 AS INT) AS s,
               CAST((dm.d - 1) % 16 + 1 AS INT) AS dd,
               dm.x - ct.c AS r
        FROM dims dm
        JOIN assigned a ON a.id = dm.id
        JOIN cent ct ON ct.cell = a.cell AND ct.d = dm.d
    ),
    seeds AS MATERIALIZED (
        SELECT id,
               row_number() OVER (
                   ORDER BY md5('pq:' || CAST(id AS VARCHAR)), id) AS j
        FROM ev WHERE id >= 5
        QUALIFY j <= 16
    ),
    init AS MATERIALIZED (
        SELECT r.s, sd.j, r.dd, r.r AS c0
        FROM seeds sd JOIN resid r ON r.id = sd.id
    ),
    j0 AS MATERIALIZED (
        SELECT id, s, j FROM (
            SELECT id, s, j,
                   row_number() OVER (PARTITION BY id, s ORDER BY d2, j) AS rk
            FROM (
                SELECT r.id, r.s, i.j,
                       CAST(sum((r.r - i.c0) * (r.r - i.c0)) AS BIGINT) AS d2
                FROM resid r JOIN init i ON i.s = r.s AND i.dd = r.dd
                GROUP BY r.id, r.s, i.j
            )
        ) WHERE rk = 1
    ),
    upd AS MATERIALIZED (
        SELECT r.s, j0.j, r.dd,
               CAST(CAST(sum(r.r) AS BIGINT) // CAST(count(*) AS BIGINT)
                    AS BIGINT) AS cu
        FROM resid r JOIN j0 ON j0.id = r.id AND j0.s = r.s
        GROUP BY r.s, j0.j, r.dd
    ),
    cw AS MATERIALIZED (
        SELECT i.s, i.j, i.dd, CAST(COALESCE(u.cu, i.c0) AS BIGINT) AS cw
        FROM init i
        LEFT JOIN upd u ON u.s = i.s AND u.j = i.j AND u.dd = i.dd
    ),
    enc AS MATERIALIZED (
        SELECT id, s, j AS code FROM (
            SELECT id, s, j,
                   row_number() OVER (PARTITION BY id, s ORDER BY d2, j) AS rk
            FROM (
                SELECT r.id, r.s, c.j,
                       CAST(sum((r.r - c.cw) * (r.r - c.cw)) AS BIGINT) AS d2
                FROM resid r JOIN cw c ON c.s = r.s AND c.dd = r.dd
                GROUP BY r.id, r.s, c.j
            )
        ) WHERE rk = 1
    ),
    lut AS MATERIALIZED (
        SELECT q.q_id, q.cell, q.s, c.j,
               CAST(sum((q.qr - c.cw) * (q.qr - c.cw)) AS BIGINT) AS lv
        FROM (
            SELECT p.q_id, p.cell,
                   CAST((dm.d - 1) // 16 AS INT) AS s,
                   CAST((dm.d - 1) % 16 + 1 AS INT) AS dd,
                   dm.x - ct.c AS qr
            FROM probes p
            JOIN dims dm ON dm.id = p.q_id
            JOIN cent ct ON ct.cell = p.cell AND ct.d = dm.d
        ) q JOIN cw c ON c.s = q.s AND c.dd = q.dd
        GROUP BY q.q_id, q.cell, q.s, c.j
    ),
    adc AS MATERIALIZED (
        SELECT l.q_id, e.id, CAST(sum(l.lv) AS BIGINT) AS adc
        FROM enc e
        JOIN assigned a ON a.id = e.id
        JOIN lut l ON l.cell = a.cell AND l.s = e.s AND l.j = e.code
        GROUP BY l.q_id, e.id
    ),
    short AS MATERIALIZED (
        SELECT q_id, id FROM (
            SELECT q_id, id,
                   row_number() OVER (PARTITION BY q_id ORDER BY adc, id) AS rk
            FROM adc
        ) WHERE rk <= 20
    ),
    exact_short AS MATERIALIZED (
        SELECT q_id, w FROM (
            SELECT sh.q_id, ec.id AS w,
                   row_number() OVER (PARTITION BY sh.q_id
                       ORDER BY {d2q}, ec.id) AS rk
            FROM short sh
            JOIN ev eq ON eq.id = sh.q_id
            JOIN ev ec ON ec.id = sh.id
        ) WHERE rk <= 10
    ),
    truth AS MATERIALIZED (
        SELECT u, w FROM (
            SELECT eq.id AS u, ec.id AS w,
                   row_number() OVER (PARTITION BY eq.id
                       ORDER BY {d2q}, ec.id) AS rk
            FROM ev eq JOIN ev ec ON eq.id < 5 AND ec.id >= 5
        ) WHERE rk <= 10
    ),
    hits AS (
        SELECT t.u AS q_id, CAST(count(*) AS BIGINT) AS h
        FROM truth t
        JOIN exact_short x ON x.q_id = t.u AND x.w = t.w
        GROUP BY t.u
    ),
    sizes AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS n
        FROM assigned GROUP BY cell
    ),
    scanned AS (
        SELECT p.q_id, CAST(sum(z.n) AS BIGINT) AS ns
        FROM probes p JOIN sizes z ON z.cell = p.cell GROUP BY p.q_id
    ),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM ev WHERE id >= 5)
    SELECT q.id AS q_id,
           CAST(COALESCE(h.h, 0) AS BIGINT) AS hits_at_10,
           CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_scanned,
           nc.n_corpus
    FROM (SELECT id FROM ev WHERE id < 5) q
    LEFT JOIN hits h ON h.q_id = q.id
    LEFT JOIN scanned s ON s.q_id = q.id
    LEFT JOIN nc ON true
    ORDER BY q.id
    """


@query(
    "ivfpq_recall_det",
    _ivfpq_det_oracle_sql(),
    "DETERMINISTIC integer IVF-PQ recall census (the faiss IndexIVFPQ "
    "shape -- THE standard billion-vector layout -- converted r14 from "
    "rows-only to FULLY VALUE-ORACLED via the graph_knn_descent recipe, "
    "the r13 verdict's #5: exact milli-quantized integer distances, "
    "unique (d2, id)/(d2, cell)/(d2, j) tie-breaks everywhere, and "
    "DETERMINISTIC training -- per-label integer centroids (sum div "
    "count), hash-ring-ranked seed codewords, ONE integer-mean Lloyd "
    "round (empty clusters keep init) -- so coarse quantizer, "
    "codebooks, codes, ADC scores and the recall numbers are identical "
    "BIGINTs on both engines and the census hash-matches. Search: "
    "nprobe=2 cells by (d2, cell), ADC = 4 codebook lookups vs the "
    "query residual, shortlist 20 by (adc, id), exact integer re-rank "
    "to top-10, hits vs the exact corpus-wide top-10. Engine runs "
    "three bounded matrix collects + one Arrow BLAS kernel per corpus "
    "pass (the measured kmeans/r7 + r11 BLAS lessons; every "
    "intermediate < 2^53 so float64 matmul stays exact; 2.7 s warm at "
    "sf0.1 vs 4.7 s for the float version it replaces); oracle mirrors "
    "the integer spec as dim-level CTEs; an independent python replica "
    "re-derives the whole pipeline from md5 up. Divisions are Spark "
    "div / DuckDB // on BIGINTs only (truncating, engine-pair pinned) "
    "-- python never divides (python // floors, the r8 odd one out)",
    ("similarity",),
)
def ivfpq_recall_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return sim_ops.ivfpq_det_recall(t["embeddings"])



@query(
    "x91_quality_ensemble",
    r"""
    WITH feat AS (
        SELECT doc_id, lang, n_chars,
               len(list_distinct(regexp_split_to_array(text, '\s+'))) * 1000000
                   // greatest(len(regexp_split_to_array(text, '\s+')), 1) AS ttr_q,
               length(replace(text, ' ', '')) * 1000000
                   // greatest(len(regexp_split_to_array(text, '\s+')), 1) AS mwl_q
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS r_len,
               row_number() OVER (PARTITION BY lang ORDER BY ttr_q DESC, doc_id) AS r_ttr,
               row_number() OVER (PARTITION BY lang ORDER BY mwl_q DESC, doc_id) AS r_mwl
        FROM feat
    )
    SELECT lang, doc_id, r_len, r_ttr, r_mwl,
           r_len + r_ttr + r_mwl AS borda,
           row_number() OVER (PARTITION BY lang ORDER BY r_len + r_ttr + r_mwl, doc_id) AS rk
    FROM ranked
    QUALIFY rk <= 5
    ORDER BY lang, rk
    """,
    "quality ENSEMBLE ranking (Borda count): three signals — length, "
    "type-token ratio, mean word length (both integer-quantized "
    "ratios) — each ranked per language with a doc_id tie-break, "
    "combined by integer rank SUM (rank aggregation sidesteps "
    "incomparable signal scales AND float determinism entirely); "
    "top-5 per language. All windows partitioned by language — no "
    "global sort at any corpus size",
    ("text", "quality", "pipeline"),
)
def x91_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    words = F.split(F.col("text"), r"\s+")
    feat = t["documents"].select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(
            "size(array_distinct(split(text, '\\\\s+'))) * 1000000"
            " div greatest(size(split(text, '\\\\s+')), 1)"
        ).alias("ttr_q"),
        F.expr(
            "length(replace(text, ' ', '')) * 1000000"
            " div greatest(size(split(text, '\\\\s+')), 1)"
        ).alias("mwl_q"),
    )
    p = W.partitionBy("lang")
    ranked = feat.select(
        "doc_id",
        "lang",
        F.row_number().over(p.orderBy(F.col("n_chars").desc(), "doc_id")).alias("r_len"),
        F.row_number().over(p.orderBy(F.col("ttr_q").desc(), "doc_id")).alias("r_ttr"),
        F.row_number().over(p.orderBy(F.col("mwl_q").desc(), "doc_id")).alias("r_mwl"),
    )
    borda = (F.col("r_len") + F.col("r_ttr") + F.col("r_mwl")).alias("borda")
    rk = F.row_number().over(
        p.orderBy(F.col("r_len") + F.col("r_ttr") + F.col("r_mwl"), F.col("doc_id"))
    )
    return (
        ranked.select("lang", "doc_id", "r_len", "r_ttr", "r_mwl", borda, rk.alias("rk"))
        .filter(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )


@query(
    "x92_k_anonymity",
    """
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS grp_sz
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT count(*) AS n_groups,
           CAST(sum(CASE WHEN grp_sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           CAST(sum(CASE WHEN grp_sz < 5 THEN grp_sz ELSE 0 END) AS BIGINT) AS rows_at_risk,
           CAST(sum(CASE WHEN grp_sz < 5 THEN grp_sz ELSE 0 END) * 1000000
                // sum(grp_sz) AS BIGINT) / 1e6 AS risk_fraction,
           min(grp_sz) AS min_group
    FROM groups
    """,
    "K-ANONYMITY audit (data governance, alongside PII redaction): "
    "group sizes over the quasi-identifier tuple (nation, market "
    "segment) — any group smaller than k=5 re-identifies its members; "
    "reports violating-group and at-risk-row counts with an integer-"
    "quantized risk fraction. The pre-release privacy gate for any "
    "shared dataset; two map-side-combinable aggregations",
    ("quality", "governance"),
)
def x92_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    groups = (
        t["customer"]
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("grp_sz"))
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_sz") < 5, 1).otherwise(0)).cast("long").alias("n_violating"),
        F.sum(F.when(F.col("grp_sz") < 5, F.col("grp_sz")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        (
            F.expr(
                "sum(CASE WHEN grp_sz < 5 THEN grp_sz ELSE 0 END) * 1000000 div sum(grp_sz)"
            )
            / 1e6
        ).alias("risk_fraction"),
        F.min("grp_sz").alias("min_group"),
    )


@query(
    "x95_l_diversity",
    """
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment,
               count(*) AS grp_sz,
               count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000)
                   AS l_div
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT count(*) AS n_groups,
           CAST(sum(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           CAST(sum(CASE WHEN l_div < 3 THEN grp_sz ELSE 0 END) AS BIGINT) AS rows_at_risk,
           CAST(sum(CASE WHEN l_div < 3 THEN grp_sz ELSE 0 END) * 1000000
                // sum(grp_sz) AS BIGINT) / 1e6 AS risk_fraction,
           min(l_div) AS min_l
    FROM groups
    """,
    "L-DIVERSITY audit (data governance, the step after k-anonymity): "
    "within each quasi-identifier group (nation, market segment), how "
    "many DISTINCT values does the sensitive attribute take — here the "
    "account-balance $1000 band, derived through exact integer cents "
    "with a positive offset so floor division agrees across engines. A "
    "k-anonymous group whose members all share one sensitive value "
    "still leaks it; groups with l < 3 are flagged with at-risk row "
    "counts and an integer-quantized risk fraction. Two map-side-"
    "combinable aggregations",
    ("quality", "governance"),
)
def x95_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    bucket = F.expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000")
    groups = (
        t["customer"]
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("grp_sz"),
            F.countDistinct(bucket).alias("l_div"),
        )
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("l_div") < 3, 1).otherwise(0)).cast("long").alias("n_violating"),
        F.sum(F.when(F.col("l_div") < 3, F.col("grp_sz")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        (
            F.expr(
                "sum(CASE WHEN l_div < 3 THEN grp_sz ELSE 0 END) * 1000000 div sum(grp_sz)"
            )
            / 1e6
        ).alias("risk_fraction"),
        F.min("l_div").alias("min_l"),
    )


@query(
    "x96_inverted_index",
    """
    WITH words AS (
        SELECT doc_id, lower(u.w) AS w
        FROM documents, LATERAL unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
        WHERE u.w != ''
    ),
    tf AS (SELECT w, doc_id, count(*) AS tf FROM words GROUP BY w, doc_id)
    SELECT w AS term,
           count(*) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS corpus_freq,
           array_to_string((list_sort(list(doc_id)))[1:10], ',') AS postings_head
    FROM tf
    GROUP BY w
    ORDER BY doc_freq DESC, term
    LIMIT 25
    """,
    "inverted-index build (the search-engine / retrieval artifact "
    "behind BM25): term -> document-frequency, corpus-frequency, and "
    "the posting list head (10 smallest doc ids, comma-joined). The "
    "posting head comes from a rank-window top-10 per term BEFORE any "
    "list materialization, so per-task state stays bounded even for "
    "stopword terms whose full posting list is corpus-sized; "
    "per-term totals ride the same single shuffle as window "
    "aggregates. Top-25 terms by doc_freq, term tie-break",
    ("text", "analytics"),
)
def x96_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    words = (
        t["documents"]
        .select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .select("doc_id", F.lower("w").alias("term"))
    )
    tf = words.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    wterm = W.partitionBy("term")
    ranked = tf.select(
        "term",
        "doc_id",
        F.count(F.lit(1)).over(wterm).alias("doc_freq"),
        F.sum("tf").over(wterm).cast("long").alias("corpus_freq"),
        F.row_number().over(wterm.orderBy("doc_id")).alias("rn"),
    ).filter(F.col("rn") <= 10)
    return (
        ranked.groupBy("term")
        .agg(
            F.first("doc_freq").alias("doc_freq"),
            F.first("corpus_freq").alias("corpus_freq"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings_head"
            ),
        )
        .orderBy(F.col("doc_freq").desc(), "term")
        .limit(25)
    )


@query(
    "file_bucketed_join",
    """
    SELECT o_orderstatus,
           count(*) AS n_items,
           CAST((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                 + 50) // 100 AS BIGINT) / 1e2 AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > DATE '1995-01-01'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "BUCKETED co-located join — the pre-shuffle pattern for a join "
    "repeated across a 100 TB pipeline: both fact tables are written "
    "once with bucketBy(8, orderkey) (hash-partitioned into fixed "
    "buckets AT WRITE TIME), and the sort-merge join then reads bucket "
    "i against bucket i with NO exchange on either side — the join "
    "shuffle is paid once at layout time, not per query. The merge "
    "hint pins SMJ so the demonstration can't degrade to a broadcast "
    "at small SF; tests/test_plans.py pins SelectedBucketsCount in the "
    "scan and the absence of a hashpartitioning exchange on the join "
    "keys. At production scale the bucket count scales with the data "
    "(e.g. 4096), amortizing every downstream orderkey join/agg",
    ("relational", "layout", "performance"),
)
def file_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil
    import time as _time

    from .queries import _scratch_dir

    t = _t(spark, sf_dir)
    # Table names AND data paths are namespaced by the application id:
    # the catalog names are session-global, so two concurrent sessions
    # sharing one metastore/scratch tree would otherwise race on both
    # the DROP TABLE and the overwrite of the external path. Scratch
    # dirs left by DEAD applications are garbage-collected by age;
    # liveness is keyed on mtime which every session REFRESHES
    # (os.utime) on its own dirs before the cutoff check, so a
    # long-lived (>6h) session that re-runs the query never has its
    # dirs aged out from under a still-valid catalog entry.
    suffix = hashlib.sha1(
        spark.sparkContext.applicationId.encode("utf-8")
    ).hexdigest()[:8]
    base = os.path.dirname(_scratch_dir("x99_gc_probe"))
    cutoff = _time.time() - 6 * 3600
    for entry in os.listdir(base):
        if not entry.startswith("x99_"):
            continue
        p = os.path.join(base, entry)
        try:
            if entry.endswith(suffix):
                os.utime(p)  # heartbeat: this session's dirs stay fresh
            elif os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    li_tbl, od_tbl = f"x99_li_bucketed_{suffix}", f"x99_od_bucketed_{suffix}"
    for tbl in (li_tbl, od_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        t["lineitem"]
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", _scratch_dir(f"x99_li_{suffix}"))
        .saveAsTable(li_tbl)
    )
    (
        t["orders"]
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", _scratch_dir(f"x99_od_{suffix}"))
        .saveAsTable(od_tbl)
    )
    li, od = spark.table(li_tbl), spark.table(od_tbl)
    return (
        li.filter(F.col("l_shipdate") > F.lit("1995-01-01").cast("date"))
        .hint("merge")
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact 1e-4-unit integer sum + half-up integer division:
            # disc_price is a 4-true-decimal product (the r11 q01 rule)
            F.sum(
                F.expr(
                    "cast(round(l_extendedprice * 100) as bigint)"
                    " * (100 - cast(round(l_discount * 100) as bigint))"
                )
            )
            .cast("long")
            .alias("__s4"),
        )
        .select(
            "o_orderstatus",
            "n_items",
            (F.expr("cast((__s4 + 50) div 100 as bigint)") / 1e2).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "xa0_bpe_merge_candidates",
    r"""
    WITH words AS (
        SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents
    ),
    vocab AS (
        SELECT w, count(*) AS cnt FROM words WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
        SELECT substr(w, i.i::INTEGER, 2) AS pair, cnt
        FROM vocab, LATERAL unnest(range(1, length(w))) AS i(i)
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
    """,
    "BPE tokenizer-induction round 1 (Sennrich et al. 2016): exact "
    "corpus-weighted counts of adjacent symbol pairs, emitted as the "
    "top-20 merge candidates. The scale trick is counting over the "
    "VOCABULARY (distinct words x their corpus frequency) instead of "
    "the token stream — pair extraction touches each distinct word "
    "once, and the explode is bounded by vocabulary size x word "
    "length, not corpus size. Exact integer counts; unique (count, "
    "pair) ordering. Subsequent BPE rounds iterate the same "
    "count->merge->re-pair shape on the shrinking symbolized vocab",
    ("text", "pipeline"),
)
def xa0_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    vocab = (
        t["documents"]
        .select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(20)
    )


@query(
    "xaf_dedup_quality_representative",
    f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT reach.u, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    labels AS (SELECT u, least(u, min(r)) AS cluster_id FROM reach GROUP BY u),
    assign AS (
        SELECT d.doc_id,
               coalesce(l.cluster_id, d.doc_id) AS cluster_id,
               length(trim(d.text)) AS quality
        FROM documents d LEFT JOIN labels l ON l.u = d.doc_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY cluster_id ORDER BY quality DESC, doc_id
        ) AS rn
        FROM assign
    )
    SELECT doc_id, cluster_id, quality, (rn = 1) AS kept
    FROM ranked ORDER BY doc_id
    """,
    "QUALITY-AWARE dedup representative selection: near-dup clusters "
    "(MinHash+LSH -> connected components) keep the HIGHEST-quality "
    "member instead of dedup_apply's min-id — the policy production "
    "pipelines actually want (min-id discards the best copy of "
    "boilerplate families). Quality here is the integer trimmed length "
    "(deterministic stand-in for the doc_stats composite); the "
    "per-cluster argmax is a row_number window with (quality DESC, "
    "doc_id) unique ordering, one shuffle over the assignment table. "
    "Oracle replays clustering as a recursive transitive closure",
    ("dedup", "graph", "pipeline", "quality"),
)
def xaf_dedup_quality_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.graph import connected_components

    t = _t(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup_ops.minhash_near_dup(
        docs, shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    cc = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed("vertex", "doc_id")
    assign = (
        docs.select("doc_id", F.length(F.trim("text")).alias("quality"))
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
            "quality",
        )
    )
    rn = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.col("quality").desc(), "doc_id")
    )
    return assign.select("doc_id", "cluster_id", "quality", (rn == 1).alias("kept")).orderBy(
        "doc_id"
    )


@query(
    "xa2_compaction_plan",
    """
    WITH files AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               count(*) * 512 AS size_bytes
        FROM events GROUP BY day, event_type
    ),
    planned AS (
        SELECT day, event_type, size_bytes,
               coalesce(sum(size_bytes) OVER (
                   ORDER BY day, event_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 262144 AS bin
        FROM files
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           count(*) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           min(day) AS first_day,
           max(day) AS last_day
    FROM planned GROUP BY bin ORDER BY bin
    """,
    "small-file COMPACTION planning (the Iceberg/Delta binPack "
    "maintenance shape): the per-(day, event_type) file inventory with "
    "simulated 512 B/row sizes is packed into ~256 KiB target bins by "
    "exclusive-prefix-sum division in layout order — file i lands in "
    "bin floor(cum_before / target), preserving sort order so "
    "compacted files keep data-skipping locality. The plan runs over "
    "file STATS (metadata-scale, thousands of rows for a 100 TB "
    "table), never the data; the single unpartitioned window is "
    "bounded by the inventory size. Integer sizes end-to-end",
    ("layout", "maintenance", "events"),
)
def xa2_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    files = (
        t["events"]
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg((F.count(F.lit(1)) * 512).alias("size_bytes"))
    )
    before = F.coalesce(
        F.sum("size_bytes").over(
            W.orderBy("day", "event_type").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        files.withColumn("bin", F.floor(before / 262144).cast("long"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").cast("long").alias("total_bytes"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
        .orderBy("bin")
    )


@query(
    "xa3_binaryfile_ingest",
    """
    SELECT doc_id,
           length(text) + 1 AS payload_bytes,
           md5(text || chr(10)) AS payload_md5
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    "binaryFile-source ingest — Spark's built-in path for loading raw "
    "multimodal assets (images/audio) as binary columns straight from "
    "a file listing: documents are materialized one file per doc_id "
    "partition directory (text sink + partitionBy), read back with "
    "format('binaryFile') which yields (path, modificationTime, "
    "length, content), the owning doc_id recovered from the partition "
    "path, and the binary payload verified by length + md5 against "
    "the source table. At 100 TB this scan parallelizes over the file "
    "listing with binary contents never passing through the driver; "
    "maxPartitionBytes bounds task input as for any FileScan",
    ("sources", "multimodal"),
)
def xa3_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from .queries import _scratch_dir

    t = _t(spark, sf_dir)
    path = _scratch_dir("xa3_binfiles", sf_dir)
    # one directory per doc (partitionBy) holding exactly one text file
    # whose content is the document text + trailing newline (text sink
    # contract) — a stand-in for an image/audio asset directory tree
    # bounded demo corpus: the point is the source path, not a
    # 5000-directory tree churned twice per bench pass
    docs = t["documents"].filter(F.col("doc_id") < 200).select("doc_id", "text")
    # The tree is DETERMINISTIC per corpus, and the 200-directory write
    # was ~3 s of the query's 3.75 s — memoize it behind a CONTENT
    # fingerprint (order-independent checksum of (doc_id, text) via one
    # tiny agg job), never a bare existence check: fixtures regenerate
    # between rounds while .tmp persists (the r4/r8 lesson), and a
    # stale tree would silently fail the oracle on fresh text
    checksum = docs.agg(
        F.sum(F.xxhash64(F.concat_ws("\x1f", "doc_id", "text")) % F.lit(1_000_000_007))
    ).first()[0]
    fingerprint = f"{sf_dir}|{checksum}"
    marker = path + ".fingerprint"
    fresh = False
    try:
        with open(marker) as fh:
            fresh = fh.read() == fingerprint and os.path.isdir(path)
    except OSError:
        pass
    if not fresh:
        docs.repartition("doc_id").write.mode("overwrite").partitionBy("doc_id").text(path)
        with open(marker, "w") as fh:
            fh.write(fingerprint)
    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(path)
    )
    return (
        binf.select(
            F.regexp_extract(F.col("path"), r"doc_id=(\d+)/", 1).cast("long").alias("doc_id"),
            F.col("length").alias("payload_bytes"),
            F.md5(F.col("content")).alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "xa4_fused_metric_quantiles",
    r"""
    WITH m AS (
        SELECT lang, 'n_chars' AS metric, CAST(length(text) AS DOUBLE) AS v
        FROM documents
        UNION ALL
        SELECT lang, 'n_tokens' AS metric,
               CAST(length(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS v
        FROM documents WHERE trim(text) != ''
    )
    SELECT lang, metric,
           round(quantile_cont(v, 0.5), 4) AS p50,
           round(quantile_cont(v, 0.9), 4) AS p90
    FROM m GROUP BY lang, metric
    ORDER BY lang, metric
    """,
    "FUSED multi-metric exact quantiles: per-language p50/p90 of BOTH "
    "n_chars and n_tokens in ONE bounded-state histogram pass — the "
    "metric name is folded into the GROUP KEY (union-explode to "
    "(lang, metric, value) rows), so the existing exact-quantile "
    "operator fuses any number of value columns with zero new API: "
    "one scan, one histogram aggregation, one selection pass for all "
    "metrics. The Spark-first answer to 'extend the operator to "
    "multiple value columns'. 4dp stage-seam rounding as q11/x67",
    ("text", "quality", "analytics"),
)
def xa4_fused_metric_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantiles import exact_group_quantiles

    t = _t(spark, sf_dir)
    docs = t["documents"]
    m = (
        docs.select(
            "lang", F.lit("n_chars").alias("metric"), F.length("text").cast("double").alias("v")
        )
    ).unionByName(
        docs.filter(F.trim("text") != "").select(
            "lang",
            F.lit("n_tokens").alias("metric"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("double").alias("v"),
        )
    )
    q = exact_group_quantiles(m, ["lang", "metric"], "v", [0.5, 0.9])
    return q.select(
        "lang",
        "metric",
        F.round(F.col("quantiles")[0], 4).alias("p50"),
        F.round(F.col("quantiles")[1], 4).alias("p90"),
    ).orderBy("lang", "metric")


@query(
    "xa5_salted_skew_join",
    """
    SELECT n.n_name,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    "SALTED broadcast join under a skewed key: the customer->nation "
    "dimension join runs through salted_broadcast_join (dimension "
    "replicated once per salt, fact joins on (key, salt)) so a hot "
    "nation key can never stall one reducer — the big side is NEVER "
    "shuffled at all (broadcast join on the composite key). Result is "
    "provably identical to the plain join (the oracle IS the plain "
    "join); complements agg_skew_salted (salted AGGREGATION) with the "
    "join-side skew defense from operators/skew.py",
    ("relational", "skew", "performance"),
)
def xa5_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_broadcast_join

    t = _t(spark, sf_dir)
    cust_nation = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(F.col("c_custkey").alias("o_custkey"), "n_name")
    joined = salted_broadcast_join(
        t["orders"], cust_nation, on="o_custkey", how="inner", num_salts=8
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("n_name")
    )


@query(
    "pipeline_llm_corpus",
    f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT reach.u, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    labels AS (SELECT u, least(u, min(r)) AS cluster_id FROM reach GROUP BY u),
    shw AS (
        SELECT DISTINCT doc_id, array_to_string(w[i+1:i+4], ' ') AS shingle
        FROM words, LATERAL unnest(range(greatest(len(w) - 3, 1))) AS t(i)
    ),
    ev AS (SELECT DISTINCT shingle FROM shw WHERE doc_id % 50 = 0),
    tr_sh AS (SELECT * FROM shw WHERE doc_id % 50 != 0),
    per_doc AS (SELECT doc_id, count(*) AS n_sh FROM tr_sh GROUP BY doc_id),
    hits AS (
        SELECT tr_sh.doc_id, count(*) AS n_ov
        FROM tr_sh JOIN ev USING (shingle) GROUP BY tr_sh.doc_id
    ),
    corpus AS (
        SELECT d.doc_id, d.lang,
               len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_tokens
        FROM documents d
        JOIN per_doc p ON p.doc_id = d.doc_id
        LEFT JOIN hits h ON h.doc_id = d.doc_id
        LEFT JOIN labels l ON l.u = d.doc_id
        WHERE d.doc_id % 50 != 0
          AND coalesce(l.cluster_id, d.doc_id) = d.doc_id
          AND length(trim(d.text)) >= 50
          AND coalesce(h.n_ov, 0) * 100 <= p.n_sh
    ),
    assigned AS (
        SELECT lang, n_tokens,
               CASE WHEN bkt < 100000 THEN 'test'
                    WHEN bkt < 900000 THEN 'train'
                    ELSE 'val' END AS split
        FROM (SELECT *,
                     ('0x' || substr(md5('split:' || doc_id), 1, 15))::BIGINT % 1000000 AS bkt
              FROM corpus)
    )
    SELECT split, lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY split, lang
    ORDER BY split, lang
    """,
    "the END-TO-END LLM corpus-prep pipeline as ONE query — the "
    "composition a reference user actually ships: (1) MinHash+LSH "
    "near-dup clustering keeps the min-id representative per cluster "
    "(near-dups of EVAL docs get dropped here too — dedup doubles as "
    "fuzzy decontamination); (2) quality floor (>= 50 trimmed chars); "
    "(3) benchmark decontamination — train docs with > 1% word-4-gram "
    "overlap against the eval set (doc_id % 50 = 0 stand-in) dropped "
    "via integer cross-multiplication; (4) hash-decided 80/10/10 "
    "train/val/test split (rows never migrate as the corpus grows). "
    "Emits per-(split, lang) doc and exact token counts. Every stage "
    "reuses a driver-green operator (dedup CC, ngram_overlap, "
    "split_assign); the oracle replays the chain with the same proven "
    "CTEs",
    ("pipeline", "dedup", "decontam", "sampling", "quality"),
)
def pipeline_llm_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.decontam import ngram_overlap
    from .operators.graph import connected_components
    from .operators.sampling import split_assign

    t = _t(spark, sf_dir)
    docs = t["documents"]
    # (1) near-dup clusters over the WHOLE corpus: representatives are
    # chosen globally, so a training doc whose cluster min-id is an
    # eval doc stays dropped — it duplicates benchmark material
    pairs = dedup_ops.minhash_near_dup(
        docs, shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    )
    cc = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed("vertex", "doc_id")
    # (3) contamination stats: train-side docs vs eval 4-grams
    train = docs.filter(F.col("doc_id") % 50 != 0)
    evalset = docs.filter(F.col("doc_id") % 50 == 0)
    overlap = ngram_overlap(train, evalset, n=4).withColumnRenamed("doc", "doc_id")
    corpus = (
        train.join(overlap, "doc_id")
        .join(cc, "doc_id", "left")
        .filter(
            (F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id"))
            & (F.length(F.trim("text")) >= 50)
            & (F.col("n_overlap") * 100 <= F.col("n_shingles"))
        )
        .select(
            "doc_id", "lang", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
        )
    )
    assigned = split_assign(
        corpus, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split"
    )
    return (
        assigned.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


@query(
    "xa9_pipeline_product_analytics",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ),
    tagged AS (
        SELECT *,
               first_value(event_type) OVER (
                   PARTITION BY user_id, session_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS entry_type
        FROM sessions
    ),
    per_session AS (
        SELECT user_id, session_id, entry_type,
               count(*) AS n_events,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
               sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS revenue
        FROM tagged GROUP BY user_id, session_id, entry_type
    )
    SELECT entry_type,
           count(*) AS n_sessions,
           sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) / 1e6 AS bounce_rate,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           sum(converted) * 1000000 // count(*) / 1e6 AS conv_rate,
           round(sum(revenue), 2) AS revenue
    FROM per_session GROUP BY entry_type ORDER BY entry_type
    """,
    "the product-analytics composition in ONE query (the events-side "
    "mirror of xa8): gaps-and-islands sessionization (30-min boundary, "
    "microsecond-exact diffs, event_id tiebreak) -> per-session entry "
    "event type, bounce flag, conversion flag, purchase revenue -> "
    "per-entry-type funnel readout with integer-quantized bounce and "
    "conversion rates. All windows partitioned by user; the rollup is "
    "one bounded agg over one row per session",
    ("events", "analytics", "pipeline"),
)
def xa9_pipeline_product_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = t["events"].select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.lag("ts").over(w).alias("__prev"),
    )
    new_s = F.when(
        F.col("__prev").isNull()
        | (F.timestamp_diff("MICROSECOND", F.col("__prev"), F.col("ts")) > 1_800_000_000),
        1,
    ).otherwise(0)
    sessions = marked.select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "session_id"
        ),
    )
    ws = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    tagged = sessions.withColumn("entry_type", F.first("event_type").over(ws))
    per = tagged.groupBy("user_id", "session_id", "entry_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("revenue"),
    )
    return (
        per.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            (F.expr("sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 div count(1)") / 1e6).alias("bounce_rate"),
            F.sum("converted").cast("long").alias("n_converted"),
            (F.expr("sum(converted) * 1000000 div count(1)") / 1e6).alias("conv_rate"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
        )
        .orderBy("entry_type")
    )


@query(
    "xaa_variant_semistructured",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Spark 4 VARIANT semi-structured path (the successor to string "
    "get_json_object that q21 covers): try_parse_json -> open VARIANT "
    "column, typed extraction via variant_get('$.k', 'bigint') with "
    "engine-native shredding, try_variant_get on an absent path "
    "yielding NULL (counted, provably zero). VARIANT keeps the parsed "
    "binary representation through the plan, so repeated path "
    "extractions don't re-parse the JSON text per access — the right "
    "semi-structured shape for wide event payloads at scale",
    ("functions", "json"),
)
def xaa_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    v = F.try_parse_json("props")
    ev = t["events"].select(
        "event_type",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "string").alias("missing"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum(F.when(F.col("missing").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
        )
        .orderBy("event_type")
    )


@query(
    "xab_equidepth_bucketize",
    """
    WITH pv AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    qs AS (
        SELECT event_type,
               round(quantile_cont(value, 0.25), 4) AS q1,
               round(quantile_cont(value, 0.50), 4) AS q2,
               round(quantile_cont(value, 0.75), 4) AS q3
        FROM pv GROUP BY event_type
    ),
    binned AS (
        SELECT p.event_type,
               CASE WHEN p.value <= q.q1 THEN 0
                    WHEN p.value <= q.q2 THEN 1
                    WHEN p.value <= q.q3 THEN 2
                    ELSE 3 END AS bin,
               p.value
        FROM pv p JOIN qs q USING (event_type)
    )
    SELECT event_type, bin, count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM binned GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
    "equi-depth feature bucketing (ML discretization): per-event-type "
    "quartile boundaries from the bounded-state EXACT quantile "
    "operator, rounded 4dp AT THE STAGE SEAM (so both engines bin "
    "against identical doubles), then every value assigned its "
    "quartile bin by broadcast of the tiny boundary table into the "
    "scan — per-(type, bin) counts and value spans. The quantile "
    "operator's 4th composition (after MAD, latency percentiles, "
    "percentile gates); bucketize is one broadcast join + codegen "
    "CASE, scan-speed at any corpus size",
    ("events", "quality", "analytics"),
)
def xab_equidepth_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantiles import exact_group_quantiles
    from .session import track_cache

    t = _t(spark, sf_dir)
    pv = track_cache(
        t["events"].filter(F.col("value").isNotNull()).select("event_type", "value")
    )
    q = exact_group_quantiles(pv, ["event_type"], "value", [0.25, 0.5, 0.75]).select(
        "event_type",
        F.round(F.col("quantiles")[0], 4).alias("q1"),
        F.round(F.col("quantiles")[1], 4).alias("q2"),
        F.round(F.col("quantiles")[2], 4).alias("q3"),
    )
    binned = pv.join(F.broadcast(q), "event_type").select(
        "event_type",
        "value",
        F.when(F.col("value") <= F.col("q1"), 0)
        .when(F.col("value") <= F.col("q2"), 1)
        .when(F.col("value") <= F.col("q3"), 2)
        .otherwise(3)
        .alias("bin"),
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


@query(
    "xac_window_distribution_funcs",
    """
    WITH ranked AS (
        SELECT c_nationkey,
               c_acctbal,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    )
    SELECT c_nationkey, quartile,
           count(*) AS n,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           min(pr) AS min_pr,
           max(pr) AS max_pr,
           max(cd) AS max_cd
    FROM ranked GROUP BY c_nationkey, quartile
    ORDER BY c_nationkey, quartile
    """,
    "the distribution window functions q12's ranking trio doesn't "
    "cover: ntile(4) equal-count tiling, percent_rank, cume_dist — "
    "per-nation balance quartiles with their rank-fraction spans. The "
    "window ordering is UNIQUE ((balance, custkey)), so tiling and "
    "rank fractions are deterministic; pr/cd are single IEEE divisions "
    "of identical integers on both engines (no summation, no rounding "
    "needed), and the per-quartile rollup keeps min/max picks — never "
    "an order-dependent float sum",
    ("relational", "window"),
)
def xac_window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    ranked = t["customer"].select(
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        ranked.groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.min("pr").alias("min_pr"),
            F.max("pr").alias("max_pr"),
            F.max("cd").alias("max_cd"),
        )
        .orderBy("c_nationkey", "quartile")
    )


@query(
    "xb0_chunk_documents",
    """
    SELECT doc_id,
           (s - 1) // 150 AS chunk_id,
           s AS start_pos,
           length(substr(text, s::INTEGER, 200)) AS chunk_len,
           md5(substr(text, s::INTEGER, 200)) AS chunk_md5
    FROM documents, unnest(generate_series(1, n_chars, 150)) AS t(s)
    WHERE n_chars > 0
    ORDER BY doc_id, chunk_id
    """,
    "document CHUNKING for RAG / training-window prep: each document "
    "splits into 200-char windows at stride 150 (50-char overlap so no "
    "boundary-straddling span is lost), every chunk carrying its "
    "provenance (doc_id, ordinal, 1-based start offset) and a portable "
    "md5 content address. Pure projection + generate-series explode — "
    "scan-speed, zero shuffle, the fan-out is output-proportional; at "
    "100 TB the chunker runs at read bandwidth and the md5 column is "
    "the join key for downstream chunk-level dedup/embedding. "
    "chunk_id derives from the start offset ((s-1) div stride), not "
    "explode ordinality, so both engines agree without ORDINALITY",
    ("text", "pipeline"),
)
def xb0_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    # sequence(1, n, 150) is guarded by n_chars > 0: Spark's sequence
    # DESCENDS when stop < start (CLAUDE.md xa0 lesson), and n_chars
    # >= 1 keeps 1 <= stop with a positive step
    starts = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_chars"), F.lit(150).cast("long"))
            ).alias("s"),
        )
    )
    chunk = F.expr("substr(text, CAST(s AS INT), 200)")
    return starts.select(
        "doc_id",
        F.expr("(s - 1) div 150").alias("chunk_id"),
        F.col("s").alias("start_pos"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "xb4_scd2_dimension",
    """
    WITH obs AS (
        SELECT o_custkey AS custkey,
               CAST(o_orderdate AS DATE) AS d,
               o_orderstatus AS status,
               o_orderkey,
               lag(o_orderstatus) OVER w AS prev_status
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    ),
    changes AS (
        SELECT custkey, d, status, o_orderkey
        FROM obs
        WHERE prev_status IS NULL OR prev_status <> status
    ),
    versions AS (
        SELECT custkey, status, d AS eff_from,
               row_number() OVER w2 AS version,
               lead(d) OVER w2 AS eff_to
        FROM changes
        WINDOW w2 AS (PARTITION BY custkey ORDER BY d, o_orderkey)
    )
    SELECT custkey, version, status, eff_from,
           coalesce(eff_to, DATE '9999-12-31') AS eff_to,
           eff_to IS NULL AS is_current
    FROM versions
    ORDER BY custkey, version
    """,
    "SCD TYPE-2 dimension maintenance (the warehouse-history pattern "
    "the reference's sink feeds): each customer's order-status "
    "observations collapse into VERSIONED validity intervals — "
    "consecutive repeats dropped via lag() over the unique (date, "
    "orderkey) order, version numbers + effective_to via "
    "row_number/lead over the change rows, open-ended current row "
    "flagged. Two windows over the same customer partitioning (one "
    "shuffle, alias-traced through both), no self-join; dates compare "
    "as DATE on both engines (timestamp canonicalization differs)",
    ("relational", "window", "warehouse"),
)
def xb4_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    w = W.partitionBy("o_custkey").orderBy(d, "o_orderkey")
    obs = t["orders"].select(
        F.col("o_custkey").alias("custkey"),
        d.alias("d"),
        F.col("o_orderstatus").alias("status"),
        "o_orderkey",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    changes = obs.filter(
        F.col("prev_status").isNull() | (F.col("prev_status") != F.col("status"))
    )
    w2 = W.partitionBy("custkey").orderBy("d", "o_orderkey")
    versions = changes.select(
        "custkey",
        "status",
        F.col("d").alias("eff_from"),
        F.row_number().over(w2).alias("version"),
        F.lead("d").over(w2).alias("eff_to"),
    )
    # open rows get the conventional far-future end date rather than a
    # NULL: a NULL timestamp canonicalizes as 'NULL' (Spark) vs 'NaT'
    # (DuckDB) through the driver's Arrow hash path
    return versions.select(
        "custkey",
        "version",
        "status",
        "eff_from",
        F.coalesce(F.col("eff_to"), F.lit("9999-12-31").cast("date")).alias("eff_to"),
        F.col("eff_to").isNull().alias("is_current"),
    ).orderBy("custkey", "version")


@query(
    "profile_columns",
    """
    WITH agg AS (
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l_orderkey,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd_l_orderkey,
               CAST(min(l_orderkey) AS VARCHAR) AS mn_l_orderkey,
               CAST(max(l_orderkey) AS VARCHAR) AS mx_l_orderkey,
               CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l_linenumber,
               CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd_l_linenumber,
               CAST(min(l_linenumber) AS VARCHAR) AS mn_l_linenumber,
               CAST(max(l_linenumber) AS VARCHAR) AS mx_l_linenumber,
               CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l_quantity,
               CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd_l_quantity,
               CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) AS mn_l_quantity,
               CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) AS mx_l_quantity,
               CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l_extendedprice,
               CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS nd_l_extendedprice,
               CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_l_extendedprice,
               CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_l_extendedprice,
               CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l_returnflag,
               CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd_l_returnflag,
               min(l_returnflag) AS mn_l_returnflag,
               max(l_returnflag) AS mx_l_returnflag,
               CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l_linestatus,
               CAST(count(DISTINCT l_linestatus) AS BIGINT) AS nd_l_linestatus,
               min(l_linestatus) AS mn_l_linestatus,
               max(l_linestatus) AS mx_l_linestatus
        FROM lineitem
    )
    SELECT u.col AS column_name, a.n_rows,
           CASE u.col
               WHEN 'l_orderkey' THEN a.nn_l_orderkey
               WHEN 'l_linenumber' THEN a.nn_l_linenumber
               WHEN 'l_quantity' THEN a.nn_l_quantity
               WHEN 'l_extendedprice' THEN a.nn_l_extendedprice
               WHEN 'l_returnflag' THEN a.nn_l_returnflag
               ELSE a.nn_l_linestatus END AS n_nulls,
           CASE u.col
               WHEN 'l_orderkey' THEN a.nd_l_orderkey
               WHEN 'l_linenumber' THEN a.nd_l_linenumber
               WHEN 'l_quantity' THEN a.nd_l_quantity
               WHEN 'l_extendedprice' THEN a.nd_l_extendedprice
               WHEN 'l_returnflag' THEN a.nd_l_returnflag
               ELSE a.nd_l_linestatus END AS n_distinct,
           CASE u.col
               WHEN 'l_orderkey' THEN a.mn_l_orderkey
               WHEN 'l_linenumber' THEN a.mn_l_linenumber
               WHEN 'l_quantity' THEN a.mn_l_quantity
               WHEN 'l_extendedprice' THEN a.mn_l_extendedprice
               WHEN 'l_returnflag' THEN a.mn_l_returnflag
               ELSE a.mn_l_linestatus END AS min_value,
           CASE u.col
               WHEN 'l_orderkey' THEN a.mx_l_orderkey
               WHEN 'l_linenumber' THEN a.mx_l_linenumber
               WHEN 'l_quantity' THEN a.mx_l_quantity
               WHEN 'l_extendedprice' THEN a.mx_l_extendedprice
               WHEN 'l_returnflag' THEN a.mx_l_returnflag
               ELSE a.mx_l_linestatus END AS max_value
    FROM agg a, unnest(['l_orderkey','l_linenumber','l_quantity',
                        'l_extendedprice','l_returnflag','l_linestatus']) AS u(col)
    ORDER BY column_name
    """,
    "COLUMN PROFILER (the data-quality summary every ingest pipeline "
    "runs before accepting a drop): per-column null count, exact "
    "distinct count, min/max for six columns. Two passes, each the "
    "scalable shape for its metric family: nulls/min/max as plain "
    "conditional aggregates (map-side-combined, KB-sized result), and "
    "exact distincts via unpivot-to-(column, value) + two-level count "
    "— pure HashAggregate with map-side dedup. The naive ONE-pass "
    "multi-countDistinct compiles to Expand(7x row replication) + "
    "SortAggregate (string min/max buffers break hash agg) and "
    "measured 14.4 s at sf0.1 vs ~1 s for this shape; at 100 TB the "
    "Expand would also 7x the shuffle. Numeric extremes canonicalize "
    "through DECIMAL(18,2) -> VARCHAR on both engines (raw stored "
    "values, not computed aggregates, so the 2dp cast is lossless)",
    ("relational", "quality", "analytics"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    num_cols = {"l_quantity", "l_extendedprice"}
    cols = [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nn_{c}")
        )
        if c in num_cols:
            aggs.append(F.min(c).cast("decimal(18,2)").cast("string").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("decimal(18,2)").cast("string").alias(f"mx_{c}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"mx_{c}"))
    row = li.agg(*aggs)
    # exact distincts: (column, value-string) pairs dedup map-side in the
    # partial HashAggregate, then a 6-row count — the string cast is
    # injective per column (no NaN / -0.0 in the domain), so the count
    # matches count(DISTINCT native) exactly
    pairs = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.column_name", "e.v")
    nd = (
        pairs.filter(F.col("v").isNotNull())
        .distinct()
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"mn_{c}").alias("min_value"),
                F.col(f"mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    stats = row.select("n_rows", F.explode(entries).alias("e")).select(
        F.col("e.column_name").alias("column_name"),
        "n_rows",
        F.col("e.n_nulls").alias("n_nulls"),
        F.col("e.min_value").alias("min_value"),
        F.col("e.max_value").alias("max_value"),
    )
    return (
        nd.join(F.broadcast(stats), "column_name")
        .select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
        .orderBy("column_name")
    )


@query(
    "xb2_sparse_topk_retrieval",
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
    ),
    sh AS (
        SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS term
        FROM toks, unnest(range(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 3
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY doc_id, term),
    nd AS (SELECT count(*) AS n FROM documents),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    keep AS (
        SELECT d.term, (SELECT n FROM nd) // d.df AS idf_i
        FROM df d
        WHERE d.df * 2 <= (SELECT n FROM nd)
    ),
    postings AS (
        SELECT t.doc_id, t.term, t.tf * k.idf_i AS w
        FROM tf t JOIN keep k USING (term)
    ),
    qp AS (SELECT doc_id AS q_doc, term, w AS wq FROM postings WHERE doc_id % 97 = 0),
    cp AS (SELECT doc_id AS c_doc, term, w AS wc FROM postings WHERE doc_id % 97 <> 0),
    dots AS (
        SELECT q.q_doc, c.c_doc,
               CAST(sum(q.wq * c.wc) AS BIGINT) AS dot,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM qp q JOIN cp c USING (term)
        GROUP BY q.q_doc, c.c_doc
    )
    SELECT q_doc, rk, c_doc, dot, n_shared
    FROM (
        SELECT q_doc, c_doc, dot, n_shared,
               row_number() OVER (PARTITION BY q_doc ORDER BY dot DESC, c_doc) AS rk
        FROM dots
    )
    WHERE rk <= 5
    ORDER BY q_doc, rk
    """,
    "SPARSE top-k retrieval via an inverted index (the BM25/TF-IDF "
    "retrieval shape, complementing the dense ANN family): terms are "
    "word 3-shingles (phrase-level vocabulary — rich enough that "
    "document frequency actually discriminates), per-doc weights "
    "tf * (N div df) — INTEGER idf quantization, so dot products are "
    "exact integer sums no float agg order can perturb — query docs "
    "join the corpus postings ON THE TERM (only docs sharing a "
    "surviving term ever pair: the inverted-index prune), stop terms "
    "with df > N/2 dropped by integer cross-multiplication (caps "
    "posting-list blow-up at corpus scale), accumulated inner-product "
    "scores, top-5 per query by (score, id). At 100 TB the postings "
    "table is the shuffled asset and the df filter bounds the join "
    "fan-out",
    ("text", "similarity", "pipeline"),
)
def xb2_sparse_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .session import track_cache

    t = _t(spark, sf_dir)
    docs = t["documents"]
    toks = docs.select("doc_id", F.split("text", r"\s+").alias("ws")).filter(
        F.size("ws") >= 3
    )
    # sequence ascends because size >= 3 puts stop >= 1 (CLAUDE.md)
    i = F.col("i").cast("int")
    sh = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("ws") - 2)).alias("i"),
        "ws",
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("ws", i),
            F.element_at("ws", i + 1),
            F.element_at("ws", i + 2),
        ).alias("term"),
    )
    tf = sh.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    keep = (
        df.crossJoin(F.broadcast(nd))
        .filter(F.col("df") * 2 <= F.col("n"))
        .select("term", F.expr("n div df").alias("idf_i"))
    )
    postings = track_cache(
        tf.join(keep, "term").select(
            "doc_id", "term", (F.col("tf") * F.col("idf_i")).alias("w")
        )
    )
    qp = postings.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("q_doc"), "term", F.col("w").alias("wq")
    )
    cp = postings.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("c_doc"), "term", F.col("w").alias("wc")
    )
    dots = (
        qp.join(cp, "term")
        .groupBy("q_doc", "c_doc")
        .agg(
            F.sum(F.col("wq") * F.col("wc")).cast("long").alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_shared"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("q_doc").orderBy(F.col("dot").desc(), F.col("c_doc").asc())
    )
    return (
        dots.select("q_doc", rk.alias("rk"), "c_doc", "dot", "n_shared")
        .filter(F.col("rk") <= 5)
        .orderBy("q_doc", "rk")
    )


@query(
    "xb3_bigram_lm_nll",
    r"""
    WITH toks AS (
        SELECT doc_id, i AS pos, ws[i] AS w
        FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents),
             unnest(range(1, len(ws) + 1)) AS t(i)
        WHERE ws[i] <> ''
    ),
    big AS (
        SELECT doc_id, w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    ),
    bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    vv AS (SELECT count(DISTINCT w) AS v FROM toks),
    scored AS (
        SELECT b.doc_id,
               CAST(floor(ln((c1.c1 + vv.v) * 1.0 / (c12.c12 + 1)) * 1000000) AS BIGINT) AS nll_q
        FROM bg b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(nll_q) AS BIGINT) AS nll_total_q,
           CAST(sum(nll_q) AS BIGINT) // CAST(count(*) AS BIGINT) AS nll_avg_micro
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    "BIGRAM language-model scoring (the step up from x66's unigram "
    "NLL): add-1-smoothed conditional P(w2|w1) = (c12+1)/(c1+V) "
    "trained on the corpus itself, per-token NLL ln((c1+V)/(c12+1)) "
    "quantized to integer micro-nats ONCE at its source (the x66/r5 "
    "rule: a float that must be SUMMED across rows is quantized at "
    "the term), so per-doc totals and the integer-div mean are exact "
    "on both engines. The fluency/garbage signal a pretraining filter "
    "computes per document; counts tables are the shuffled assets and "
    "the scoring join is a broadcast wherever vocab^2 fits",
    ("text", "quality", "pipeline"),
)
def xb3_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .session import track_cache

    t = _t(spark, sf_dir)
    docs = t["documents"]
    toks = track_cache(
        docs.select("doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "w"))
        .filter(F.col("w") != "")
    )
    wnd = W.partitionBy("doc_id").orderBy("pos")
    bg = track_cache(
        toks.select(
            "doc_id", F.col("w").alias("w1"), F.lead("w").over(wnd).alias("w2")
        ).filter(F.col("w2").isNotNull())
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vv = toks.agg(F.countDistinct("w").alias("v"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("c1") + F.col("v")) * 1.0 / (F.col("c12") + 1)) * 1_000_000
            )
            .cast("long")
            .alias("nll_q"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll_q").alias("nll_total_q"),
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        "nll_total_q",
        F.expr("nll_total_q div n_bigrams").alias("nll_avg_micro"),
    ).orderBy("doc_id")


@query(
    "xb5_cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM events GROUP BY user_id
    ),
    base AS (
        SELECT e.user_id, f.cohort,
               date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS offset_d
        FROM events e JOIN firsts f USING (user_id)
    ),
    mat AS (
        SELECT cohort, offset_d, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM base GROUP BY cohort, offset_d
    ),
    sizes AS (SELECT cohort, n_users AS cohort_n FROM mat WHERE offset_d = 0)
    SELECT m.cohort, m.offset_d, m.n_users, s.cohort_n,
           (m.n_users * 1000000 // s.cohort_n) / 1e6 AS retention
    FROM mat m JOIN sizes s USING (cohort)
    ORDER BY m.cohort, m.offset_d
    """,
    "COHORT RETENTION matrix (the product-analytics readout behind "
    "every activation dashboard): each user's cohort is the calendar "
    "DAY of their first event, every later event lands in a day "
    "offset computed as a DATE-to-DATE day diff (integer-exact on "
    "both engines — the timestamp-level date_diff boundary trap of "
    "x81 never arises for DATEs), per-(cohort, offset) distinct "
    "users, retention = integer-quantized ratio against the cohort's "
    "own offset-0 size. Two shuffles (first-event agg + matrix agg), "
    "both map-side-combinable; the matrix is dashboard-sized at any "
    "corpus scale",
    ("events", "analytics"),
)
def xb5_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"].select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort"))
    base = ev.join(firsts, "user_id").select(
        "user_id",
        "cohort",
        F.datediff(F.col("ts").cast("date"), F.col("cohort")).alias("offset_d"),
    )
    mat = base.groupBy("cohort", "offset_d").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    sizes = mat.filter(F.col("offset_d") == 0).select(
        "cohort", F.col("n_users").alias("cohort_n")
    )
    return (
        mat.join(sizes, "cohort")
        .select(
            "cohort",
            "offset_d",
            "n_users",
            "cohort_n",
            (F.expr("(n_users * 1000000) div cohort_n") / 1e6).alias("retention"),
        )
        .orderBy("cohort", "offset_d")
    )


@query(
    "xb6_label_centroids",
    """
    WITH q AS (
        SELECT label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
        SELECT label, pos,
               CAST(sum(xq) AS BIGINT) // CAST(count(*) AS BIGINT) AS mq,
               CAST(count(*) AS BIGINT) AS n
        FROM q GROUP BY label, pos
    ),
    norms AS (
        SELECT label, CAST(sum(mq * mq) AS BIGINT) AS norm_sq, min(n) AS n
        FROM cent GROUP BY label
    ),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(sum(a.mq * b.mq) AS BIGINT) AS dot
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT d.label_a, d.label_b, d.dot,
           na.norm_sq AS norm_a_sq, nb.norm_sq AS norm_b_sq,
           na.n AS n_a, nb.n AS n_b
    FROM dots d
    JOIN norms na ON na.label = d.label_a
    JOIN norms nb ON nb.label = d.label_b
    ORDER BY d.label_a, d.label_b
    """,
    "embedding-space LABEL AUDIT: per-label centroids and their "
    "pairwise inner products / norms — the class-separation check a "
    "labeled embedding corpus gets before training. Vector elements "
    "quantize to integer micro-units at the SOURCE (float32 -> double "
    "is exact and double*1e6 is one IEEE rounding, identical on both "
    "engines — unlike ln, floor here cannot flip), so centroid sums, "
    "integer-div means, dots and norms are all exact integer "
    "arithmetic in any aggregation order. posexplode to (label, dim) "
    "rows -> one map-side-combinable agg; the centroid table (labels "
    "x dim) is broadcast-sized at any corpus scale",
    ("similarity", "analytics", "quality"),
)
def xb6_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    q = t["embeddings"].select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * 1_000_000).cast("long").alias("xq"),
    )
    cent = track_cache(
        q.groupBy("label", "pos").agg(
            F.expr("sum(xq) div count(1)").alias("mq"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("mq") * F.col("mq")).cast("long").alias("norm_sq"),
        F.min("n").alias("n"),
    )
    a = cent.select(F.col("label").alias("label_a"), "pos", F.col("mq").alias("ma"))
    b = cent.select(F.col("label").alias("label_b"), "pos", F.col("mq").alias("mb"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ma") * F.col("mb")).cast("long").alias("dot"))
    )
    na = norms.select(
        F.col("label").alias("label_a"),
        F.col("norm_sq").alias("norm_a_sq"),
        F.col("n").alias("n_a"),
    )
    nb = norms.select(
        F.col("label").alias("label_b"),
        F.col("norm_sq").alias("norm_b_sq"),
        F.col("n").alias("n_b"),
    )
    return (
        dots.join(na, "label_a")
        .join(nb, "label_b")
        .select("label_a", "label_b", "dot", "norm_a_sq", "norm_b_sq", "n_a", "n_b")
        .orderBy("label_a", "label_b")
    )


@query(
    "xb7_winsorized_stats",
    """
    WITH pv AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
        SELECT event_type,
               round(quantile_cont(value, 0.05), 4) AS lo,
               round(quantile_cont(value, 0.95), 4) AS hi
        FROM pv GROUP BY event_type
    ),
    clamped AS (
        SELECT p.event_type,
               CASE WHEN p.value < b.lo THEN 1 ELSE 0 END AS at_lo,
               CASE WHEN p.value > b.hi THEN 1 ELSE 0 END AS at_hi,
               CAST(floor(least(greatest(p.value, b.lo), b.hi) * 100) AS BIGINT) AS wc
        FROM pv p JOIN bounds b USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(at_lo) AS BIGINT) AS n_clamped_lo,
           CAST(sum(at_hi) AS BIGINT) AS n_clamped_hi,
           CAST(sum(wc) AS BIGINT) AS winsorized_cents,
           CAST(sum(wc) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_cents
    FROM clamped GROUP BY event_type ORDER BY event_type
    """,
    "WINSORIZED robust statistics (the outlier-resistant mean a metric "
    "pipeline reports instead of dropping rows): per-event-type "
    "p05/p95 bounds from the bounded-state EXACT quantile operator "
    "(4dp stage-seam rounding so both engines clamp against identical "
    "doubles), every value clamped into [lo, hi], clamped values "
    "floored to integer cents AT SOURCE (floor of a deterministic "
    "IEEE product — engine-safe, unlike ln) so the winsorized sum and "
    "integer-div mean are exact in any aggregation order. The "
    "quantile operator's 5th composition; clamp is one broadcast join "
    "+ codegen CASE at scan speed",
    ("events", "quality", "analytics"),
)
def xb7_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantiles import exact_group_quantiles
    from .session import track_cache

    t = _t(spark, sf_dir)
    pv = track_cache(
        t["events"].filter(F.col("value").isNotNull()).select("event_type", "value")
    )
    bounds = exact_group_quantiles(pv, ["event_type"], "value", [0.05, 0.95]).select(
        "event_type",
        F.round(F.col("quantiles")[0], 4).alias("lo"),
        F.round(F.col("quantiles")[1], 4).alias("hi"),
    )
    clamped = pv.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.when(F.col("value") < F.col("lo"), 1).otherwise(0).alias("at_lo"),
        F.when(F.col("value") > F.col("hi"), 1).otherwise(0).alias("at_hi"),
        F.floor(F.least(F.greatest("value", F.col("lo")), F.col("hi")) * 100)
        .cast("long")
        .alias("wc"),
    )
    out = clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("at_lo").cast("long").alias("n_clamped_lo"),
        F.sum("at_hi").cast("long").alias("n_clamped_hi"),
        F.sum("wc").cast("long").alias("winsorized_cents"),
    )
    return out.select(
        "event_type",
        "n",
        "n_clamped_lo",
        "n_clamped_hi",
        "winsorized_cents",
        F.expr("winsorized_cents div n").alias("mean_cents"),
    ).orderBy("event_type")


@query(
    "xb8_skew_diagnosis",
    """
    WITH keyed AS (
        SELECT event_type AS join_key, CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY event_type
    ),
    win AS (
        SELECT join_key, n_rows,
               CAST(sum(n_rows) OVER () AS BIGINT) AS total,
               CAST(count(*) OVER () AS BIGINT) AS n_keys
        FROM keyed
    )
    SELECT join_key, n_rows,
           (n_rows * 1000000 // total) / 1e6 AS row_share,
           (n_rows * n_keys * 1000000 // total) / 1e6 AS skew_factor,
           CAST((n_rows + 99999) // 100000 AS BIGINT) AS suggested_salts
    FROM win
    ORDER BY n_rows DESC, join_key
    """,
    "JOIN-KEY SKEW DIAGNOSIS (the operational pre-flight before a big "
    "shuffle): per-key row counts, each key's row share and skew "
    "factor (count / mean-count, i.e. n*k/total) as integer-quantized "
    "ratios, and a suggested salt fan-out ceil(n/100k target rows per "
    "reducer) in pure integer arithmetic. One map-side-combinable agg, "
    "then corpus totals as an UNPARTITIONED WINDOW over the tiny "
    "per-key table (one scan of events — a stats self-join would "
    "re-evaluate the aggregate subtree in the compiled plan); the "
    "readout that tells you whether operators/skew.py's salted join "
    "is worth its replication cost BEFORE paying for a stalled reducer",
    ("events", "performance", "analytics"),
)
def xb8_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    keyed = t["events"].groupBy(F.col("event_type").alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = W.partitionBy()
    return (
        keyed.select(
            "join_key",
            "n_rows",
            F.sum("n_rows").over(w).alias("total"),
            F.count(F.lit(1)).over(w).alias("n_keys"),
        )
        .select(
            "join_key",
            "n_rows",
            (F.expr("(n_rows * 1000000) div total") / 1e6).alias("row_share"),
            (F.expr("(n_rows * n_keys * 1000000) div total") / 1e6).alias("skew_factor"),
            F.expr("(n_rows + 99999) div 100000").alias("suggested_salts"),
        )
        .orderBy(F.col("n_rows").desc(), "join_key")
    )


@query(
    "xdf_market_share_q8",
    """
    WITH rev AS (
        SELECT year(o.o_orderdate) AS yr,
               ns.n_name AS supp_nation,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ),
    nat AS (
        SELECT yr, supp_nation, CAST(sum(cents) AS BIGINT) AS rev_cents
        FROM rev GROUP BY yr, supp_nation
    ),
    win AS (
        SELECT yr, supp_nation, rev_cents,
               CAST(sum(rev_cents) OVER (PARTITION BY yr) AS BIGINT) AS yr_cents
        FROM nat
    )
    SELECT yr, supp_nation, rev_cents,
           (rev_cents * 1000000 // yr_cents) / 1e6 AS share
    FROM win
    ORDER BY yr, supp_nation
    """,
    "NATIONAL MARKET SHARE (the TPC-H Q8 shape — the deepest join in "
    "the relational surface): an 8-table snowflake join (lineitem -> "
    "orders -> customer -> nation -> region on the demand side; part "
    "filter; supplier -> nation on the supply side), per-row revenue "
    "floored to integer cents AT SOURCE so every rollup is exact, "
    "supplier-nation revenue share per year as integer-quantized "
    "ratios computed by a PARTITION BY yr window over the grouped "
    "result (a yearly-total self-join would re-evaluate the whole "
    "8-table subtree in the compiled plan). Catalyst broadcasts every "
    "dimension (region/nation/part/supplier/customer at this SF) so "
    "the fact table shuffles only for the orderkey join — the plan "
    "shape that holds when lineitem is 100 TB",
    ("relational", "join", "analytics"),
)
def xdf_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["nation"].select(
                F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
            ),
            F.col("c_nationkey") == F.col("nc_key"),
        )
        .join(
            t["region"].filter(F.col("r_name") == "EUROPE"),
            F.col("nc_region") == F.col("r_regionkey"),
        )
        .join(
            t["part"].filter(F.col("p_type") == "ECONOMY"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["nation"].select(
                F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
            ),
            F.col("s_nationkey") == F.col("ns_key"),
        )
        .select(
            F.year("o_orderdate").alias("yr"),
            "supp_nation",
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    from pyspark.sql.window import Window as W

    nat = rev.groupBy("yr", "supp_nation").agg(F.sum("cents").cast("long").alias("rev_cents"))
    return (
        nat.withColumn("yr_cents", F.sum("rev_cents").over(W.partitionBy("yr")))
        .select(
            "yr",
            "supp_nation",
            "rev_cents",
            (F.expr("(rev_cents * 1000000) div yr_cents") / 1e6).alias("share"),
        )
        .orderBy("yr", "supp_nation")
    )


@query(
    "xca_constraint_audit",
    """
    WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
               CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
               CAST(sum(CASE WHEN l_tax >= 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_tax,
               CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_price,
               CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS BIGINT) AS v_rflag,
               CAST(sum(CASE WHEN l_linestatus IN ('O','F') THEN 0 ELSE 1 END) AS BIGINT) AS v_status,
               CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_ship,
               CAST(sum(CASE WHEN l_orderkey > 0 AND l_partkey > 0 AND l_suppkey > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_keys
        FROM lineitem
    )
    SELECT r.rule, a.n AS n_rows, r.n_violations,
           ((a.n - r.n_violations) * 1000000 // a.n) / 1e6 AS pass_ratio
    FROM agg a CROSS JOIN LATERAL (VALUES
        ('key_positive', a.v_keys),
        ('discount_in_range', a.v_disc),
        ('linestatus_domain', a.v_status),
        ('price_positive', a.v_price),
        ('quantity_in_range', a.v_qty),
        ('returnflag_domain', a.v_rflag),
        ('shipdate_not_null', a.v_ship),
        ('tax_nonnegative', a.v_tax)
    ) AS r(rule, n_violations)
    ORDER BY r.rule
    """,
    "DECLARATIVE CONSTRAINT AUDIT (the Deequ-style data-quality gate a "
    "pipeline runs before publishing a table): eight rules -- range, "
    "domain-membership, positivity, not-null, key sanity -- evaluated "
    "as conditional sums in ONE aggregation over ONE scan (never a "
    "job per rule), then unpivoted to a rule/violations/pass-ratio "
    "report via an in-plan stack spine (the xb1 profiler's shape). "
    "Range compares are stored-double vs literal -- one IEEE compare, "
    "identical on both engines; ratios integer-quantized. At 100 TB "
    "this is a single map-side-combinable pass at scan speed",
    ("lineitem", "quality"),
)
def xca_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.analytics import constraint_audit

    t = _t(spark, sf_dir)
    return constraint_audit(
        t["lineitem"],
        {
            "key_positive": (F.col("l_orderkey") > 0)
            & (F.col("l_partkey") > 0)
            & (F.col("l_suppkey") > 0),
            "discount_in_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
            "linestatus_domain": F.col("l_linestatus").isin("O", "F"),
            "price_positive": F.col("l_extendedprice") > 0,
            "quantity_in_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
            "tax_nonnegative": F.col("l_tax") >= 0,
        },
    )


@query(
    "xcb_event_transitions",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT from_type, to_type, n_transitions,
           (n_transitions * 1000000 //
            CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)) / 1e6 AS prob
    FROM pairs
    ORDER BY from_type, to_type
    """,
    "EVENT TRANSITION MATRIX (first-order Markov chain of user "
    "journeys -- the input to next-action prediction and anomaly "
    "detection): per-user event streams ordered by the UNIQUE "
    "(ts, event_id) key (ts alone can tie), lag() pairs each event "
    "with its predecessor, transition counts per (from, to), and "
    "row-stochastic probabilities via a PARTITION BY from_type window "
    "over the k*k matrix (never a totals self-join). One user-keyed "
    "window shuffle + one pair aggregation; the matrix is "
    "|event_types|^2 rows regardless of corpus size",
    ("events", "analytics", "sessionization"),
)
def xcb_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.analytics import transition_matrix

    t = _t(spark, sf_dir)
    return (
        transition_matrix(t["events"], "user_id", ["ts", "event_id"], "event_type")
        .select(
            F.col("from_state").alias("from_type"),
            F.col("to_state").alias("to_type"),
            "n_transitions",
            "prob",
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "xcc_open_orders_curve",
    """
    WITH span AS (
        SELECT CAST(o.o_orderdate AS DATE) AS od,
               CAST(max(l.l_shipdate) AS DATE) AS cd
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    delta AS (
        SELECT od AS day, 1 AS d FROM span
        UNION ALL
        SELECT greatest(od, cd + 1), -1 FROM span
    ),
    daily AS (
        SELECT day, CAST(sum(d) AS BIGINT) AS net_change FROM delta GROUP BY day
    )
    SELECT day, net_change,
           CAST(sum(net_change) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
    FROM daily ORDER BY day
    """,
    "OPEN-ORDER OCCUPANCY CURVE (sweep-line interval counting -- how "
    "many orders are in flight each day, the shape behind active-"
    "sessions and concurrency dashboards): each order's lifetime spans "
    "orderdate .. last lineitem shipdate (orders with no lineitems "
    "have no interval -- inner join semantics, documented; inverted "
    "spans, present in the r8 fixtures, clamp to a same-day zero-net "
    "pair on BOTH engines so the curve never dips on bad data), every "
    "interval becomes a +1 open-day / -1 close-day+1 delta pair, "
    "daily net change by aggregation, and the curve as one running "
    "sum over the BOUNDED day axis (~2500 rows whatever the corpus "
    "size). Never a day-x-interval range join: the sweep line is "
    "O(rows) map work + one date-keyed agg. DATE-cast on both engines "
    "(timestamps at midnight; the date_trunc canonicalization trap)",
    ("orders", "lineitem", "timeseries", "analytics"),
)
def xcc_open_orders_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.analytics import interval_occupancy

    t = _t(spark, sf_dir)
    last_ship = t["lineitem"].groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship")
    )
    span = (
        t["orders"]
        .join(last_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderdate").cast("date").alias("od"),
            F.col("max_ship").cast("date").alias("cd"),
        )
    )
    return (
        interval_occupancy(span, "od", "cd")
        .select("day", "net_change", F.col("occupancy").alias("open_orders"))
        .orderBy("day")
    )


@query(
    "xcd_last_touch_attribution",
    """
    WITH ordered AS (
        SELECT event_type, value, ts,
               last_value(CASE WHEN event_type IN ('click','view','signup')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS touch_type,
               last_value(CASE WHEN event_type IN ('click','view','signup')
                               THEN ts END IGNORE NULLS)
                   OVER w AS touch_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    purchases AS (
        SELECT CASE WHEN touch_type IS NOT NULL
                     AND date_diff('microseconds', touch_ts, ts) <= 604800000000
                    THEN touch_type ELSE 'none' END AS channel,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM ordered WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM purchases GROUP BY channel ORDER BY channel
    """,
    "LAST-TOUCH ATTRIBUTION (which channel gets credit for each "
    "purchase -- the marketing-analytics staple): per-user streams "
    "ordered by the UNIQUE (ts, event_id) key, the most recent "
    "preceding click/view/signup found by last_value IGNORE NULLS "
    "over an unbounded-to-1-preceding frame (two expressions, ONE "
    "window node), credit only within a 7-day lookback compared in "
    "MICROSECONDS (the x81/x82 lesson: second-granularity diffs "
    "disagree across engines), revenue floored to integer cents at "
    "source. One user-keyed window shuffle + one tiny channel agg",
    ("events", "analytics", "sessionization"),
)
def xcd_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.analytics import last_touch_attribution

    t = _t(spark, sf_dir)
    attributed = last_touch_attribution(
        t["events"],
        entity_col="user_id",
        order_cols=["ts", "event_id"],
        ts_col="ts",
        state_col="event_type",
        touch_states=["click", "view", "signup"],
        conversion_state="purchase",
        lookback_micros=604800000000,
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("channel")
    )


@query(
    "xce_segment_trend_ols",
    """
    WITH base AS (
        SELECT event_type,
               CAST(date_diff('day',
                    min(CAST(ts AS DATE)) OVER (PARTITION BY event_type),
                    CAST(ts AS DATE)) AS BIGINT) AS x,
               CAST(floor(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ),
    sums AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM base GROUP BY event_type
    ),
    fit AS (
        SELECT event_type, n,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS den,
               sy, sx
        FROM sums
    ),
    slope AS (
        SELECT event_type, n, sy, sx, den,
               CASE WHEN den = 0 THEN NULL
                    ELSE CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1 ELSE 0 END END
                   AS slope_sign,
               CASE WHEN den = 0 THEN NULL ELSE abs(num) * 1000 // den END
                   AS slope_mag_milli
        FROM fit
    )
    SELECT event_type, n, slope_sign, slope_mag_milli,
           CASE WHEN slope_sign IS NULL THEN NULL
                WHEN sy * 1000 - slope_sign * slope_mag_milli * sx < 0 THEN -1
                WHEN sy * 1000 - slope_sign * slope_mag_milli * sx > 0 THEN 1
                ELSE 0 END AS intercept_sign,
           CASE WHEN slope_sign IS NULL THEN NULL
                ELSE abs(sy * 1000 - slope_sign * slope_mag_milli * sx) // n END
               AS intercept_mag_milli
    FROM slope ORDER BY event_type
    """,
    "PER-SEGMENT TREND VIA EXACT CLOSED-FORM OLS (is this metric "
    "rising? -- per event_type, regress value on days-since-segment-"
    "start): x anchored to each segment's own min DATE by a window "
    "(regeneration-proof -- magnitudes track the data span, never "
    "calendar distance), y floored to integer cents at source, so "
    "every OLS sum (n, sx, sy, sxy, sxx) is an exact BIGINT and the "
    "slope num/den are exact integers. Slope and intercept are "
    "reported MAGNITUDE + SIGN (the x73 lesson, refined by the r8 "
    "engine-pair probe: BIGINT // truncates like Spark div, but "
    "Python cross-checks floor and DuckDB // silently degenerates to "
    "plain division on non-integer operands -- so keep quotient "
    "operands integral AND non-negative), denominator-zero "
    "CASE-guarded. The "
    "event_type window partitioning feeds the same-keyed groupBy "
    "exchange-free. Magnitude budget: |num|*1000 < 2^63 holds "
    "through sf0.1 x 100 with a month-scale span",
    ("events", "analytics", "ml"),
)
def xce_segment_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    base = (
        t["events"]
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        .select(
            "event_type",
            F.datediff(
                F.col("d"), F.min("d").over(W.partitionBy("event_type"))
            ).cast("long").alias("x"),
            "y",
        )
    )
    sums = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    fit = sums.select(
        "event_type",
        "n",
        "sy",
        "sx",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    slope = fit.select(
        "event_type",
        "n",
        "sy",
        "sx",
        F.when(F.col("den") == 0, F.lit(None).cast("long"))
        .otherwise(F.signum("num").cast("long"))
        .alias("slope_sign"),
        F.when(F.col("den") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(abs(num) * 1000) div den"))
        .alias("slope_mag_milli"),
    )
    in_num = F.col("sy") * 1000 - F.col("slope_sign") * F.col("slope_mag_milli") * F.col("sx")
    return slope.select(
        "event_type",
        "n",
        "slope_sign",
        "slope_mag_milli",
        F.when(F.col("slope_sign").isNull(), F.lit(None).cast("long"))
        .otherwise(F.signum(in_num).cast("long"))
        .alias("intercept_sign"),
        F.when(F.col("slope_sign").isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr(
            "abs(sy * 1000 - slope_sign * slope_mag_milli * sx) div n"
        ))
        .alias("intercept_mag_milli"),
    ).orderBy("event_type")


@query(
    "xcf_delete_cascade_audit",
    """
    WITH del_cust AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    del_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM customer
    ),
    o AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM del_cust)
                             THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM orders
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
                             THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM lineitem
    )
    SELECT 'customer' AS table_name, n AS rows_total, d AS rows_deleted,
           n - d AS rows_retained FROM c
    UNION ALL
    SELECT 'lineitem', n, d, n - d FROM l
    UNION ALL
    SELECT 'orders', n, d, n - d FROM o
    ORDER BY table_name
    """,
    "ERASURE-CASCADE IMPACT AUDIT (the dry run a GDPR right-to-be-"
    "forgotten pipeline reports before deleting): an erasure set of "
    "customers (hash-decided c_custkey % 97 -- deterministic, "
    "RNG-free) cascades customer -> orders -> lineitem through "
    "left-mark joins; each table reports total/deleted/retained in "
    "ONE scan (the deletion flag rides a broadcast mark join, never a "
    "second counting scan). At 100 TB the erasure key set stays "
    "key-only and broadcast-sized at each hop; the fact tables are "
    "scanned once each and never shuffle",
    ("customer", "orders", "lineitem", "pipeline"),
)
def xcf_delete_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    del_cust = (
        t["customer"]
        .filter(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("dk"), F.lit(1).alias("cm"))
    )
    cust = t["customer"].agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("c_custkey") % 97 == 0, 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    orders_marked = t["orders"].join(
        F.broadcast(del_cust), F.col("o_custkey") == F.col("dk"), "left"
    )
    ords = orders_marked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.coalesce(F.col("cm"), F.lit(0))).cast("long").alias("d"),
    )
    del_orders = (
        orders_marked.filter(F.col("cm").isNotNull())
        .select(F.col("o_orderkey").alias("dok"), F.lit(1).alias("om"))
    )
    li = (
        t["lineitem"]
        .join(F.broadcast(del_orders), F.col("l_orderkey") == F.col("dok"), "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce(F.col("om"), F.lit(0))).cast("long").alias("d"),
        )
    )

    def row(name, agg):
        return agg.select(
            F.lit(name).alias("table_name"),
            F.col("n").alias("rows_total"),
            F.col("d").alias("rows_deleted"),
            (F.col("n") - F.col("d")).alias("rows_retained"),
        )

    return (
        row("customer", cust)
        .unionAll(row("lineitem", li))
        .unionAll(row("orders", ords))
        .orderBy("table_name")
    )


@query(
    "xdg_waiting_orders_blame",
    """
    WITH li AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
    "SOLE-LATE-SUPPLIER BLAME (the TPC-H Q21 shape — the hardest "
    "correlated-subquery pattern in the relational surface: EXISTS + "
    "NOT EXISTS both correlated to the same fact table): suppliers "
    "whose lineitem shipped >90 days after the order date on "
    "finished multi-supplier orders where NO OTHER supplier was late. "
    "The Spark side compiles the double correlation into one "
    "(orderkey, suppkey) pre-aggregation + an orderkey window "
    "(distinct-supplier and late-supplier counts) that RIDES the "
    "groupBy's partitioning exchange-free — no self-join, the fact "
    "table shuffles once; the DuckDB oracle runs the textbook "
    "EXISTS/NOT EXISTS formulation, so the hash-match proves the "
    "rewrite, not just the arithmetic",
    ("lineitem", "orders", "supplier", "relational", "join"),
)
def xdg_waiting_orders_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    li = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1)
            .otherwise(0)
            .alias("late"),
        )
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").cast("long").alias("n_late_rows"),
        F.max("late").alias("supp_late"),
    )
    w = W.partitionBy("l_orderkey")
    blame = (
        per_os.select(
            "l_suppkey",
            "n_late_rows",
            "supp_late",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("supp_late").over(w).alias("n_late_supp"),
        )
        .filter(
            (F.col("supp_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.sum("n_late_rows").cast("long").alias("numwait"))
    )
    return (
        blame.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "xch_copurchase_affinity",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    tot AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
    ),
    cnt AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.n_ab,
           (p.n_ab * t.n_orders * 1000000 // (ca.n * cb.n)) / 1e6 AS lift
    FROM pairs p
    CROSS JOIN tot t
    JOIN cnt ca ON ca.l_partkey = p.part_a
    JOIN cnt cb ON cb.l_partkey = p.part_b
    ORDER BY p.part_a, p.part_b
    """,
    "MARKET-BASKET CO-PURCHASE AFFINITY (association mining's support "
    "+ lift, the recommender bootstrap): distinct (order, part) items, "
    "within-order self-pairing under part_a < part_b (candidate pairs "
    "bounded by items-per-order choose 2, ~6 per order — NEVER a "
    "cross-catalog pairing), min-support-2 prune at the aggregation, "
    "lift as the integer-quantized ratio n_ab*n_orders/(n_a*n_b) "
    "(exact BIGINT products; magnitudes < 2^63 through sf1). Item "
    "frequencies are |parts|-bounded and broadcast back; the corpus "
    "total rides a one-row broadcast cross join. The within-order "
    "self-join co-partitions on orderkey: one shuffle, no skew "
    "(orders are bounded-size baskets)",
    ("lineitem", "analytics", "ml"),
)
def xch_copurchase_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.analytics import basket_affinity

    t = _t(spark, sf_dir)
    return (
        basket_affinity(t["lineitem"], "l_orderkey", "l_partkey", min_support=2)
        .select(
            F.col("item_a").alias("part_a"),
            F.col("item_b").alias("part_b"),
            "n_ab",
            "lift",
        )
        .orderBy("part_a", "part_b")
    )


@query(
    "xci_stickiness_dau_wau",
    """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY day
    ),
    span AS (
        SELECT a.user_id, a.day + CAST(i.i AS INTEGER) AS day
        FROM active a, unnest(range(0, 7)) AS i(i)
    ),
    wau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM span GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           (d.dau * 1000000 // w.wau) / 1e6 AS stickiness
    FROM dau d JOIN wau w USING (day)
    ORDER BY d.day
    """,
    "DAU/WAU STICKINESS (the engagement ratio every product dashboard "
    "tracks): per-day distinct actives, trailing-7-day distinct "
    "actives computed by FANNING each (user, active day) out to the 7 "
    "days it keeps the user 'weekly active' (bounded 7x explode + "
    "dedup-count — the scale-correct replacement for a day-by-day "
    "range join, O(7 rows) map work instead of O(days x rows) "
    "pairing), stickiness as the integer-quantized exact ratio. Days "
    "with DAU but no WAU cannot exist (day 0 of the fan-out covers "
    "itself); output keyed by day only where both sides defined",
    ("events", "analytics", "timeseries"),
)
def xci_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    active = t["events"].select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = active.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    span = active.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day"),
    )
    wau = span.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            (F.expr("(dau * 1000000) div wau") / 1e6).alias("stickiness"),
        )
        .orderBy("day")
    )


# Referential-integrity relationships audited by xcj: (label, child
# table, fk column, parent table, pk column). Labels sort the output.
_RI_RELS = [
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def _ri_block_sql(rel: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{rel}' AS relationship,
           CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_child_rows,
           CAST(count(cnt) AS BIGINT) AS n_distinct_fk,
           CAST(count(CASE WHEN p IS NULL THEN cnt END) AS BIGINT) AS n_orphan_fk,
           CAST(coalesce(sum(CASE WHEN p IS NULL THEN cnt END), 0) AS BIGINT) AS n_orphan_rows,
           CAST(count(p) AS BIGINT) AS n_parents,
           CAST(count(CASE WHEN cnt IS NULL THEN p END) AS BIGINT) AS n_unref_parents,
           CASE WHEN count(cnt) = 0 THEN 0.0
                ELSE ((count(cnt) - count(CASE WHEN p IS NULL THEN cnt END)) * 1000000
                      // count(cnt)) / 1e6 END AS fk_coverage
    FROM (SELECT {fk} AS k, count(*) AS cnt FROM {child} GROUP BY 1) f
    FULL JOIN (SELECT {pk} AS k, 1 AS p FROM {parent}) pr USING (k)
    """


@query(
    "xcj_referential_orphans",
    "\nUNION ALL\n".join(_ri_block_sql(*r) for r in _RI_RELS)
    + "\nORDER BY relationship",
    "REFERENTIAL-INTEGRITY ORPHAN AUDIT over six FK relationships, "
    "bidirectional: orphan FKs (child values with no parent row -- the "
    "classic anti-join check) AND unreferenced parents (dimension rows "
    "no fact ever touches -- the reverse gap a one-way check misses). "
    "Scale shape: each relationship is ONE groupBy(fk) -- collapsing "
    "child rows to (key, count) BEFORE the join, so the join carries "
    "distinct keys, never fact rows -- then ONE full-outer join with "
    "the parent key set and ONE aggregation computing all six counts; "
    "never a pass per metric. NULL-keyed child rows fall out as "
    "orphans on both engines (full-join equality never matches NULL). "
    "Coverage ratio integer-quantized; zero denominators CASE-guarded "
    "(ANSI Spark errors on x/0 where DuckDB yields inf)",
    ("lineitem", "orders", "customer", "quality", "join"),
)
def xcj_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    def one(rel: str, child: str, fk: str, parent: str, pk: str) -> DataFrame:
        fkc = t[child].groupBy(F.col(fk).alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
        pks = t[parent].select(F.col(pk).alias("k"), F.lit(1).alias("p"))
        orphan_cnt = F.when(F.col("p").isNull(), F.col("cnt"))
        agg = (
            fkc.join(pks, "k", "full_outer")
            .agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_child_rows"),
                F.count("cnt").cast("long").alias("n_distinct_fk"),
                F.count(orphan_cnt).cast("long").alias("n_orphan_fk"),
                F.coalesce(F.sum(orphan_cnt), F.lit(0)).cast("long").alias("n_orphan_rows"),
                F.count("p").cast("long").alias("n_parents"),
                F.count(F.when(F.col("cnt").isNull(), F.col("p")))
                .cast("long")
                .alias("n_unref_parents"),
            )
        )
        return agg.select(
            F.lit(rel).alias("relationship"),
            "n_child_rows",
            "n_distinct_fk",
            "n_orphan_fk",
            "n_orphan_rows",
            "n_parents",
            "n_unref_parents",
            F.when(F.col("n_distinct_fk") == 0, F.lit(0.0))
            .otherwise(
                F.expr(
                    "((n_distinct_fk - n_orphan_fk) * 1000000) div n_distinct_fk"
                )
                / 1e6
            )
            .alias("fk_coverage"),
        )

    out = one(*_RI_RELS[0])
    for rel in _RI_RELS[1:]:
        out = out.union(one(*rel))
    return out.orderBy("relationship")


@query(
    "xck_feature_hashing",
    """
    WITH feats AS (
        SELECT f.feature
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        CROSS JOIN LATERAL (VALUES
            ('prio=' || o.o_orderpriority),
            ('seg=' || c.c_mktsegment),
            ('status=' || o.o_orderstatus),
            ('month=' || CAST(month(o.o_orderdate) AS VARCHAR))
        ) AS f(feature)
    ),
    hashed AS (
        SELECT feature,
               ('0x' || substr(md5('fh:' || feature), 1, 15))::BIGINT % 64 AS slot,
               count(*) AS n_rows
        FROM feats GROUP BY 1
    )
    SELECT slot,
           CAST(count(*) AS BIGINT) AS n_features,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           array_to_string(list_sort(list(feature)), '|') AS features
    FROM hashed GROUP BY slot ORDER BY slot
    """,
    "PORTABLE FEATURE HASHING (the 'hashing trick' every large-scale "
    "learner uses to map unbounded categorical vocab into a fixed "
    "model dimension without a trained dictionary): four categorical "
    "features per order (priority, market segment, status, order "
    "month) hashed into 64 slots with the engine's portable 60-bit "
    "md5 hash, reported as the slot->features export with the "
    "collision audit (features per slot, row mass per slot) a feature "
    "store publishes alongside the model. Scale shape: the feature "
    "fan-out is a map-side 4x explode, the per-feature count is one "
    "map-side-combinable groupBy over a vocab-bounded key set, and "
    "the slot rollup groups 64 keys -- no fact-row shuffle anywhere "
    "after the dimension join (AQE broadcasts customer). The hash is "
    "bit-identical Spark vs DuckDB, so the oracle checks the exact "
    "slot assignment, not just the shape",
    ("orders", "customer", "feature", "text"),
)
def xck_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    feats = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.explode(
                F.array(
                    F.concat(F.lit("prio="), F.col("o_orderpriority")),
                    F.concat(F.lit("seg="), F.col("c_mktsegment")),
                    F.concat(F.lit("status="), F.col("o_orderstatus")),
                    F.concat(
                        F.lit("month="),
                        F.month("o_orderdate").cast("string"),
                    ),
                )
            ).alias("feature")
        )
    )
    hashed = feats.groupBy("feature").agg(F.count(F.lit(1)).alias("n_rows"))
    hashed = hashed.select(
        "feature",
        "n_rows",
        F.pmod(dedup_ops.portable_hash(F.col("feature"), F.lit("fh")), F.lit(64)).alias(
            "slot"
        ),
    )
    return (
        hashed.groupBy("slot")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.array_join(F.array_sort(F.collect_list("feature")), "|").alias("features"),
        )
        .orderBy("slot")
    )


# Integer inverse-CDF thresholds for Poisson(1) on u in [0, 1e6):
# weight k iff u >= T[k-1] and u < T[k] (u >= T[-1] -> 8). Computed once
# from exp(-1) offline; integer literals keep both engines bit-agreed.
_POISSON1_CDF = [367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990]


def _poisson_case_sql(u: str) -> str:
    whens = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POISSON1_CDF)
    )
    return f"CASE {whens} ELSE {len(_POISSON1_CDF)} END"


@query(
    "xds_bootstrap_ci",
    f"""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               ('0x' || substr(md5('bs1:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                   % 1000000 AS h1,
               ('0x' || substr(md5('bs2:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                   % 1000000 AS h2
        FROM orders
    ),
    fan AS (
        SELECT c.cents, CAST(i.rep AS BIGINT) AS rep,
               (c.h1 + CAST(i.rep AS BIGINT) * c.h2) % 1000000 AS u
        FROM cents c, unnest(range(0, 64)) AS i(rep)
    ),
    w AS (
        SELECT rep, cents, {_poisson_case_sql("u")} AS wt FROM fan
    ),
    reps AS (
        SELECT rep,
               CAST(sum(wt) AS BIGINT) AS n_w,
               CAST(sum(wt * cents) AS BIGINT) AS sum_cents
        FROM w GROUP BY rep
    ),
    means AS (
        SELECT (sum_cents * 10000 // n_w) / 1e6 AS mean_price,
               row_number() OVER (ORDER BY sum_cents * 10000 // n_w, rep) AS rn
        FROM reps WHERE n_w > 0
    ),
    whole AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               (CAST(sum(cents) AS BIGINT) * 10000
                // CAST(count(*) AS BIGINT)) / 1e6 AS mean_price
        FROM cents
    )
    SELECT f.n_orders, f.mean_price,
           CAST(64 AS BIGINT) AS n_replicates,
           max(CASE WHEN m.rn = 2 THEN m.mean_price END) AS ci_lo,
           max(CASE WHEN m.rn = 63 THEN m.mean_price END) AS ci_hi
    FROM means m CROSS JOIN whole f
    GROUP BY f.n_orders, f.mean_price
    """,
    "POISSON BOOTSTRAP confidence interval for the mean order price -- "
    "the resampling method that actually works at 100 TB (classic "
    "bootstrap needs B full resamples; Poisson bootstrap folds all B "
    "replicates into ONE pass: each row contributes a hash-decided "
    "Poisson(1) weight per replicate, so the data is scanned once and "
    "the shuffle is 64 replicate keys, map-side combinable). The 64 "
    "per-row draws come from TWO md5 hashes via the pairwise-"
    "independent affine family (h1 + rep*h2) mod 1e6 -- 32x less "
    "hashing than hash-per-replicate (measured 10.7 s -> one-hash-"
    "bound at sf0.1); weights are deterministic integer inverse-CDF "
    "thresholds, no RNG, prices fixed to integer cents at source, "
    "replicate means integer-quantized, and the CI bounds are the "
    "2nd/63rd order statistics of the 64 replicate means (~95%). "
    "Row_number over the quantized mean with replicate-id tiebreak "
    "keeps the order statistic unique on both engines",
    ("orders", "statistics", "sampling"),
)
def xds_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    from pyspark.sql import Window as W

    key = F.col("o_orderkey").cast("string")
    cents = t["orders"].select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.pmod(dedup_ops.portable_hash(key, F.lit("bs1")), F.lit(1_000_000)).alias("h1"),
        F.pmod(dedup_ops.portable_hash(key, F.lit("bs2")), F.lit(1_000_000)).alias("h2"),
    )
    fan = (
        cents.select(
            "cents", "h1", "h2", F.explode(F.expr("sequence(0, 63)")).alias("rep")
        )
        .withColumn("rep", F.col("rep").cast("long"))
        .withColumn("u", F.pmod(F.col("h1") + F.col("rep") * F.col("h2"), F.lit(1_000_000)))
    )
    wt = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        wt = F.when(F.col("u") < _POISSON1_CDF[k], F.lit(k)).otherwise(wt)
    w = fan.select("rep", "cents", wt.alias("wt"))
    reps = w.groupBy("rep").agg(
        F.sum("wt").cast("long").alias("n_w"),
        F.sum(F.col("wt") * F.col("cents")).cast("long").alias("sum_cents"),
    )
    means = (
        reps.filter(F.col("n_w") > 0)
        .select(
            (F.expr("(sum_cents * 10000) div n_w") / 1e6).alias("rep_mean"),
            F.row_number()
            .over(W.orderBy(F.expr("(sum_cents * 10000) div n_w"), F.col("rep")))
            .alias("rn"),
        )
    )
    whole = cents.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (
            F.expr("(CAST(sum(cents) AS BIGINT) * 10000) div count(*)") / 1e6
        ).alias("mean_price"),
    )
    return (
        means.crossJoin(F.broadcast(whole))
        .groupBy("n_orders", "mean_price")
        .agg(
            F.lit(64).cast("long").alias("n_replicates"),
            F.max(F.when(F.col("rn") == 2, F.col("rep_mean"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == 63, F.col("rep_mean"))).alias("ci_hi"),
        )
    )


@query(
    "xcn_weighted_median",
    """
    WITH d AS (
        SELECT lang, n_chars, doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS tokens
        FROM documents
    ),
    w AS (
        SELECT lang, n_chars,
               sum(tokens) OVER (PARTITION BY lang
                                 ORDER BY n_chars, doc_id) AS cumw,
               sum(tokens) OVER (PARTITION BY lang) AS total_w
        FROM d
    )
    SELECT lang,
           CAST(max(total_w) AS BIGINT) AS total_tokens,
           CAST(min(CASE WHEN 2 * cumw >= total_w THEN n_chars END) AS BIGINT)
               AS wmedian_nchars
    FROM w GROUP BY lang ORDER BY lang
    """,
    "TOKEN-WEIGHTED MEDIAN document length per language -- the "
    "statistic that matters when you care about token MASS, not doc "
    "count (half the corpus tokens sit in docs at or below it; a "
    "plain median is blind to the giant-doc tail). Exact via the "
    "cumulative-weight definition: per-language running token sum "
    "over the unique (n_chars, doc_id) order, weighted median = "
    "smallest value whose cumulative weight reaches half the total "
    "(lower weighted median, integer weights so the 2*cumw >= total "
    "test is exact). Scale shape: one scan, ONE hash partition by "
    "lang shared by both window frames AND the final same-keyed "
    "groupBy (exchange-free after the window), no join",
    ("documents", "statistics", "quantile", "text"),
)
def xcn_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = _t(spark, sf_dir)
    d = t["documents"].select(
        "lang",
        "n_chars",
        "doc_id",
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("tokens"),
    )
    w = d.select(
        "lang",
        "n_chars",
        F.sum("tokens")
        .over(W.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("cumw"),
        F.sum("tokens").over(W.partitionBy("lang")).alias("total_w"),
    )
    return (
        w.groupBy("lang")
        .agg(
            F.max("total_w").cast("long").alias("total_tokens"),
            F.min(F.when(2 * F.col("cumw") >= F.col("total_w"), F.col("n_chars")))
            .cast("long")
            .alias("wmedian_nchars"),
        )
        .orderBy("lang")
    )


@query(
    "xco_rank_fusion",
    """
    WITH tf AS (
        SELECT doc_id,
               len(text) - len(replace(text, 'data', '')) AS hits
        FROM documents
    ),
    top_a AS (
        SELECT doc_id, hits FROM tf WHERE hits > 0
        ORDER BY hits DESC, doc_id LIMIT 100
    ),
    rank_a AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY hits DESC, doc_id) AS ra
        FROM top_a
    ),
    score AS (
        SELECT vec_id,
               embedding[1] / sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS s
        FROM embeddings
    ),
    top_b AS (
        SELECT vec_id, s FROM score ORDER BY s DESC, vec_id LIMIT 100
    ),
    rank_b AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY s DESC, vec_id) AS rb
        FROM top_b
    ),
    fused AS (
        SELECT coalesce(a.doc_id, b.vec_id) AS doc_id,
               CAST(coalesce(a.ra, 0) AS BIGINT) AS rank_text,
               CAST(coalesce(b.rb, 0) AS BIGINT) AS rank_vec,
               CAST(coalesce(1000000 // (60 + a.ra), 0)
                    + coalesce(1000000 // (60 + b.rb), 0) AS BIGINT) AS rrf
        FROM rank_a a FULL JOIN rank_b b ON a.doc_id = b.vec_id
    )
    SELECT doc_id, rank_text, rank_vec, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    "RECIPROCAL RANK FUSION (the standard way hybrid search merges a "
    "lexical and a vector ranking without score calibration): list A "
    "= docs ranked by occurrences of the term 'data' (substring-count "
    "tf), list B = embeddings ranked by cosine against the axis-0 "
    "unit query; both lists cut to top-100 by a DISTRIBUTED top-k "
    "(TakeOrderedAndProject -- per-partition heaps, never a global "
    "sort), ranks assigned by a window over the already-bounded 100 "
    "rows (the unpartitioned window is k-bounded by construction, "
    "not data-sized), fused full-outer with INTEGER RRF "
    "1e6//(60+rank) so the fusion arithmetic is engine-exact, absent "
    "ranks sentineled 0. Top-20 by (rrf, id)",
    ("documents", "embeddings", "similarity", "search"),
)
def xco_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = _t(spark, sf_dir)
    tf = t["documents"].select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", "data", ""))
        ).alias("hits"),
    )
    top_a = tf.filter(F.col("hits") > 0).orderBy(F.desc("hits"), F.asc("doc_id")).limit(100)
    rank_a = top_a.select(
        "doc_id",
        F.row_number().over(W.orderBy(F.desc("hits"), F.asc("doc_id"))).alias("ra"),
    )
    score = t["embeddings"].select(
        "vec_id",
        (
            F.element_at("embedding", 1).cast("double")
            / F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            )
        ).alias("s"),
    )
    top_b = score.orderBy(F.desc("s"), F.asc("vec_id")).limit(100)
    rank_b = top_b.select(
        "vec_id",
        F.row_number().over(W.orderBy(F.desc("s"), F.asc("vec_id"))).alias("rb"),
    )
    fused = rank_a.join(rank_b, rank_a["doc_id"] == rank_b["vec_id"], "full_outer").select(
        F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
        F.coalesce(F.col("ra"), F.lit(0)).cast("long").alias("rank_text"),
        F.coalesce(F.col("rb"), F.lit(0)).cast("long").alias("rank_vec"),
        (
            F.coalesce(F.expr("1000000 div (60 + ra)"), F.lit(0))
            + F.coalesce(F.expr("1000000 div (60 + rb)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(20)


@query(
    "xcp_vocab_growth",
    """
    WITH toks AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS n_tokens
        FROM documents
    ),
    words AS (
        SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text),
                   '\\s+'), x -> x <> '')) AS w
        FROM documents
    ),
    first_seen AS (
        SELECT w, CAST(min(doc_id) AS BIGINT) AS first_doc FROM words GROUP BY w
    ),
    newv AS (
        SELECT first_doc // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_new
        FROM first_seen GROUP BY 1
    ),
    tok_b AS (
        SELECT doc_id // 50 AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM toks GROUP BY 1
    )
    SELECT t.bucket, t.n_docs,
           CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY t.bucket) AS BIGINT)
               AS cum_vocab
    FROM tok_b t LEFT JOIN newv n ON n.bucket = t.bucket
    ORDER BY t.bucket
    """,
    "VOCABULARY GROWTH CURVE (Heaps-law saturation audit -- the "
    "corpus-diversity readout that tells you whether the next chunk "
    "of data still contributes new vocabulary or just repeats the "
    "old): each word's FIRST occurrence via min(doc_id) groupBy (one "
    "vocab-bounded shuffle -- the corpus's token stream never "
    "re-pairs), new-word counts and token mass rolled to 50-doc "
    "buckets, then cumulative token/vocab curves via windows over "
    "the BUCKET axis (bounded by corpus/50 rows, never data-sized). "
    "All integer arithmetic; the left join keeps buckets whose docs "
    "introduce no new words",
    ("documents", "text", "analytics"),
)
def xcp_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = _t(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "").alias(
            "__ws"
        ),
    )
    toks = docs.select("doc_id", F.size("__ws").alias("n_tokens"))
    words = docs.select("doc_id", F.explode("__ws").alias("w"))
    first_seen = words.groupBy("w").agg(F.min("doc_id").cast("long").alias("first_doc"))
    newv = first_seen.groupBy(
        F.expr("first_doc div 50").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    tok_b = toks.groupBy(F.expr("doc_id div 50").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    j = tok_b.join(newv, "bucket", "left")
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return j.select(
        "bucket",
        "n_docs",
        F.sum("n_tokens").over(w_cum).cast("long").alias("cum_tokens"),
        F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w_cum).cast("long").alias("cum_vocab"),
    ).orderBy("bucket")


@query(
    "xcr_token_gini",
    """
    WITH toks AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS BIGINT) AS v
        FROM documents
    ),
    runs AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c, CAST(v * count(*) AS BIGINT) AS mass
        FROM toks GROUP BY v
    ),
    cum AS (
        SELECT v, c, mass,
               CAST(coalesce(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS r0
        FROM runs
    ),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(mass) AS BIGINT) AS total
        FROM runs
    ),
    terms AS (
        SELECT m.v, m.c, m.mass, m.r0, t.n, t.total,
               (9 * t.n) // 10 AS thr,
               m.v * (m.c * m.r0 + (m.c * (m.c + 1)) // 2) AS rank_mass,
               CASE WHEN m.r0 >= (9 * t.n) // 10 THEN m.mass
                    WHEN m.r0 + m.c > (9 * t.n) // 10
                         THEN m.v * (m.r0 + m.c - (9 * t.n) // 10)
                    ELSE 0 END AS top_mass
        FROM cum m CROSS JOIN tot t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(total) AS BIGINT) AS total_tokens,
           CASE WHEN max(n) * max(total) = 0 THEN 0.0
                ELSE ((2 * sum(rank_mass) - (max(n) + 1) * max(total)) * 1000000
                      // (max(n) * max(total))) / 1e6 END AS gini,
           CASE WHEN max(total) = 0 THEN 0.0
                ELSE (sum(top_mass) * 1000000 // max(total)) / 1e6
           END AS top_decile_share
    FROM terms
    """,
    "TOKEN-MASS INEQUALITY (exact Gini + top-decile Lorenz share) "
    "over per-document token counts -- the corpus-concentration "
    "readout behind per-domain caps and length-balanced sampling "
    "(a Gini near 1 means a few giant docs carry the token budget). "
    "Scale-correct EXACT ranking without ranking anything: docs "
    "collapse to (length value, count) runs -- one shuffle bounded by "
    "DISTINCT lengths, never a data-sized global row_number -- and "
    "the Gini rank formula's sum(i*x_i) is computed per run in closed "
    "form (ranks R+1..R+c contribute v*(c*R + c(c+1)/2)), with the "
    "run straddling the 90% rank threshold split arithmetically. "
    "All integer; ratios integer-quantized; zero totals CASE-guarded",
    ("documents", "statistics", "text"),
)
def xcr_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = _t(spark, sf_dir)
    toks = t["documents"].select(
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
        )
        .cast("long")
        .alias("v")
    )
    runs = toks.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        (F.col("v") * F.count(F.lit(1))).cast("long").alias("mass"),
    )
    w_prev = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cum = runs.select(
        "v",
        "c",
        "mass",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).cast("long").alias("r0"),
    )
    tot = runs.agg(
        F.sum("c").cast("long").alias("n"), F.sum("mass").cast("long").alias("total")
    )
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "n",
        "total",
        (
            F.col("v")
            * (F.col("c") * F.col("r0") + F.expr("(c * (c + 1)) div 2"))
        ).alias("rank_mass"),
        F.when(F.col("r0") >= F.expr("(9 * n) div 10"), F.col("mass"))
        .when(
            F.col("r0") + F.col("c") > F.expr("(9 * n) div 10"),
            F.col("v") * (F.col("r0") + F.col("c") - F.expr("(9 * n) div 10")),
        )
        .otherwise(F.lit(0))
        .alias("top_mass"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.max("total").cast("long").alias("total_tokens"),
        F.when(F.expr("max(n) * max(total)") == 0, F.lit(0.0))
        .otherwise(
            F.expr(
                "((2 * sum(rank_mass) - (max(n) + 1) * max(total)) * 1000000)"
                " div (max(n) * max(total))"
            )
            / 1e6
        )
        .alias("gini"),
        F.when(F.expr("max(total)") == 0, F.lit(0.0))
        .otherwise(F.expr("(sum(top_mass) * 1000000) div max(total)") / 1e6)
        .alias("top_decile_share"),
    )


# log10(1 + 1/d) to 6dp, d = 1..9 — identical literals on both engines.
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


@query(
    "xcs_benford_audit",
    f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
    exp_t AS (
        SELECT digit, CAST(exp_share AS DOUBLE) AS exp_share FROM (VALUES
            {", ".join(f"({d}, {p})" for d, p in _BENFORD.items())}
        ) AS e(digit, exp_share)
    )
    SELECT e.digit,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n,
           (coalesce(o.n, 0) * 1000000 // t.total) / 1e6 AS obs_share,
           e.exp_share,
           abs((coalesce(o.n, 0) * 1000000 // t.total) / 1e6 - e.exp_share)
               AS deviation
    FROM exp_t e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot t
    ORDER BY e.digit
    """,
    "BENFORD'S-LAW FIRST-DIGIT AUDIT (the forensic data-quality check "
    "for fabricated or synthetically generated numeric columns: "
    "organic multi-scale amounts follow P(d) = log10(1+1/d); uniform "
    "generators don't): first digit extracted through integer-floor + "
    "string head (exact on both engines -- never float log10 of a "
    "stored double), observed shares integer-quantized against the "
    "one-row broadcast total, compared to the 6dp Benford constants "
    "with the deviation as |quantized - literal| (both operands exact "
    "doubles, so the difference is engine-identical). The 9-row "
    "digit spine LEFT JOINs observations so missing digits report 0. "
    "Scale: one scan, one 9-key aggregation, broadcast total",
    ("orders", "quality", "statistics"),
)
def xcs_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    digits = t["orders"].filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("total"))
    exp_t = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD.items()], "digit LONG, exp_share DOUBLE"
    )
    out = (
        exp_t.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            (
                F.expr("(coalesce(n, 0) * 1000000) div total") / 1e6
            ).alias("obs_share"),
            "exp_share",
            F.abs(
                F.expr("(coalesce(n, 0) * 1000000) div total") / 1e6
                - F.col("exp_share")
            ).alias("deviation"),
        )
    )
    return out.orderBy("digit")


@query(
    "xct_survival_km",
    """
    WITH RECURSIVE per_user AS (
        SELECT user_id, min(ts) AS t0,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events GROUP BY user_id
    ),
    durs AS (
        SELECT CASE WHEN tp IS NOT NULL
                     AND date_diff('microsecond', t0, tp) // 86400000000 <= 3
                    THEN date_diff('microsecond', t0, tp) // 86400000000
                    ELSE 3 END AS t,
               CASE WHEN tp IS NOT NULL
                     AND date_diff('microsecond', t0, tp) // 86400000000 <= 3
                    THEN 1 ELSE 0 END AS ev
        FROM per_user
    ),
    steps AS (
        SELECT t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(sum(1 - ev) AS BIGINT) AS c
        FROM durs GROUP BY t
    ),
    idx AS (
        SELECT CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i, t, d, c,
               CAST((SELECT count(*) FROM durs)
                    - coalesce(sum(d + c) OVER (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
        FROM steps
    ),
    km AS (
        SELECT CAST(0 AS BIGINT) AS i, CAST(1000000 AS BIGINT) AS s
        UNION ALL
        SELECT x.i, (km.s * (x.n_risk - x.d)) // x.n_risk
        FROM km JOIN idx x ON x.i = km.i + 1
    )
    SELECT x.t AS t_day, x.n_risk, x.d AS d_events, x.c AS c_censored,
           k.s / 1e6 AS survival
    FROM idx x JOIN km k ON k.i = x.i
    ORDER BY t_day
    """,
    "KAPLAN-MEIER SURVIVAL CURVE for time-to-conversion (first event "
    "-> first purchase per user, administratively censored at a 3-day "
    "follow-up horizon -- the censoring-aware statistic naive "
    "conversion rates get wrong). Exact INTEGER KM: durations in "
    "exact microseconds (never engine-divergent second/day diffs), "
    "risk sets from cumulative counts over the distinct-time step "
    "table (bounded by the horizon, never data-sized), and the "
    "product-limit estimator as a STEPWISE integer fold S_i = "
    "(S_{i-1} * (n_i - d_i)) div n_i at 1e-6 scale -- Spark folds a "
    "sorted array with exact (a - pmod(a,n))/n division, the oracle "
    "folds a recursive CTE; identical integers, no float product, no "
    "ln. Deaths-before-censorings tie convention. Scale shape: one "
    "scan, one user-keyed agg, then horizon-bounded arithmetic",
    ("events", "statistics", "timeseries"),
)
def xct_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = _t(spark, sf_dir)
    per_user = t["events"].groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    dd = F.expr("timestampdiff(MICROSECOND, t0, tp) div 86400000000")
    observed = F.col("tp").isNotNull() & (dd <= 3)
    durs = per_user.select(
        F.when(observed, dd).otherwise(F.lit(3)).cast("long").alias("t"),
        F.when(observed, 1).otherwise(0).cast("long").alias("ev"),
    )
    steps = durs.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
    )
    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    idx = steps.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    # stepwise integer product-limit fold over the horizon-bounded steps
    one_row = idx.agg(
        F.array_sort(F.collect_list(F.struct("t", "n_risk", "d", "c"))).alias("st")
    )
    surv = F.aggregate(
        "st",
        F.expr("array(CAST(1000000 AS BIGINT))"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                (
                    (
                        F.element_at(acc, -1) * (x["n_risk"] - x["d"])
                        - F.pmod(
                            F.element_at(acc, -1) * (x["n_risk"] - x["d"]),
                            x["n_risk"],
                        )
                    )
                    / x["n_risk"]
                ).cast("long")
            ),
        ),
    )
    rows = one_row.select("st", surv.alias("sv")).select(
        F.posexplode("st").alias("pos", "step"), F.col("sv")
    )
    return rows.select(
        F.col("step.t").alias("t_day"),
        F.col("step.n_risk").alias("n_risk"),
        F.col("step.d").alias("d_events"),
        F.col("step.c").alias("c_censored"),
        (F.expr("sv[pos + 1]") / 1e6).alias("survival"),
    ).orderBy("t_day")


@query(
    "xcu_ewma_halflife",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    lagged AS (
        SELECT day, rev_cents,
               row_number() OVER (ORDER BY day) AS rn,
               {" + ".join(f"coalesce(lag(rev_cents, {k}) OVER (ORDER BY day), 0) * {1 << (7 - k)}" for k in range(8))}
                   AS num
        FROM daily
    )
    SELECT day, rev_cents,
           CAST(num AS BIGINT) AS ewma_num,
           num / 256.0 AS ewma_cents
    FROM lagged WHERE rn >= 8 ORDER BY day
    """,
    "EXACT EWMA revenue smoothing with half-life decay (alpha = 1/2, "
    "truncated at 8 taps): every weight is a power of two, so the "
    "weighted sum is an INTEGER (sum of lag_k * 2^(7-k)) and the "
    "smoothed value num/256 is a dyadic rational -- exact in binary "
    "doubles on both engines, no float-power drift, unlike the "
    "textbook recursive s_t = a*x_t + (1-a)*s_(t-1) whose float "
    "rounding is order- and engine-dependent. Truncation bias is "
    "bounded by max_rev/256 (documented, not hidden). Scale shape: "
    "the per-day pre-aggregation is the only data-sized shuffle; the "
    "8 lag taps share ONE window node over the bounded day axis. "
    "First 7 days emit nothing (incomplete taps) rather than a "
    "silently biased partial average",
    ("events", "timeseries", "statistics"),
)
def xcu_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = _t(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    w = W.orderBy("day")
    num = None
    for k in range(8):
        term = F.coalesce(F.lag("rev_cents", k).over(w), F.lit(0)) * (1 << (7 - k))
        num = term if num is None else num + term
    lagged = daily.select(
        "day",
        "rev_cents",
        F.row_number().over(w).alias("rn"),
        num.alias("num"),
    )
    return (
        lagged.filter(F.col("rn") >= 8)
        .select(
            "day",
            "rev_cents",
            F.col("num").cast("long").alias("ewma_num"),
            (F.col("num") / 256.0).alias("ewma_cents"),
        )
        .orderBy("day")
    )


@query(
    "xcv_readability",
    """
    WITH m AS (
        SELECT lang,
               CAST(greatest(len(list_filter(regexp_split_to_array(trim(text),
                   '\\s+'), x -> x <> '')), 1) AS BIGINT) AS w,
               CAST(greatest(len(list_filter(regexp_split_to_array(text,
                   '[.!?]+'), x -> trim(x) <> '')), 1) AS BIGINT) AS s,
               CAST(greatest(len(regexp_extract_all(text, '[aeiouAEIOU]+')), 1)
                   AS BIGINT) AS y
        FROM documents
    ),
    per_doc AS (
        SELECT lang,
               w, s,
               206835 * s * w - 1015 * w * w - 84600 * y * s AS num,
               1000 * s * w AS den
        FROM m
    ),
    scored AS (
        SELECT lang, w, s,
               CASE WHEN num >= 0 THEN (num * 1000) // den
                    ELSE -((-num * 1000) // den) END AS flesch_milli
        FROM per_doc
    ),
    agg AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS total_words,
               CAST(sum(s) AS BIGINT) AS total_sentences,
               CAST(sum(flesch_milli) AS BIGINT) AS fsum
        FROM scored GROUP BY lang
    )
    SELECT lang, n_docs, total_words, total_sentences,
           (CASE WHEN fsum >= 0 THEN fsum // n_docs
                 ELSE -((-fsum) // n_docs) END) / 1000.0 AS mean_flesch
    FROM agg ORDER BY lang
    """,
    "FLESCH READING-EASE per language (the classic readability gate "
    "corpus filters use alongside Gopher rules): 206.835 - 1.015*W/S "
    "- 84.6*Y/W computed EXACTLY as one integer cross-multiplication "
    "(206835*S*W - 1015*W^2 - 84600*Y*S over 1000*S*W) -- no float "
    "ratio ever formed; syllables proxied by vowel-group counts "
    "(regexp_extract_all, verified engine-identical), sentences by "
    "[.!?]+ splits, all floor-guarded to >= 1. The score can go "
    "NEGATIVE for dense text, so both the per-doc quantization and "
    "the per-language mean are magnitude+sign decomposed (DuckDB // "
    "floors, Spark div truncates -- the signed-division engine trap). "
    "Scale: pure codegen projection + one lang-keyed aggregation",
    ("documents", "text", "quality"),
)
def xcv_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    m = t["documents"].select(
        "lang",
        F.greatest(
            F.size(F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")),
            F.lit(1),
        )
        .cast("long")
        .alias("w"),
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x) != ""
                )
            ),
            F.lit(1),
        )
        .cast("long")
        .alias("s"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[aeiouAEIOU]+', 0)")), F.lit(1)
        )
        .cast("long")
        .alias("y"),
    )
    per_doc = m.select(
        "lang",
        "w",
        "s",
        (
            206835 * F.col("s") * F.col("w")
            - 1015 * F.col("w") * F.col("w")
            - 84600 * F.col("y") * F.col("s")
        ).alias("num"),
        (1000 * F.col("s") * F.col("w")).alias("den"),
    )
    scored = per_doc.select(
        "lang",
        "w",
        "s",
        F.when(F.col("num") >= 0, F.expr("(num * 1000) div den"))
        .otherwise(-F.expr("((-num) * 1000) div den"))
        .alias("flesch_milli"),
    )
    agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("total_words"),
        F.sum("s").cast("long").alias("total_sentences"),
        F.sum("flesch_milli").cast("long").alias("fsum"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_words",
        "total_sentences",
        (
            F.when(F.col("fsum") >= 0, F.expr("fsum div n_docs")).otherwise(
                -F.expr("(-fsum) div n_docs")
            )
            / 1000.0
        ).alias("mean_flesch"),
    ).orderBy("lang")


def _copurchase_support2_edges(t: dict) -> DataFrame:
    """Support-2 co-purchase part edges (u < v) by in-array i<j pair
    enumeration over per-order sorted distinct part arrays (the
    apriori/basket_affinity r14 rewrite, shared here r15 by the kcore /
    LPA / link-prediction graph queries): baskets are schema-bounded
    (<= 7 lines/order), so pair instances explode map-side and the
    order-keyed self-join — measured 4.9 s of kcore's 8 s at sf0.1 —
    never exists. sort_array + i<j keeps u < v; support counting is
    unchanged (one pair instance per order containing both parts)."""
    its = F.col("__its")
    pair_arr = F.flatten(
        F.transform(
            its,
            lambda x, i: F.transform(
                F.slice(its, i + F.lit(2), F.size(its)),
                lambda y: F.array(x, y),
            ),
        )
    )
    return (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("__its"))
        .select(F.explode(pair_arr).alias("__p"))
        .select(F.col("__p")[0].alias("u"), F.col("__p")[1].alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__n_ab"))
        .filter(F.col("__n_ab") >= 2)
        .select("u", "v")
    )


def _kcore_oracle_sql(k: int = 2, rounds: int = 8) -> str:
    """Unrolled bounded-peel oracle for ``graph_kcore_onion``: alive sets
    alive0..alive{rounds}, each round keeping vertices whose degree
    among the previous round's alive vertices is >= k. The alive sets
    are NESTED (peeling only removes), so a vertex's layer falls out of
    how many rounds it survived: n_surv = rounds means core (layer 0),
    else layer = n_surv + 1. Unrolling to a FIXED depth makes the SQL a
    total function identical to the Spark operator's bounded semantics
    on any fixture, converged or not — no recursive CTE (peeling needs
    an aggregate over the recursive term, which recursive SQL forbids).

    Every alive CTE is ``AS MATERIALIZED``: each round references the
    previous alive set TWICE (one join per endpoint), and DuckDB
    inlines plain CTEs, so without materialization the unrolled plan
    doubles per round — 2^rounds subtree copies. Materialization makes
    the oracle linear in rounds, mirroring the Spark loop's per-round
    checkpoint.
    """
    ctes = [
        "items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    )""",
        "und AS MATERIALIZED (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges)",
        "alive0 AS MATERIALIZED (SELECT DISTINCT u AS p FROM und)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""alive{r} AS MATERIALIZED (
        SELECT e.u AS p FROM und e
        JOIN alive{r - 1} au ON e.u = au.p
        JOIN alive{r - 1} av ON e.v = av.p
        GROUP BY e.u HAVING count(*) >= {k}
    )"""
        )
    surv = " UNION ALL ".join(f"SELECT p FROM alive{r}" for r in range(1, rounds + 1))
    cte_sql = ",\n    ".join(ctes)
    return f"""
    WITH {cte_sql},
    surv AS ({surv}),
    agg AS (
        SELECT a0.p, count(s.p) AS n_surv
        FROM alive0 a0 LEFT JOIN surv s ON s.p = a0.p
        GROUP BY a0.p
    )
    SELECT CAST(p AS BIGINT) AS part_key,
           CAST(CASE WHEN n_surv = {rounds} THEN 0 ELSE n_surv + 1 END AS INTEGER) AS layer
    FROM agg ORDER BY part_key
    """


@query(
    "graph_kcore_onion",
    _kcore_oracle_sql(),
    "K-CORE ONION DECOMPOSITION (bounded iterative vertex peeling — "
    "the degree-based dual of the CC family's label propagation, and "
    "the standard graph-QA lens for separating incidental periphery "
    "from load-bearing dense structure): support-2 co-purchase edges "
    "(distinct (order, part) items, within-order self-pairing bounded "
    "by basket-size choose 2 — never a cross-catalog pairing), then up "
    "to 8 simultaneous peels of every part whose degree among the "
    "still-alive parts is < 2; layer = peel round, 0 = surviving core. "
    "The 8-round cap makes the semantics a total function both engines "
    "compute identically on ANY fixture (the oracle unrolls exactly 8 "
    "alive sets; the Spark loop exits early at the fixpoint, which is "
    "observationally identical) — converges in 3-5 rounds on all three "
    "SFs today. Spark side: static both-directions edge list cached "
    "pre-partitioned on the join key (never re-shuffles across "
    "rounds), alive set shrinks monotonically (broadcast-sized once "
    "peeling bites), one localCheckpoint per round bounds lineage; "
    "data-driven round count — CC-family member for the jobs baseline",
    ("lineitem", "graph", "analytics"),
)
def graph_kcore_onion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import kcore_onion

    t = _t(spark, sf_dir)
    edges = _copurchase_support2_edges(t)
    return (
        kcore_onion(edges, "u", "v", k=2, max_rounds=8)
        .select(F.col("vertex").cast("long").alias("part_key"), "layer")
        .orderBy("part_key")
    )


@query(
    "governance_t_closeness",
    """
    WITH bands AS (
        SELECT c_nationkey, c_mktsegment,
               (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS band
        FROM customer
    ),
    gl AS (SELECT band, count(*) AS cnt_all FROM bands GROUP BY band),
    tot AS (SELECT CAST(sum(cnt_all) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS m FROM gl),
    gq AS (
        SELECT c_nationkey, c_mktsegment, band, count(*) AS cnt_g
        FROM bands GROUP BY c_nationkey, c_mktsegment, band
    ),
    qi AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM gq),
    spine AS (
        SELECT q.c_nationkey, q.c_mktsegment, g.band, g.cnt_all,
               COALESCE(x.cnt_g, 0) AS cnt_g
        FROM qi q CROSS JOIN gl g
        LEFT JOIN gq x ON x.c_nationkey = q.c_nationkey
                      AND x.c_mktsegment = q.c_mktsegment AND x.band = g.band
    ),
    cum AS (
        SELECT c_nationkey, c_mktsegment, band, cnt_g,
               CAST(sum(cnt_g) OVER (PARTITION BY c_nationkey, c_mktsegment)
                    AS BIGINT) AS grp_sz,
               cnt_g * (SELECT n_total FROM tot) -
                   cnt_all * CAST(sum(cnt_g) OVER (PARTITION BY c_nationkey, c_mktsegment)
                                  AS BIGINT) AS diff
        FROM spine
    ),
    run AS (
        SELECT c_nationkey, c_mktsegment, grp_sz,
               abs(CAST(sum(diff) OVER (PARTITION BY c_nationkey, c_mktsegment
                                        ORDER BY band
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT)) AS acum
        FROM cum
    ),
    emd AS (
        SELECT c_nationkey, c_mktsegment, grp_sz,
               CAST(sum(acum) AS BIGINT) AS t_num,
               grp_sz * (SELECT n_total FROM tot) * ((SELECT m FROM tot) - 1) AS t_den
        FROM run GROUP BY c_nationkey, c_mktsegment, grp_sz
    )
    SELECT c_nationkey, c_mktsegment, grp_sz,
           CASE WHEN t_den = 0 THEN 0.0
                ELSE CAST(t_num * 1000000 // t_den AS BIGINT) / 1e6 END AS emd,
           (t_num * 5 > t_den) AS violates
    FROM emd
    ORDER BY c_nationkey, c_mktsegment
    """,
    "T-CLOSENESS audit — the third classic privacy gate after "
    "k-anonymity (x92) and l-diversity (x95): within each "
    "quasi-identifier group (nation, market segment), how FAR is the "
    "sensitive-attribute distribution (the same engine-exact $1000 "
    "account-balance band as x95) from the global distribution — a "
    "small group whose distribution mirrors the population leaks "
    "nothing even at l=1, while a skewed one leaks despite passing "
    "both earlier gates. Distance is the ordered-attribute EMD "
    "(1/(m-1) * sum |cumsum(p-q)|), computed EXACTLY in integers: "
    "per-band diff = cnt_g*N - cnt_all*grp_sz (numerator over the "
    "common denominator grp_sz*N), windowed cumulative sum, |.|, "
    "summed per group, then ONE integer-quantized division and the "
    "t=0.2 flag as an integer cross-multiplication — no float "
    "arithmetic anywhere before the final 6dp emission, so both "
    "engines compute identical bits (the denominators fit BIGINT up "
    "to ~1e9-row corpora; beyond that pre-quantize the per-band "
    "probabilities). Scale shape: two map-side-combinable "
    "aggregations over the fact table; the spine/window work runs on "
    "the AGGREGATED (|QI-groups| x bands) table only; the global band "
    "histogram and (N, m) scalars ride one broadcast each — never a "
    "driver collect. Unlike x68's PSI (two time-snapshots of one "
    "feature, log-ratio sum), this compares every QI GROUP against "
    "the corpus under an order-aware ground distance",
    ("quality", "governance"),
)
def governance_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    bands = t["customer"].select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 100000").alias("band"),
    )
    # the aggregated legs are multi-consumer and the compiled plan
    # re-scans customer per consumer (8 pruned 1-3 column scans) —
    # DELIBERATELY uncached: the interleaved A/B measured track_cache
    # on gl+gq at 1.27 s / 13 jobs vs 0.62 s / 10 uncached (seventh
    # cache counter-datapoint; all consumers in ONE action, and a
    # pruned parquet re-scan costs about what the cache write costs —
    # CLAUDE.md). On a 100 TB customer table, cache the two aggregates.
    gl = bands.groupBy("band").agg(F.count(F.lit(1)).alias("cnt_all"))
    tot = gl.agg(
        F.sum("cnt_all").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    gq = bands.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("cnt_g")
    )
    qi = gq.select("c_nationkey", "c_mktsegment").distinct()
    spine = (
        qi.crossJoin(F.broadcast(gl))
        .join(gq, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "band",
            "cnt_all",
            F.coalesce("cnt_g", F.lit(0)).alias("cnt_g"),
        )
        .crossJoin(F.broadcast(tot))
    )
    wg = W.partitionBy("c_nationkey", "c_mktsegment")
    wcum = wg.orderBy("band").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = spine.select(
        "c_nationkey",
        "c_mktsegment",
        "band",
        "n_total",
        "m",
        F.sum("cnt_g").over(wg).cast("long").alias("grp_sz"),
        (
            F.col("cnt_g") * F.col("n_total")
            - F.col("cnt_all") * F.sum("cnt_g").over(wg).cast("long")
        ).alias("diff"),
    )
    run = cum.select(
        "c_nationkey",
        "c_mktsegment",
        "grp_sz",
        "n_total",
        "m",
        F.abs(F.sum("diff").over(wcum).cast("long")).alias("acum"),
    )
    emd = run.groupBy("c_nationkey", "c_mktsegment", "grp_sz", "n_total", "m").agg(
        F.sum("acum").cast("long").alias("t_num")
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "grp_sz",
        "t_num",
        (F.col("grp_sz") * F.col("n_total") * (F.col("m") - 1)).alias("t_den"),
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        "grp_sz",
        F.when(F.col("t_den") == 0, F.lit(0.0))
        .otherwise(F.expr("cast(t_num * 1000000 div t_den as bigint)") / 1e6)
        .alias("emd"),
        (F.col("t_num") * 5 > F.col("t_den")).alias("violates"),
    ).orderBy("c_nationkey", "c_mktsegment")


@query(
    "xe8_attribution_linear",
    """
    WITH pur AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    tou AS (
        SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
        SELECT p.pid, p.cents, t.tid, t.channel,
               row_number() OVER (PARTITION BY p.pid
                                  ORDER BY t.tts DESC, t.tid) AS rk,
               count(*) OVER (PARTITION BY p.pid) AS n
        FROM pur p JOIN tou t
          ON t.user_id = p.user_id
         AND t.tts < p.pts
         AND epoch_us(p.pts) - epoch_us(t.tts) <= 604800000000
    )
    SELECT channel,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(cents // n + CASE WHEN rk <= cents % n THEN 1 ELSE 0 END)
                AS BIGINT) AS credited_cents
    FROM j GROUP BY channel ORDER BY channel
    """,
    "LINEAR (multi-touch) attribution with EXACT integer apportionment "
    "— the equal-credit complement of the last-touch family (x77/xcd "
    "pick one winning touch; this SPLITS the purchase value across "
    "every touch in the 7-day lookback): per purchase, each of its n "
    "touches gets cents div n, and the cents mod n remainder goes to "
    "the most recent touches (largest-remainder / Hamilton "
    "apportionment, recency rank as the deterministic tie-break) — so "
    "credit per purchase sums EXACTLY to the purchase cents, no float "
    "splits, no lost pennies, engine-identical bits. Lookback compared "
    "in MICROSECONDS (epoch_us vs timestamp_diff — exact on both "
    "engines; second-granularity date_diff counts boundary crossings). "
    "Scale shape (r10 skew hardening): the join key is (user, calendar "
    "WEEK bucket) — each touch is exploded to its own bucket and the "
    "next, each purchase joins on its own — so a bot-grade hot user's "
    "history splits across weeks instead of fanning out |purchases| x "
    "|touches| under one key (the classic skew stall the r9 verdict "
    "flagged); the bucket is floor(days-since-epoch / 7) from the NAIVE "
    "calendar date, DST-immune and Spark-internal only (the exact "
    "micros predicate still decides membership, so the oracle keeps the "
    "plain user join and results are bit-identical). Residual per-key "
    "fan-out is one week of one user's activity — the bound the 7-day "
    "lookback itself imposes. Two windows over the per-purchase "
    "partitions (pid is unique, skew-free), one map-side channel rollup",
    ("events", "analytics"),
)
def xe8_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"]
    # calendar-week bucket from the naive date: tz/DST-immune (works on
    # NTZ and LTZ event timestamps alike) and monotone, so a touch can
    # only serve purchases in its own bucket or the next — date(pts) <=
    # date(tts) + 7 whenever pts <= tts + 7 days. Spark-internal only;
    # the exact micros predicate below decides membership.
    def _week(col):
        return F.floor(
            F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")) / 7
        ).cast("long")

    pur = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        _week(F.col("ts")).alias("wk"),
    )
    tou = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
        F.explode(F.array(_week(F.col("ts")), _week(F.col("ts")) + 1)).alias("wk"),
    )
    j = (
        pur.join(tou, ["user_id", "wk"])
        .filter(
            (F.col("tts") < F.col("pts"))
            # 7-day lookback in exact microseconds (x81/x82 idiom)
            & (F.timestamp_diff("MICROSECOND", F.col("tts"), F.col("pts")) <= 604_800_000_000)
        )
        .select(
            "pid",
            "cents",
            "tid",
            "channel",
            F.row_number()
            .over(W.partitionBy("pid").orderBy(F.col("tts").desc(), F.col("tid")))
            .alias("rk"),
            F.count(F.lit(1)).over(W.partitionBy("pid")).alias("n"),
        )
    )
    return (
        j.groupBy("channel")
        .agg(
            F.countDistinct("pid").cast("long").alias("n_purchases"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum(
                F.expr("cents div n") + F.when(F.col("rk") <= F.col("cents") % F.col("n"), 1).otherwise(0)
            )
            .cast("long")
            .alias("credited_cents"),
        )
        .orderBy("channel")
    )


@query(
    "xdr_changepoint_cusum",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    dev AS (
        SELECT event_type, d, c,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
               CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS s_total,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) * c
                   - CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS dv
        FROM daily
    ),
    cs AS (
        SELECT event_type, d, n_days, s_total,
               CAST(sum(dv) OVER (PARTITION BY event_type ORDER BY d
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cusum
        FROM dev
    ),
    pick AS (
        SELECT event_type, d, n_days, s_total, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(cusum) DESC, d) AS rk
        FROM cs
    )
    SELECT event_type, n_days, d AS change_day,
           abs(cusum) AS cusum_peak,
           CASE WHEN cusum > 0 THEN 1 WHEN cusum < 0 THEN -1 ELSE 0 END AS direction,
           CASE WHEN n_days * s_total = 0 THEN 0.0
                ELSE CAST(abs(cusum) * 1000000 // (n_days * s_total) AS BIGINT) / 1e6
           END AS shift_score
    FROM pick WHERE rk = 1
    ORDER BY event_type
    """,
    "CUSUM CHANGEPOINT detection per event type (ingestion-shift "
    "monitoring — 'WHEN did the daily volume regime change': x68's PSI "
    "answers whether two snapshots differ, x37/xcu smooth or flag "
    "single points; CUSUM localizes the shift): per-day deviations "
    "from the per-type mean kept EXACT as integers (dev = n*c - S over "
    "the common denominator n, so no float mean), a windowed running "
    "sum, and the changepoint = the day of the maximum |CUSUM| "
    "(earliest-day tie-break); the normalized shift score does ONE "
    "integer-quantized division at the end and the direction is a "
    "sign column (the r6 magnitude+sign rule — never floor a signed "
    "value). Scale shape: one map-side-combinable daily rollup over "
    "the fact table; every window runs on the (types x days) "
    "aggregate. DATE output CAST on both sides (the r7 xb4 rule)",
    ("events", "analytics", "quality"),
)
def xdr_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wt = W.partitionBy("event_type")
    wcum = wt.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    dev = daily.select(
        "event_type",
        "d",
        F.count(F.lit(1)).over(wt).cast("long").alias("n_days"),
        F.sum("c").over(wt).cast("long").alias("s_total"),
        (
            F.count(F.lit(1)).over(wt).cast("long") * F.col("c")
            - F.sum("c").over(wt).cast("long")
        ).alias("dv"),
    )
    cs = dev.select(
        "event_type",
        "d",
        "n_days",
        "s_total",
        F.sum("dv").over(wcum).cast("long").alias("cusum"),
    )
    pick = cs.select(
        "event_type",
        "d",
        "n_days",
        "s_total",
        "cusum",
        F.row_number()
        .over(wt.orderBy(F.abs(F.col("cusum")).desc(), F.col("d")))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return pick.select(
        "event_type",
        "n_days",
        F.col("d").alias("change_day"),
        F.abs(F.col("cusum")).alias("cusum_peak"),
        F.when(F.col("cusum") > 0, 1).when(F.col("cusum") < 0, -1).otherwise(0).alias("direction"),
        F.when(F.col("n_days") * F.col("s_total") == 0, F.lit(0.0))
        .otherwise(
            F.expr("cast(abs(cusum) * 1000000 div (n_days * s_total) as bigint)") / 1e6
        )
        .alias("shift_score"),
    ).orderBy("event_type")


@query(
    "dedup_span_regions",
    r"""
    WITH words AS (SELECT doc_id, regexp_split_to_array(text, '\s+') w FROM documents),
    spans AS (
        SELECT doc_id, i AS pos,
               ('0x' || substr(md5('0:' || concat_ws(' ', w[i+1], w[i+2], w[i+3],
                    w[i+4], w[i+5], w[i+6], w[i+7], w[i+8])), 1, 15))::BIGINT AS span_h
        FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS i
              FROM words WHERE len(w) >= 8)
    ),
    dup AS (SELECT span_h FROM spans GROUP BY span_h HAVING count(DISTINCT doc_id) >= 2),
    dpos AS (SELECT s.doc_id, s.pos FROM spans s JOIN dup d ON d.span_h = s.span_h),
    marked AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                    THEN 1 ELSE 0 END AS brk
        FROM dpos
    ),
    grp AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM marked
    ),
    regions AS (
        SELECT doc_id, min(pos) AS s0,
               max(pos) - min(pos) + 8 AS rw
        FROM grp GROUP BY doc_id, g
    ),
    per AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_regions,
               CAST(sum(rw) AS BIGINT) AS dup_words,
               CAST(max(rw) AS BIGINT) AS longest_region_words
        FROM regions GROUP BY doc_id
    ),
    longest AS (
        SELECT doc_id, s0 + 1 AS longest_region_start
        FROM (SELECT doc_id, s0,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY rw DESC, s0) AS rk
              FROM regions)
        WHERE rk = 1
    ),
    nw AS (SELECT doc_id, len(w) AS n_words FROM words)
    SELECT n.doc_id,
           CAST(coalesce(p.n_regions, 0) AS BIGINT) AS n_regions,
           CAST(coalesce(p.dup_words, 0) AS BIGINT) AS dup_words,
           CAST(coalesce(p.longest_region_words, 0) AS BIGINT) AS longest_region_words,
           CAST(coalesce(l.longest_region_start, 0) AS BIGINT) AS longest_region_start,
           CAST(coalesce(p.dup_words, 0) * 1000000 // greatest(n.n_words, 1) AS BIGINT) / 1e6
               AS dup_word_frac,
           (coalesce(p.dup_words, 0) * 10 >= n.n_words * 3) AS flagged
    FROM nw n
    LEFT JOIN per p ON p.doc_id = n.doc_id
    LEFT JOIN longest l ON l.doc_id = n.doc_id
    ORDER BY n.doc_id
    """,
    "VARIABLE-LENGTH duplicated-substring regions (the Lee et al. 2022 "
    "ExactSubstr cut-list, new r10 — the genuine extension of x60's "
    "fixed-span occurrence stats): a word position is covered when its "
    "8-gram occurs in >= 2 distinct docs, and covered windows merge into "
    "MAXIMAL regions by gaps-and-islands (new region iff the gap between "
    "consecutive covered starts exceeds 8 — overlapping/touching windows "
    "fuse, so a 100-word copied paragraph reports as ONE ~100-word "
    "region where x60 counts 93 occurrences). Per doc: region count, "
    "exact union word coverage (never double-counted), longest region's "
    "length and 1-based start (rank tie-break: longest then earliest), "
    "integer-quantized coverage fraction and a 30%-coverage flag via "
    "integer cross-multiplication. Suffix-array-free: one map-side span "
    "kernel, one groupBy(span_h) + hash semi-join back, one "
    "doc-partitioned window over covered positions only, and the region "
    "rollup + per-doc stats reuse that partitioning — O(total tokens), "
    "no iteration (region merging is a single window, not a fixpoint "
    "loop)",
    ("dedup", "text"),
)
def dedup_span_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    docs = t["documents"]
    runs = dedup_ops.dup_span_runs(docs, span_words=8, min_docs=2)
    wdoc = W.partitionBy("doc")
    per = (
        runs.select(
            "doc",
            "region_start",
            "region_words",
            F.count(F.lit(1)).over(wdoc).cast("long").alias("n_regions"),
            F.sum("region_words").over(wdoc).cast("long").alias("dup_words"),
            F.row_number()
            .over(wdoc.orderBy(F.col("region_words").desc(), F.col("region_start")))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("doc").alias("doc_id"),
            "n_regions",
            "dup_words",
            # rank-1 row IS the longest region (earliest on ties)
            F.col("region_words").alias("longest_region_words"),
            F.col("region_start").alias("longest_region_start"),
        )
    )
    nw = docs.select("doc_id", F.size(F.split("text", r"\s+")).alias("n_words"))
    return (
        nw.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_regions", F.lit(0)).cast("long").alias("n_regions"),
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
            F.coalesce("longest_region_words", F.lit(0))
            .cast("long")
            .alias("longest_region_words"),
            F.coalesce("longest_region_start", F.lit(0))
            .cast("long")
            .alias("longest_region_start"),
            (
                F.expr(
                    "cast(coalesce(dup_words, 0) * 1000000 div greatest(n_words, 1) as bigint)"
                )
                / 1e6
            ).alias("dup_word_frac"),
            (F.coalesce("dup_words", F.lit(0)) * 10 >= F.col("n_words") * 3).alias(
                "flagged"
            ),
        )
        .orderBy("doc_id")
    )


def _bpe_chain_sql(
    rounds: int, min_len: int = 2, source: str = "documents", prelude: str = ""
) -> str:
    """Unrolled BPE oracle CTE chain: one MATERIALIZED block per round
    (the kcore recipe — DuckDB inlines plain CTEs, so an unrolled
    iteration whose round N references round N-1 more than once would
    compile 2^rounds subtree copies). Replicates text._bpe_iterate
    bit-exactly: position-overlapping pair counts, (n DESC, left,
    right) argmax, window-only greedy non-overlapping merge
    (odd-indexed candidates per island), row_number re-densification.
    Callers append their own final SELECT (xd7 reads the m{r} merge
    rows; bpe_segment_corpus reads the converged s{rounds} state).

    Convergence-stable (r11, ADVICE fix): the per-round broadcast of
    the argmax pair is a LEFT JOIN b{r} ON true, NOT a cross join — if
    the corpus runs out of adjacent pairs before `rounds` (b{r}
    empty), each p row gets NULL a/b, `coalesce(sym=a AND nxt=b,
    false)` marks nothing, and s{r} passes s{r-1} through unchanged
    while m{r} stays empty — exactly text._bpe_iterate's early `break`
    (it keeps the converged state and stops emitting merges). A cross
    join would instead empty the whole s{r}..s{rounds} chain and
    report zero tokens for every doc. Pinned engine-pair on a
    converges-in-one-round corpus in
    tests/test_engine_pair_idioms.py."""
    parts = [
        rf"""
    WITH {prelude}vocab AS MATERIALIZED (
        SELECT w, count(*) AS cnt FROM (
            SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM {source}
        ) WHERE length(w) >= {min_len} GROUP BY w
    ),
    s0 AS MATERIALIZED (
        SELECT w, cnt, i AS pos, substr(w, i::INTEGER + 1, 1) AS sym
        FROM vocab, LATERAL unnest(range(0, length(w))) AS t(i)
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
    p{r} AS MATERIALIZED (
        SELECT w, cnt, pos, sym,
               lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
        FROM s{r - 1}
    ),
    b{r} AS MATERIALIZED (
        SELECT sym AS a, nxt AS b, CAST(sum(cnt) AS BIGINT) AS n
        FROM p{r} WHERE nxt IS NOT NULL
        GROUP BY sym, nxt ORDER BY n DESC, sym, nxt LIMIT 1
    ),
    k{r} AS MATERIALIZED (
        SELECT w, cnt, pos, sym,
               (is_cand AND rn_cand % 2 = 1) AS keep
        FROM (
            SELECT w, cnt, pos, sym, is_cand,
                   sum(CASE WHEN is_cand THEN 1 ELSE 0 END)
                       OVER (PARTITION BY w, nc ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS rn_cand
            FROM (
                SELECT p.w, p.cnt, p.pos, p.sym,
                       coalesce(p.sym = b.a AND p.nxt = b.b, false) AS is_cand,
                       sum(CASE WHEN coalesce(p.sym = b.a AND p.nxt = b.b, false)
                                THEN 0 ELSE 1 END)
                           OVER (PARTITION BY p.w ORDER BY p.pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS nc
                FROM p{r} p LEFT JOIN b{r} b ON true
            )
        )
    ),
    s{r} AS MATERIALIZED (
        SELECT w, cnt,
               row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
               CASE WHEN keep THEN (SELECT a || b FROM b{r}) ELSE sym END AS sym
        FROM (
            SELECT w, cnt, pos, sym, keep,
                   lag(keep) OVER (PARTITION BY w ORDER BY pos) AS drp
            FROM k{r}
        )
        WHERE NOT coalesce(drp, false)
    ),
    m{r} AS MATERIALIZED (
        SELECT {r} AS round, a AS left_sym, b AS right_sym, a || b AS merged,
               n AS n_occurrences,
               (SELECT CAST(count(*) AS BIGINT) FROM s{r}) AS symbols_after
        FROM b{r}
    )"""
        )
    return ",".join(parts)


def _bpe_rounds_sql(rounds: int) -> str:
    union = "\n    UNION ALL\n    ".join(f"SELECT * FROM m{r}" for r in range(1, rounds + 1))
    return _bpe_chain_sql(rounds, min_len=2) + f"\n    {union}\n    ORDER BY round"


def _bpe_encode_chain_sql(rounds: int) -> str:
    """Frozen-table BPE ENCODE oracle chain (shared by xdj and xdl —
    the _bpe_chain_sql consumer-appends-final pattern): the learn chain
    runs over the TRAIN hash-split only (prelude CTEs +
    source='train'), then an encode chain (e0..e{rounds}) applies each
    learned pair b{r} — in rank order — to the HELDOUT split's word
    state with the same island-merge blocks, ending in a `wt`
    word->token-count CTE. Rank-order application equals the classic
    min-rank loop for a formation-ordered table (see text.bpe_encode);
    every pair join is LEFT JOIN ON true so rounds past convergence
    pass the state through unchanged (the r11 convergence rule)."""
    prelude = r"""train AS MATERIALIZED (
        SELECT * FROM documents
        WHERE ('0x' || substr(md5('bpe_enc:' || doc_id), 1, 15))::BIGINT % 5 < 4
    ),
    held AS MATERIALIZED (
        SELECT * FROM documents
        WHERE ('0x' || substr(md5('bpe_enc:' || doc_id), 1, 15))::BIGINT % 5 = 4
    ),
    """
    parts = [
        _bpe_chain_sql(rounds, min_len=1, source="train", prelude=prelude),
        r"""
    e0 AS MATERIALIZED (
        SELECT w, cnt, i AS pos, substr(w, i::INTEGER + 1, 1) AS sym
        FROM (
            SELECT w, count(*) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM held
            ) WHERE length(w) >= 1 GROUP BY w
        ), LATERAL unnest(range(0, length(w))) AS t(i)
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
    ep{r} AS MATERIALIZED (
        SELECT w, cnt, pos, sym,
               lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
        FROM e{r - 1}
    ),
    ek{r} AS MATERIALIZED (
        SELECT w, cnt, pos, sym,
               (is_cand AND rn_cand % 2 = 1) AS keep
        FROM (
            SELECT w, cnt, pos, sym, is_cand,
                   sum(CASE WHEN is_cand THEN 1 ELSE 0 END)
                       OVER (PARTITION BY w, nc ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS rn_cand
            FROM (
                SELECT p.w, p.cnt, p.pos, p.sym,
                       coalesce(p.sym = b.a AND p.nxt = b.b, false) AS is_cand,
                       sum(CASE WHEN coalesce(p.sym = b.a AND p.nxt = b.b, false)
                                THEN 0 ELSE 1 END)
                           OVER (PARTITION BY p.w ORDER BY p.pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS nc
                FROM ep{r} p LEFT JOIN b{r} b ON true
            )
        )
    ),
    e{r} AS MATERIALIZED (
        SELECT w, cnt,
               row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
               CASE WHEN keep THEN (SELECT a || b FROM b{r}) ELSE sym END AS sym
        FROM (
            SELECT w, cnt, pos, sym, keep,
                   lag(keep) OVER (PARTITION BY w ORDER BY pos) AS drp
            FROM ek{r}
        )
        WHERE NOT coalesce(drp, false)
    )"""
        )
    parts.append(
        f"""
    wt AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n_tok,
               CAST(sum(CASE WHEN length(sym) >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_merged
        FROM e{rounds} GROUP BY w
    )"""
    )
    return ",".join(parts)


# per-doc rollup of the encode chain, shared by both finals
_BPE_ENCODE_PER_DOC = r"""
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
               CAST(sum(n_merged) AS BIGINT) AS n_merged_tokens
        FROM (
            SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
            FROM held
        ) ws
        JOIN wt USING (w)
        WHERE length(w) >= 1
        GROUP BY doc_id
"""


def _bpe_encode_sql(rounds: int) -> str:
    return (
        _bpe_encode_chain_sql(rounds)
        + r"""
    SELECT d.doc_id,
           CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
           CAST(coalesce(p.n_merged_tokens, 0) AS BIGINT) AS n_merged_tokens,
           CAST(coalesce(p.n_bpe_tokens, 0) * 1000000
                // greatest(coalesce(p.n_words, 0), 1) AS BIGINT) / 1e6
               AS tokens_per_word
    FROM held d
    LEFT JOIN ("""
        + _BPE_ENCODE_PER_DOC
        + r"""
    ) p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """
    )


def _bpe_fertility_sql(rounds: int) -> str:
    return (
        _bpe_encode_chain_sql(rounds)
        + r"""
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(p.n_words, 0)) AS BIGINT) AS n_words,
           CAST(sum(coalesce(p.n_bpe_tokens, 0)) AS BIGINT) AS n_tokens,
           CAST(sum(coalesce(p.n_merged_tokens, 0)) AS BIGINT) AS n_merged,
           CAST(sum(coalesce(p.n_bpe_tokens, 0)) * 1000000
                // greatest(sum(coalesce(p.n_words, 0)), 1) AS BIGINT) / 1e6
               AS fertility,
           CAST(sum(coalesce(p.n_merged_tokens, 0)) * 1000000
                // greatest(sum(coalesce(p.n_bpe_tokens, 0)), 1) AS BIGINT) / 1e6
               AS merged_frac
    FROM held d
    LEFT JOIN ("""
        + _BPE_ENCODE_PER_DOC
        + r"""
    ) p ON p.doc_id = d.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
    """
    )


@query(
    "xd7_bpe_learn_rounds",
    _bpe_rounds_sql(5),
    "BPE tokenizer induction, 5 BOUNDED merge rounds (the multi-round "
    "extension of xa0's round-1 candidate count — the r9 verdict's "
    "named alternative flagship): per round, exact corpus-weighted "
    "adjacent-position pair counts over the exploded VOCABULARY "
    "(overlaps included, the Sennrich et al. 2016 reference counting), "
    "argmax with (count DESC, left, right) deterministic tie-break, "
    "then greedy LEFT-TO-RIGHT NON-OVERLAPPING application as a "
    "window-only pass — candidate islands (consecutive candidates "
    "exist only for left==right symbol runs) keep their odd-indexed "
    "members, drop-the-successor via lag, re-densify positions with "
    "row_number; no HOF fold, no per-round join. State is "
    "vocabulary-bounded (corpus touched once for word counts) and "
    "localCheckpoint-truncated per round with a one-row argmax collect "
    "(the measured kmeans pattern — in-plan broadcast argmax re-plans "
    "per round). Oracle = 5 unrolled MATERIALIZED CTE rounds (the "
    "kcore recipe). Emits (round, left_sym, right_sym, merged, "
    "n_occurrences, symbols_after); fewer rows if pairs run out — the "
    "bounded-cap total-function posture",
    ("text", "pipeline"),
)
def xd7_bpe_learn_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return text_ops.bpe_learn(t["documents"], rounds=5).orderBy("round")


# Geometric-mechanism (discrete Laplace) inverse-CDF thresholds at
# epsilon = 1 (alpha = e^-1): P(z) = (1-a)/(1+a) * a^|z|, enumerated
# 0, +1, -1, +2, -2, ... — cumulative mass floored to integer
# per-million thresholds ONCE here (the xcl Poisson idiom), so query
# time involves no transcendentals on either engine and the noise is
# literal-exact. Tail mass past |z|=9 is 67 per 1e6 and clamps to +10.
_GEOM_DP_CDF = [
    (0, 462117), (1, 632120), (-1, 802123), (2, 864664), (-2, 927205),
    (3, 950212), (-3, 973220), (4, 981684), (-4, 990148), (5, 993262),
    (-5, 996375), (6, 997521), (-6, 998666), (7, 999088), (-7, 999509),
    (8, 999664), (-8, 999819), (9, 999876), (-9, 999933),
]


def _geom_dp_case_sql(u: str) -> str:
    whens = " ".join(f"WHEN {u} < {t} THEN {z}" for z, t in _GEOM_DP_CDF)
    return f"CASE {whens} ELSE 10 END"


@query(
    "xd8_dp_geometric_release",
    f"""
    WITH grp AS (
        SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n_true
        FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    noise AS (
        SELECT c_nationkey, c_mktsegment, n_true,
               {_geom_dp_case_sql(
                   "('0x' || substr(md5('dp:' || c_nationkey || ':' || c_mktsegment), 1, 15))::BIGINT % 1000000"
               )} AS z
        FROM grp
    )
    SELECT c_nationkey, c_mktsegment, n_true, z,
           CASE WHEN n_true < 5 THEN -1
                ELSE greatest(n_true + z, 0) END AS n_released,
           (n_true < 5) AS suppressed
    FROM noise
    ORDER BY c_nationkey, c_mktsegment
    """,
    "DIFFERENTIAL-PRIVACY release mechanism (geometric / discrete "
    "Laplace at epsilon=1, sensitivity-1 counting query) — the fourth "
    "member of the governance family: x92/x95/xd0 AUDIT re-identification "
    "risk, this one RELEASES the per-(nation, segment) histogram with "
    "integer noise plus small-count suppression (n < 5 -> sentinel -1, "
    "never a NULL BIGINT: a nullable int column degrades to float64+NaN "
    "through BOTH engines' pandas paths). Noise is the exact geometric "
    "inverse-CDF over literal per-million thresholds computed once in "
    "python (the xcl Poisson idiom — no transcendentals at query time, "
    "engine-identical bits), seeded from the portable md5 of the group "
    "key: DETERMINISTIC by construction so oracle/rerun agree — a "
    "production release would draw the seed from a secret, the mechanism "
    "and plan are unchanged. Scale shape: one map-side-combinable "
    "groupBy over the fact table; noise + suppression are per-GROUP "
    "column expressions on the aggregate — corpus-size-free after the "
    "rollup",
    ("quality", "governance"),
)
def xd8_dp_geometric_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    grp = t["customer"].groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = F.pmod(
        dedup_ops.portable_hash(
            F.concat_ws(":", F.col("c_nationkey"), F.col("c_mktsegment")),
            F.lit("dp"),
        ),
        F.lit(1_000_000),
    )
    z = F.lit(10)
    for zv, thr in reversed(_GEOM_DP_CDF):
        z = F.when(u < thr, F.lit(zv)).otherwise(z)
    noised = grp.select("c_nationkey", "c_mktsegment", "n_true", z.alias("z"))
    return noised.select(
        "c_nationkey",
        "c_mktsegment",
        "n_true",
        "z",
        F.when(F.col("n_true") < 5, F.lit(-1))
        .otherwise(F.greatest(F.col("n_true") + F.col("z"), F.lit(0)))
        .cast("long")
        .alias("n_released"),
        (F.col("n_true") < 5).alias("suppressed"),
    ).orderBy("c_nationkey", "c_mktsegment")


@query(
    "bpe_segment_corpus",
    _bpe_chain_sql(5, min_len=1)
    + r"""
    SELECT d.doc_id,
           CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(p.n_chars, 0) AS BIGINT) AS n_chars,
           CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
           CAST(coalesce(p.n_bpe_tokens, 0) * 1000000
                // greatest(coalesce(p.n_chars, 0), 1) AS BIGINT) / 1e6
               AS tokens_per_char
    FROM documents d
    LEFT JOIN (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(length(w)) AS BIGINT) AS n_chars,
               CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
        FROM (
            SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
            FROM documents
        ) ws
        JOIN (SELECT w, CAST(count(*) AS BIGINT) AS n_tok FROM s5 GROUP BY w) wt
          USING (w)
        WHERE length(w) >= 1
        GROUP BY doc_id
    ) p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    "BPE corpus SEGMENTATION with the learned merges (the consumer side "
    "of xd7's tokenizer induction, new r10): learn the same 5 merges "
    "(min_word_len=1 — length-1 words carry no adjacent pairs, so the "
    "learned merges are IDENTICAL to the length>=2 vocabulary's while "
    "the converged state now covers every word), then each word's BPE "
    "token count is simply its symbol-row count in the converged state, "
    "joined back to the exploded corpus stream and rolled up per "
    "document: whitespace words, character mass, learned-subword token "
    "count and the integer-quantized tokens-per-char ratio — the budget "
    "metric an LLM pipeline allocates by (doc_stats' n_bpe_ish is the "
    "fixed-regex approximation; this is the real learned segmentation). "
    "Scale shape: the learn loop stays vocabulary-bounded; segmentation "
    "adds ONE corpus-stream explode + a vocab-keyed equi-join (the "
    "word->n_tok table is vocabulary-sized, broadcastable at any corpus "
    "scale) + one doc rollup. Oracle reuses the unrolled MATERIALIZED "
    "chain at min_len=1 and reads the converged s5 state",
    ("text", "pipeline"),
)
def bpe_segment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return text_ops.bpe_segment(
        t["documents"], rounds=5, min_word_len=1
    ).orderBy("doc_id")


@query(
    "xda_target_encoding",
    """
    WITH rows_ AS (
        SELECT c.c_mktsegment AS segment,
               ('0x' || substr(md5('fold:' || o.o_orderkey), 1, 15))::BIGINT % 5 AS fold,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per_fold AS (
        SELECT segment, fold,
               CAST(count(*) AS BIGINT) AS n_fold,
               CAST(sum(cents) AS BIGINT) AS sum_fold
        FROM rows_ GROUP BY segment, fold
    ),
    tot AS (
        SELECT segment, fold, n_fold, sum_fold,
               CAST(sum(n_fold) OVER (PARTITION BY segment) AS BIGINT) AS n_all,
               CAST(sum(sum_fold) OVER (PARTITION BY segment) AS BIGINT) AS sum_all
        FROM per_fold
    )
    SELECT segment, fold, n_fold,
           n_all - n_fold AS n_oof,
           CASE WHEN n_all - n_fold = 0 THEN 0.0
                ELSE CAST((sum_all - sum_fold) * 100 // (n_all - n_fold) AS BIGINT) / 1e2
           END AS oof_mean_cents,
           CAST(sum_all * 100 // n_all AS BIGINT) / 1e2 AS full_mean_cents
    FROM tot
    ORDER BY segment, fold
    """,
    "K-FOLD TARGET ENCODING (leakage-free categorical feature prep — "
    "the ML-pipeline companion to xck feature hashing and xab "
    "equi-depth bucketing): each order lands in one of 5 deterministic "
    "folds (portable md5 of the order key), and a category's encoding "
    "for fold f is the target mean computed WITHOUT fold f's own rows "
    "(out-of-fold: (sum_all - sum_fold) / (n_all - n_fold)) — the "
    "standard guard against target leakage when the encoded feature "
    "feeds a model trained on the same rows. Exact integer cents "
    "end-to-end: per-(segment, fold) BIGINT sums, segment totals via a "
    "window over the 25-row aggregate (never a totals self-join — the "
    "xb9/xce rule), ONE quantized division per output value at 2dp "
    "(cents are integral, so /1e2 of an integer division is "
    "engine-exact), empty-complement CASE-guarded on both engines "
    "(ANSI x/0 is an error in Spark, inf in DuckDB — the x73 rule). "
    "Scale shape: one fact-dim equi-join (customer side broadcastable), "
    "one map-side-combinable rollup; all window/divide work on the "
    "|segments| x |folds| aggregate. BIGINT headroom: sum(cents) "
    "* 100 stays under 2^63 up to ~1e9 orders; beyond that, quantize "
    "the per-fold means first",
    ("quality", "pipeline"),
)
def xda_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    # no explicit broadcast hint: customer is a DIMENSION here but not
    # bounded by construction (unlike band/centroid tables) — AQE picks
    # broadcast at bench SF and sort-merge when the dim outgrows the
    # threshold, the same legitimate flip the 100x probes adjudicated
    rows_ = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.pmod(
                dedup_ops.portable_hash(F.col("o_orderkey").cast("string"), F.lit("fold")),
                F.lit(5),
            ).alias("fold"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
    )
    per_fold = rows_.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_fold"),
        F.sum("cents").cast("long").alias("sum_fold"),
    )
    ws = W.partitionBy("segment")
    tot = per_fold.select(
        "segment",
        "fold",
        "n_fold",
        "sum_fold",
        F.sum("n_fold").over(ws).cast("long").alias("n_all"),
        F.sum("sum_fold").over(ws).cast("long").alias("sum_all"),
    )
    return tot.select(
        "segment",
        "fold",
        "n_fold",
        (F.col("n_all") - F.col("n_fold")).alias("n_oof"),
        F.when(F.col("n_all") - F.col("n_fold") == 0, F.lit(0.0))
        .otherwise(
            F.expr("cast((sum_all - sum_fold) * 100 div (n_all - n_fold) as bigint)") / 1e2
        )
        .alias("oof_mean_cents"),
        (F.expr("cast(sum_all * 100 div n_all as bigint)") / 1e2).alias("full_mean_cents"),
    ).orderBy("segment", "fold")


@query(
    "xfb_conformal_interval",
    """
    WITH rows_ AS (
        SELECT c.c_mktsegment AS segment,
               ('0x' || substr(md5('cp:' || o.o_orderkey), 1, 15))::BIGINT % 10 AS h,
               o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    mu AS (
        SELECT segment,
               CAST(count(*) AS BIGINT) AS n_train,
               CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT) AS mu_cents
        FROM rows_ WHERE h < 6 GROUP BY segment
    ),
    cal AS (
        SELECT r.segment, abs(r.cents - m.mu_cents) AS resid, r.o_orderkey
        FROM rows_ r JOIN mu m ON m.segment = r.segment
        WHERE r.h IN (6, 7)
    ),
    caln AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY segment),
    q AS (
        SELECT c.segment, c.n_cal, r.resid AS q_cents
        FROM caln c
        JOIN (
            SELECT segment, resid,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY resid, o_orderkey) AS rk
            FROM cal
        ) r ON r.segment = c.segment
           AND r.rk = least((9 * (c.n_cal + 1) + 9) // 10, c.n_cal)
    ),
    test AS (
        SELECT r.segment,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN abs(r.cents - m.mu_cents) <= q.q_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM rows_ r
        JOIN mu m ON m.segment = r.segment
        JOIN q ON q.segment = r.segment
        WHERE r.h >= 8
        GROUP BY r.segment
    )
    SELECT m.segment, m.n_train, q.n_cal, t.n_test,
           m.mu_cents, q.q_cents, t.n_covered,
           CAST(t.n_covered * 1000000 // greatest(t.n_test, 1) AS BIGINT) / 1e6
               AS coverage,
           (t.n_covered * 10 >= t.n_test * 8) AS coverage_ok
    FROM mu m JOIN q ON q.segment = m.segment JOIN test t ON t.segment = m.segment
    ORDER BY m.segment
    """,
    "SPLIT-CONFORMAL prediction intervals with a finite-sample coverage "
    "audit (Vovk et al. / Lei et al. split conformal — the ML-eval "
    "family's distribution-free guarantee, next to xcl's bootstrap CI "
    "and x73's A/B readout): a deterministic 60/20/20 hash split "
    "(train/calibration/test) of orders; the per-segment predictor is "
    "the train-split mean in integer cents (floor division — exact both "
    "engines on non-negative operands); the conformal radius is the "
    "EXACT ceil(0.9*(n_cal+1))-th smallest absolute calibration "
    "residual, picked by a deterministic rank window (residual, "
    "orderkey tie-break; k capped at n_cal via least, ceil as "
    "(9*(n+1)+9)//10 on non-negative ints); held-out coverage is then "
    "audited on the test split with an integer-quantized ratio and an "
    "80%-floor integer cross-multiplied flag (the guarantee is >= 90% "
    "marginal coverage in expectation; a finite test split fluctuates, "
    "hence the loose audit floor). Scale shape: one fact-dim join, one "
    "train rollup; the rank window runs per segment over the "
    "CALIBRATION split only (20% of rows) — at larger scale swap the "
    "exact order statistic for operators/quantiles' histogram path; "
    "the (segment -> mu, q) tables are |segments| rows, broadcast by "
    "AQE",
    ("quality", "pipeline"),
)
def xfb_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    rows_ = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.pmod(
                dedup_ops.portable_hash(F.col("o_orderkey").cast("string"), F.lit("cp")),
                F.lit(10),
            ).alias("h"),
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
    )
    mu = (
        rows_.filter(F.col("h") < 6)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.expr("cast(sum(cents) as bigint) div cast(count(1) as bigint)").alias(
                "mu_cents"
            ),
        )
    )
    cal = (
        rows_.filter(F.col("h").isin(6, 7))
        .join(mu.select("segment", "mu_cents"), "segment")
        .select(
            "segment",
            F.abs(F.col("cents") - F.col("mu_cents")).alias("resid"),
            "o_orderkey",
        )
    )
    caln = cal.groupBy("segment").agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    # the rank frame renames its key: both frames derive from `cal`, so
    # a bare segment == segment condition carries one expression id and
    # leans on Spark's dataset-id self-join disambiguation (it resolves
    # correctly today but warns "trivially true equals predicate" — an
    # engine-version change in that resolution would silently cross-join)
    ranked = cal.select(
        F.col("segment").alias("__rseg"),
        "resid",
        F.row_number()
        .over(W.partitionBy("segment").orderBy("resid", "o_orderkey"))
        .alias("rk"),
    )
    q = caln.join(
        ranked,
        (F.col("rk") == F.least(F.expr("(9 * (n_cal + 1) + 9) div 10"), F.col("n_cal")))
        & (F.col("__rseg") == F.col("segment")),
    ).select("segment", "n_cal", F.col("resid").alias("q_cents"))
    test = (
        rows_.filter(F.col("h") >= 8)
        .join(mu.select("segment", "mu_cents"), "segment")
        .join(q.select("segment", "q_cents"), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("mu_cents")) <= F.col("q_cents"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        mu.join(q, "segment")
        .join(test, "segment")
        .select(
            "segment",
            "n_train",
            "n_cal",
            "n_test",
            "mu_cents",
            "q_cents",
            "n_covered",
            (
                F.expr("cast(n_covered * 1000000 div greatest(n_test, 1) as bigint)")
                / 1e6
            ).alias("coverage"),
            (F.col("n_covered") * 10 >= F.col("n_test") * 8).alias("coverage_ok"),
        )
        .orderBy("segment")
    )


# nDCG@10 positional discount weights: floor(1e9 / log2(rank + 1)),
# computed ONCE here (the xd8 literal-table idiom — both engines
# consume the identical integer literals, no query-time logarithms;
# formula-pinned in tests/test_statistics_ops.py).
_NDCG_W = [
    1000000000, 630929753, 500000000, 430676558, 386852807,
    356207187, 333333333, 315464876, 301029995, 289064826,
]


def _ndcg_w_case_sql(rk: str) -> str:
    whens = " ".join(f"WHEN {rk} = {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W))
    return f"CASE {whens} ELSE 0 END"


@query(
    "xdc_ndcg_ranking_eval",
    f"""
    WITH per AS (
        SELECT n.n_name, s.s_suppkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev,
               CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, s.s_suppkey
    ),
    graded AS (
        SELECT n_name, s_suppkey, rev,
               4 - ntile(4) OVER (PARTITION BY n_name
                                  ORDER BY n_orders DESC, s_suppkey) AS rel
        FROM per
    ),
    ranked AS (
        SELECT n_name,
               (CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END) AS gain,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY rev DESC, s_suppkey) AS sys_rk,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY rel DESC, s_suppkey) AS ideal_rk
        FROM graded
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(gain AS BIGINT) * {_ndcg_w_case_sql("sys_rk")}) AS BIGINT) AS dcg_q,
           CAST(sum(CAST(gain AS BIGINT) * {_ndcg_w_case_sql("ideal_rk")}) AS BIGINT) AS idcg_q,
           CASE WHEN CAST(sum(CAST(gain AS BIGINT) * {_ndcg_w_case_sql("ideal_rk")}) AS BIGINT) = 0
                THEN 0.0
                ELSE CAST(CAST(sum(CAST(gain AS BIGINT) * {_ndcg_w_case_sql("sys_rk")}) AS BIGINT) * 1000000
                          // CAST(sum(CAST(gain AS BIGINT) * {_ndcg_w_case_sql("ideal_rk")}) AS BIGINT)
                          AS BIGINT) / 1e6
           END AS ndcg_at_10
    FROM ranked GROUP BY n_name ORDER BY n_name
    """,
    "nDCG@10 RANKING EVALUATION (the IR-eval closer for the ranking "
    "family — x91 Borda and xco RRF PRODUCE rankings, x63 BM25 scores "
    "relevance; nothing evaluated one until now): per nation, the "
    "'system' ranks suppliers by exact revenue cents and is judged "
    "against graded relevance = the supplier's order-reach quartile "
    "(ntile(4), deterministic (n_orders DESC, suppkey) tie-break; "
    "gains 2^rel - 1 in {{0,1,3,7}}). DCG and ideal-DCG are EXACT "
    "integer dot products: positional discounts floor(1e9/log2(rk+1)) "
    "are LITERAL integers computed once in python (the xd8 threshold "
    "idiom; formula-pinned) — no query-time logarithms on either "
    "engine — and nDCG is ONE quantized division with a zero-IDCG "
    "CASE guard. Scale shape: one fact rollup (supplier/nation dims "
    "join AQE-chosen), three windows + one groupBy on the "
    "(nation x supplier) AGGREGATE — corpus-size-free after the "
    "rollup; revenue (the system's internal sort key) kept exact via "
    "the integer-cents discount product: per-row round(price*100) and "
    "round(disc*100) each quantize a value whose TRUE magnitude is an "
    "integer (never near a half), then cents * (100 - disc_pct) "
    "multiplies and sums pure BIGINTs — the r8 FIFTH-latent-safe form, "
    "no float ever rounded at its own precision (r11 review: an "
    "earlier draft rounded the float product price*(100-d), which is "
    "provably engine-identical for non-negative values but "
    "float-bearing; the integer form needs no proof)",
    ("quality", "analytics"),
)
def xdc_ndcg_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    per = (
        t["lineitem"]
        .join(t["supplier"].select("s_suppkey", "s_nationkey"),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["nation"].select("n_nationkey", "n_name"),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "cast(round(l_extendedprice * 100) as bigint)"
                    " * (100 - cast(round(l_discount * 100) as bigint))"
                )
            )
            .cast("long")
            .alias("rev"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        )
    )
    wn = W.partitionBy("n_name")
    graded = per.select(
        "n_name",
        "s_suppkey",
        "rev",
        (
            F.lit(4)
            - F.ntile(4).over(wn.orderBy(F.col("n_orders").desc(), "s_suppkey"))
        ).alias("rel"),
    )
    ranked = graded.select(
        "n_name",
        F.when(F.col("rel") == 3, 7)
        .when(F.col("rel") == 2, 3)
        .when(F.col("rel") == 1, 1)
        .otherwise(0)
        .alias("gain"),
        F.row_number().over(wn.orderBy(F.col("rev").desc(), "s_suppkey")).alias("sys_rk"),
        F.row_number().over(wn.orderBy(F.col("rel").desc(), "s_suppkey")).alias("ideal_rk"),
    )

    def w_of(rk):
        # LONG literals: gain * 1e9-scale weights overflow a 32-bit
        # product under ANSI before the sum widens
        expr = F.lit(0).cast("long")
        for i, w in reversed(list(enumerate(_NDCG_W))):
            expr = F.when(F.col(rk) == i + 1, F.lit(w).cast("long")).otherwise(expr)
        return expr

    agg = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.col("gain").cast("long") * w_of("sys_rk")).cast("long").alias("dcg_q"),
        F.sum(F.col("gain").cast("long") * w_of("ideal_rk")).cast("long").alias("idcg_q"),
    )
    return agg.select(
        "n_name",
        "n_suppliers",
        "dcg_q",
        "idcg_q",
        F.when(F.col("idcg_q") == 0, F.lit(0.0))
        .otherwise(F.expr("cast(dcg_q * 1000000 div idcg_q as bigint)") / 1e6)
        .alias("ndcg_at_10"),
    ).orderBy("n_name")


@query(
    "xdd_cuped_ab_readout",
    """
    WITH base AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5('cuped:' || user_id), 1, 15))::BIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               CAST(sum(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                             AND day(ts) <= 15 THEN CAST(floor(value) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                             AND day(ts) > 15 THEN CAST(floor(value) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM base
    ),
    th AS (
        SELECT nn, sx, sy,
               nn * sxy - sx * sy AS c_num,
               nn * sxx - sx * sx AS d_den,
               nn * syy - sy * sy AS y_den
        FROM pooled
    ),
    arms AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS sx_a,
               CAST(sum(y) AS BIGINT) AS sy_a
        FROM base GROUP BY arm
    )
    SELECT a.arm, a.n_users, a.sx_a, a.sy_a,
           a.sy_a / a.n_users AS mean_y,
           CASE WHEN t.d_den = 0 THEN a.sy_a / a.n_users
                ELSE a.sy_a / a.n_users
                     - (t.c_num / t.d_den) * (a.sx_a / a.n_users - t.sx / t.nn)
           END AS adjusted_mean_y,
           CASE WHEN t.d_den = 0 THEN 0.0
                ELSE (t.c_num / t.d_den) END AS theta,
           CASE WHEN t.d_den = 0 OR t.y_den = 0 THEN 0.0
                ELSE (t.c_num / t.d_den) * (t.c_num / t.y_den) END AS var_reduction
    FROM arms a CROSS JOIN th t
    ORDER BY a.arm
    """,
    "CUPED variance-reduced A/B readout (Deng et al. 2013 — the "
    "experimentation family's continuous-metric upgrade: x73 reads out "
    "binary conversion proportions, this adjusts a REVENUE metric with "
    "each user's own pre-period behavior): per user, x = pre-period "
    "(day<=15) and y = experiment-period (day>15) purchase dollars "
    "(floor(value) — exact integers both engines, no halfway rounding), "
    "theta = cov(x,y)/var(x) from POOLED exact BIGINT sums (c_num = "
    "N*Sxy - Sx*Sy over d_den = N*Sxx - Sx^2), and per-arm adjusted "
    "mean = mean_y - theta*(mean_x_arm - mean_x_pooled). Every division "
    "is exact-BIGINT in / exact-BIGINT out to IEEE doubles in ONE fixed "
    "expression tree mirrored verbatim in the oracle — the x37/xce "
    "idiom: correctly-rounded ops over identical integers give "
    "bit-identical doubles, so the raw doubles ship unrounded. "
    "var_reduction = rho^2 = c_num^2/(d_den*y_den) reported alongside "
    "(the fraction of metric variance CUPED removes). Degenerate "
    "zero-variance denominators CASE-guarded on both engines (x73 "
    "rule). BIGINT headroom: N*Sxy at dollar scale fits to ~1e5 users "
    "x 1e4-dollar user totals; beyond that pre-scale the covariate. "
    "Scale shape: one user rollup, one 2-row arm rollup, pooled sums "
    "ride a broadcast one-row cross join — corpus-size-free after the "
    "first aggregation",
    ("events", "analytics", "quality"),
)
def xdd_cuped_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    is_purch = (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    base = ev.groupBy("user_id").agg(
        F.sum(
            F.when(is_purch & (F.dayofmonth("ts") <= 15), F.expr("cast(floor(value) as bigint)"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(is_purch & (F.dayofmonth("ts") > 15), F.expr("cast(floor(value) as bigint)"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("y"),
    ).select(
        F.when(
            F.pmod(dedup_ops.portable_hash(F.col("user_id").cast("string"), F.lit("cuped")), F.lit(2)) == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        "x",
        "y",
    )
    pooled = base.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    th = pooled.select(
        "nn",
        "sx",
        "sy",
        (F.col("nn") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("c_num"),
        (F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("d_den"),
        (F.col("nn") * F.col("syy") - F.col("sy") * F.col("sy")).alias("y_den"),
    )
    arms = base.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sx_a"),
        F.sum("y").cast("long").alias("sy_a"),
    )
    j = arms.crossJoin(F.broadcast(th))
    mean_y = F.col("sy_a") / F.col("n_users")
    theta = F.col("c_num") / F.col("d_den")
    return j.select(
        "arm",
        "n_users",
        "sx_a",
        "sy_a",
        mean_y.alias("mean_y"),
        F.when(F.col("d_den") == 0, mean_y)
        .otherwise(
            mean_y - theta * (F.col("sx_a") / F.col("n_users") - F.col("sx") / F.col("nn"))
        )
        .alias("adjusted_mean_y"),
        F.when(F.col("d_den") == 0, F.lit(0.0)).otherwise(theta).alias("theta"),
        F.when((F.col("d_den") == 0) | (F.col("y_den") == 0), F.lit(0.0))
        .otherwise(theta * (F.col("c_num") / F.col("y_den")))
        .alias("var_reduction"),
    ).orderBy("arm")


@query(
    "dedup_region_apply",
    r"""
    WITH words AS (SELECT doc_id, regexp_split_to_array(text, '\s+') w FROM documents),
    spans AS (
        SELECT doc_id, i AS pos,
               ('0x' || substr(md5('0:' || concat_ws(' ', w[i+1], w[i+2], w[i+3],
                    w[i+4], w[i+5], w[i+6], w[i+7], w[i+8])), 1, 15))::BIGINT AS span_h
        FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS i
              FROM words WHERE len(w) >= 8)
    ),
    dup AS (SELECT span_h FROM spans GROUP BY span_h HAVING count(DISTINCT doc_id) >= 2),
    dpos AS (SELECT s.doc_id, s.pos FROM spans s JOIN dup d ON d.span_h = s.span_h),
    marked AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                    THEN 1 ELSE 0 END AS brk
        FROM dpos
    ),
    grp AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM marked
    ),
    regions AS (
        SELECT doc_id, min(pos) + 1 AS r_start, max(pos) + 8 AS r_end
        FROM grp GROUP BY doc_id, g
    ),
    covered AS (
        SELECT DISTINCT doc_id, unnest(range(r_start, r_end + 1)) AS wp
        FROM regions
    ),
    stream AS (
        SELECT doc_id, i + 1 AS wp, w[i+1] AS word
        FROM (SELECT doc_id, w, unnest(range(0, len(w))) AS i FROM words)
        WHERE length(w[i+1]) >= 1
    ),
    kept AS (
        SELECT s.doc_id, s.wp, s.word
        FROM stream s LEFT JOIN covered c ON c.doc_id = s.doc_id AND c.wp = s.wp
        WHERE c.wp IS NULL
    ),
    per AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_kept,
               md5(coalesce(string_agg(word, ' ' ORDER BY wp), '')) AS cleaned_md5
        FROM kept GROUP BY doc_id
    ),
    nw AS (SELECT doc_id, len(w) AS n_words FROM words)
    SELECT n.doc_id,
           CAST(n.n_words AS BIGINT) AS n_words,
           CAST(coalesce(p.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(n.n_words - coalesce(p.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(p.cleaned_md5, md5('')) AS cleaned_md5
    FROM nw n LEFT JOIN per p ON p.doc_id = n.doc_id
    ORDER BY n.doc_id
    """,
    "DUPLICATED-REGION APPLICATION (the cut step that completes the "
    "Lee et al. pipeline — xd6 finds the maximal regions, this REMOVES "
    "them and value-checks the surviving text): every word position "
    "inside any maximal duplicated region is cut from every holder (the "
    "conservative both-copies policy — a keep-one policy needs a "
    "canonical owner per region, which overlapping region sets make "
    "ill-defined; pipelines wanting keep-one apply doc-level dedup "
    "first, dedup_apply), and the CLEANED document is verified by md5 "
    "of the kept words joined in position order — the hash proves the "
    "reconstruction (order, spacing, completeness), not just the "
    "counts. Covered positions come from exploding each region's "
    "bounded word range (equi-join against the word stream — never a "
    "per-doc range join); empty survivors coalesce to md5('') on both "
    "engines (DuckDB string_agg over zero rows is NULL where Spark's "
    "array_join is '' — the r5 rule). Scale shape: xd6's plan plus one "
    "positions explode bounded by total duplicated words, one word-"
    "stream anti-join on (doc, pos), one ordered per-doc rollup",
    ("dedup", "text", "pipeline"),
)
def dedup_region_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    runs = dedup_ops.dup_span_runs(docs, span_words=8, min_docs=2)
    covered = runs.select(
        "doc",
        F.explode(F.expr("sequence(region_start, region_end)")).alias("wp"),
    ).distinct()
    w = F.split(F.col("text"), r"\s+")
    stream = (
        docs.select(F.col("doc_id").alias("doc"), F.posexplode(w).alias("i", "word"))
        .filter(F.length("word") >= 1)
        .select("doc", (F.col("i") + 1).alias("wp"), "word")
    )
    kept = stream.join(covered, ["doc", "wp"], "left_anti")
    per = kept.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr("transform(sort_array(collect_list(struct(wp, word))), x -> x.word)"),
            )
        ).alias("cleaned_md5"),
    )
    nw = docs.select(F.col("doc_id").alias("doc"), F.size(w).alias("n_words"))
    return (
        nw.join(per, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
            F.coalesce(F.col("cleaned_md5"), F.md5(F.lit(""))).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "bpe_encode_frozen",
    _bpe_encode_sql(5),
    "FROZEN-TABLE BPE ENCODING of unseen text (the r10 verdict's named "
    "flagship — the production encode path xd7/bpe_segment_corpus left "
    "open: segmentation joins the training corpus to its OWN converged "
    "state, while a shipped tokenizer applies a frozen priority-ranked "
    "merge table to text the learner never saw): documents hash-split "
    "80/20 (portable md5, the x19 idiom); 5 merges learned on the TRAIN "
    "split only (text._bpe_iterate); the heldout split is encoded by "
    "applying the frozen pairs as 5 rank-ordered literal-pair window "
    "passes (text.bpe_encode) — rank order equals the classic min-rank "
    "apply loop because a formation-ordered table's pairs containing a "
    "merged symbol always rank later (min-rank-loop python replica "
    "pinned). Per heldout doc: words, BPE tokens, MERGED tokens (length "
    ">= 2 — proof the frozen table fired on unseen text), quantized "
    "tokens-per-word. Scale shape: learning stays vocabulary-bounded on "
    "the train split; the frozen apply is COLLECT-FREE — k literal-pair "
    "island passes all partitioned by w (ONE exchange for the whole "
    "chain, no checkpoints — contrast the learn loop's per-round "
    "argmax), then one vocab-sized broadcastable token-count join and "
    "one doc rollup. Oracle: the learn chain over the train split plus "
    "an e0..e5 encode chain with LEFT JOIN ON true pair broadcasts "
    "(rounds past convergence pass state through — the r11 rule)",
    ("text", "pipeline"),
)
def bpe_encode_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    bucket = F.pmod(
        dedup_ops.portable_hash(F.col("doc_id").cast("string"), F.lit("bpe_enc")),
        F.lit(5),
    )
    train = docs.filter(bucket < 4)
    held = docs.filter(bucket == 4)
    merges, _state = text_ops._bpe_iterate(
        train, "text", rounds=5, min_word_len=1,
        need_sizes=False, need_state=False,
    )
    pairs = [(m[1], m[2]) for m in merges]
    return text_ops.bpe_encode(held, pairs).orderBy("doc_id")


@query(
    "dsir_importance_selection",
    r"""
    WITH words AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
        FROM documents
    ),
    tgt_docs AS (SELECT doc_id, 1 AS t FROM documents WHERE lang = 'en'),
    vocab AS (
        SELECT w.word,
               CAST(count(*) AS BIGINT) AS cs,
               CAST(count(t.t) AS BIGINT) AS ct
        FROM words w LEFT JOIN tgt_docs t ON t.doc_id = w.doc_id
        GROUP BY w.word
    ),
    tot AS (
        SELECT CAST(sum(cs) AS BIGINT) AS ns,
               CAST(sum(ct) AS BIGINT) AS nt,
               CAST(count(*) AS BIGINT) AS v
        FROM vocab
    ),
    q AS (
        SELECT word,
               CAST(floor(ln(((ct + 1) * (ns + v)) / CAST((cs + 1) * (nt + v) AS DOUBLE))
                          * 1000000) AS BIGINT) AS q
        FROM vocab CROSS JOIN tot
    ),
    per AS (
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(q.q) AS BIGINT) AS imp_q
        FROM words w JOIN q ON q.word = w.word
        GROUP BY w.doc_id
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    ranked AS (
        SELECT d.doc_id, d.lang,
               CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(p.imp_q, 0) AS BIGINT) AS imp_q,
               row_number() OVER (ORDER BY coalesce(p.imp_q, 0) DESC, d.doc_id)
                   AS sel_rank
        FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
    )
    SELECT r.doc_id, r.lang, r.n_words, r.imp_q,
           CAST(r.sel_rank AS BIGINT) AS sel_rank,
           r.sel_rank * 5 <= n.n_docs AS selected
    FROM ranked r CROSS JOIN nd n
    ORDER BY r.doc_id
    """,
    "DSIR-STYLE IMPORTANCE SELECTION (Xie et al. 2023, Data Selection "
    "via Importance Resampling — the data-SELECTION gap in the pipeline "
    "family: x66 scores fluency against the corpus's own unigram LM, "
    "xdt_data_mixture resamples to target LANGUAGE proportions; this "
    "selects documents whose unigram feature distribution matches a "
    "TARGET domain): target = the English subcorpus, source = the full "
    "corpus; per-word importance = ln(p_target(w)/p_source(w)) under "
    "add-one smoothing over the joint vocabulary, quantized to SIGNED "
    "integer micro-nats ONCE at the vocab level (the x66 idiom — "
    "per-doc sums are then exact integers no summation order can "
    "flip; floor on the signed value is engine-identical given "
    "identical doubles, and no symmetric threshold touches individual "
    "q values — the r6 magnitude rule concerns thresholds, not "
    "ranking); the ln argument is ONE division of two exact BIGINT "
    "products (single rounding, fixture-pinned clear of floor "
    "boundaries like x66/x68/xb3); per-doc importance = exact integer "
    "sum, selection = top-20% by (importance DESC, doc_id) with the "
    "quota as an integer cross-multiplication (rank*5 <= n_docs, "
    "broadcast one-row count fold). Scale shape: vocab stats via ONE "
    "agg over a broadcast-marked left join (count(1) + count(marker), "
    "the decontaminate idiom), vocab-sized broadcastable q join back "
    "to the word stream, one doc rollup; the global rank window runs "
    "over the DOC-level aggregate — swap in the quantile-histogram "
    "threshold (xab) at corpus scales where that window matters. "
    "BIGINT headroom: (ct+1)*(ns+v) at ~1e9 tokens is ~1e18 — near "
    "the edge; at larger corpora split the ln into "
    "ln(ct+1)-ln(cs+1)+ln(ns+v)-ln(nt+v) (docstring-noted, not needed "
    "at fixture scale)",
    ("text", "pipeline", "quality"),
)
def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    docs = t["documents"]
    words = docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("word"))
    tgt = (
        docs.filter(F.col("lang") == "en")
        .select("doc_id")
        .withColumn("__t", F.lit(1))
    )
    vocab = (
        words.join(F.broadcast(tgt), "doc_id", "left")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cs"),
            F.count("__t").cast("long").alias("ct"),
        )
    )
    tot = vocab.agg(
        F.sum("cs").cast("long").alias("ns"),
        F.sum("ct").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    q = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        F.floor(
            F.log(
                ((F.col("ct") + 1) * (F.col("ns") + F.col("v")))
                / ((F.col("cs") + 1) * (F.col("nt") + F.col("v")))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("q"),
    )
    per = (
        words.join(F.broadcast(q), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("q").cast("long").alias("imp_q"),
        )
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    ranked = (
        docs.select("doc_id", "lang")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("imp_q", F.lit(0)).cast("long").alias("imp_q"),
        )
        .withColumn(
            "sel_rank",
            F.row_number()
            .over(W.orderBy(F.col("imp_q").desc(), "doc_id"))
            .cast("long"),
        )
    )
    return (
        ranked.crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "lang",
            "n_words",
            "imp_q",
            "sel_rank",
            (F.col("sel_rank") * 5 <= F.col("n_docs")).alias("selected"),
        )
        .orderBy("doc_id")
    )


@query(
    "xdl_bpe_fertility_by_lang",
    _bpe_fertility_sql(5),
    "TOKENIZER FERTILITY BY LANGUAGE (the standard tokenizer-evaluation "
    "readout, consumer of xdj's frozen-table encode path): the same "
    "80/20 split and 5 train-split merges, heldout docs encoded under "
    "the frozen table, then rolled up PER LANGUAGE — docs, words, "
    "tokens, merged-subword tokens, fertility (tokens per word) and "
    "merged fraction, both integer-quantized ratios of exact BIGINT "
    "sums. A corpus-level fertility table is how multilingual "
    "pipelines detect a tokenizer starving a language (high fertility "
    "= more tokens per word = less content per context window); the "
    "single-language merges learned here make non-en fertility "
    "visibly worse — exactly the readout's purpose. Scale shape: "
    "identical to xdj (vocab-bounded learn, collect-free frozen "
    "apply, broadcastable token-count join) plus one "
    "|langs|-cardinality rollup; oracle shares the e0..e5 encode "
    "chain generator and appends its own per-lang final",
    ("text", "pipeline", "quality"),
)
def xdl_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    bucket = F.pmod(
        dedup_ops.portable_hash(F.col("doc_id").cast("string"), F.lit("bpe_enc")),
        F.lit(5),
    )
    train = docs.filter(bucket < 4)
    held = docs.filter(bucket == 4)
    merges, _state = text_ops._bpe_iterate(
        train, "text", rounds=5, min_word_len=1,
        need_sizes=False, need_state=False,
    )
    pairs = [(m[1], m[2]) for m in merges]
    enc = text_ops.bpe_encode(held, pairs)
    return (
        enc.join(held.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_tokens"),
            F.sum("n_merged_tokens").cast("long").alias("n_merged"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_tokens",
            "n_merged",
            (
                F.expr(
                    "cast(n_tokens * 1000000 div greatest(n_words, 1) as bigint)"
                )
                / 1e6
            ).alias("fertility"),
            (
                F.expr(
                    "cast(n_merged * 1000000 div greatest(n_tokens, 1) as bigint)"
                )
                / 1e6
            ).alias("merged_frac"),
        )
        .orderBy("lang")
    )


# RBO@10 literal tables (p = 0.9): W[d] = floor((1-p) * p^(d-1) / d * 1e12)
# computed once in exact integer arithmetic (9^(d-1) * 1e12 // (d * 10^d));
# SW[m] = sum(W[m..10]) is the suffix sum — an item whose worse rank is m
# contributes W[d] to every depth d >= m, so per-item weight = SW[m] and
# the whole RBO sum needs NO depth explode. MAXQ = sum(d * W[d]) is the
# truncated-RBO maximum (overlap_d = d at every depth), the normalizer.
# Formula-pinned in tests/test_statistics_ops.py.
_RBO_W = [
    100000000000, 45000000000, 27000000000, 18225000000, 13122000000,
    9841500000, 7592014285, 5978711250, 4782969000, 3874204890,
]
_RBO_SW = [
    235416399425, 135416399425, 90416399425, 63416399425, 45191399425,
    32069399425, 22227899425, 14635885140, 8657173890, 3874204890,
]
_RBO_MAXQ = 651321559895


def _rbo_sw_case_sql(m: str) -> str:
    whens = " ".join(f"WHEN {m} = {i + 1} THEN {w}" for i, w in enumerate(_RBO_SW))
    return f"CASE {whens} ELSE 0 END"


@query(
    "rbo_rank_agreement",
    f"""
    WITH per AS (
        SELECT n.n_name, s.s_suppkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev,
               CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, s.s_suppkey
    ),
    ranked AS (
        SELECT n_name,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY rev DESC, s_suppkey) AS ra,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY n_orders DESC, s_suppkey) AS rb
        FROM per
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum({_rbo_sw_case_sql("greatest(ra, rb)")}) AS BIGINT) AS rbo_q,
           CAST(sum({_rbo_sw_case_sql("greatest(ra, rb)")}) * 1000000
                // {_RBO_MAXQ} AS BIGINT) / 1e6 AS rbo_norm
    FROM ranked GROUP BY n_name ORDER BY n_name
    """,
    "RANK-BIASED OVERLAP between two rankings (Webber et al. 2010 — "
    "the rank-AGREEMENT closer for the IR-eval family: xdc judges one "
    "ranking against graded relevance, this measures how much two "
    "rankings agree, top-weighted): per nation, suppliers ranked by "
    "exact revenue vs by order reach; truncated RBO@10 with p=0.9. "
    "The whole metric is ONE aggregation — an item whose worse rank "
    "m = max(rank_a, rank_b) <= 10 is in both depth-d prefixes for "
    "every d >= m, so its total contribution is the SUFFIX SUM "
    "SW[m] = sum(W[m..10]) of the literal per-depth weights "
    "floor((1-p)p^(d-1)/d * 1e12) — exact integers computed once in "
    "python (9^(d-1)*1e12 // (d*10^d), no query-time powers), "
    "formula-pinned, BIGINT throughout (the r10 INT32 lesson); "
    "rbo_norm divides by the literal truncated maximum sum(d*W[d]) "
    "with ONE integer-quantized division. Both row_number orders are "
    "unique (suppkey tie-break); no depth explode, no float until "
    "the final /1e6. Scale shape: xdc's fact rollup + two windows + "
    "one groupBy on the (nation x supplier) aggregate",
    ("quality", "analytics"),
)
def rbo_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    per = (
        t["lineitem"]
        .join(t["supplier"].select("s_suppkey", "s_nationkey"),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["nation"].select("n_nationkey", "n_name"),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "cast(round(l_extendedprice * 100) as bigint)"
                    " * (100 - cast(round(l_discount * 100) as bigint))"
                )
            )
            .cast("long")
            .alias("rev"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        )
    )
    wn = W.partitionBy("n_name")
    ranked = per.select(
        "n_name",
        F.row_number().over(wn.orderBy(F.col("rev").desc(), "s_suppkey")).alias("ra"),
        F.row_number()
        .over(wn.orderBy(F.col("n_orders").desc(), "s_suppkey"))
        .alias("rb"),
    )
    sw = F.lit(0).cast("long")
    for i, w in reversed(list(enumerate(_RBO_SW))):
        sw = F.when(F.greatest("ra", "rb") == i + 1, F.lit(w).cast("long")).otherwise(sw)
    agg = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(sw).cast("long").alias("rbo_q"),
    )
    return agg.select(
        "n_name",
        "n_suppliers",
        "rbo_q",
        (F.expr(f"cast(rbo_q * 1000000 div {_RBO_MAXQ}L as bigint)") / 1e6).alias(
            "rbo_norm"
        ),
    ).orderBy("n_name")


@query(
    "spearman_rank_corr",
    """
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    rx AS (
        SELECT
            2 * rank() OVER (ORDER BY x) + CAST(count(*) OVER (PARTITION BY x) AS BIGINT)
                - 1 - (CAST(count(*) OVER () AS BIGINT) + 1) AS cx,
            2 * rank() OVER (ORDER BY y) + CAST(count(*) OVER (PARTITION BY y) AS BIGINT)
                - 1 - (CAST(count(*) OVER () AS BIGINT) + 1) AS cy
        FROM per_user
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cx * cy) AS BIGINT) AS s_xy,
               CAST(sum(cx * cx) AS BIGINT) AS s_xx,
               CAST(sum(cy * cy) AS BIGINT) AS s_yy
        FROM rx
    )
    SELECT n, s_xy, s_xx, s_yy,
           CASE WHEN s_xx = 0 OR s_yy = 0 THEN 0
                ELSE CAST(floor(s_xy * 1.0 / (sqrt(s_xx * 1.0) * sqrt(s_yy * 1.0))
                                * 1000000) AS BIGINT) END / 1e6 AS spearman_rho
    FROM s
    """,
    "SPEARMAN RANK CORRELATION (the monotone-association closer next "
    "to x84's Pearson on the same per-user frame — Pearson sees only "
    "linear association; Spearman is Pearson on average ranks, robust "
    "to the heavy-tailed count distributions events produce): tied "
    "ranks via the exact integer identity 2*avg_rank = 2*rank() + "
    "tie_count - 1, CENTERED by the exact mean 2*(n+1)/2 (rank sums "
    "are tie-invariant, so sum(cx) == 0 exactly and the Pearson "
    "numerator collapses to sum(cx*cy)); all moments exact BIGINT "
    "sums of integer products, rho = ONE fixed double expression over "
    "identical integers (sqrt(s_xx)*sqrt(s_yy), two exact-BIGINT "
    "sqrts instead of sqrt of the overflowing product — headroom to "
    "~2e5 users, then 4n^3 nears 2^63 and the moments pre-scale), "
    "floor-quantized at 1e-6 (the x84 idiom), zero-variance guarded "
    "on both sides. The rank windows run over the per-user AGGREGATE "
    "(xab histogram swap at user scales where that matters)",
    ("events", "analytics"),
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    per_user = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    n_all = F.count(F.lit(1)).over(W.partitionBy()).cast("long")

    def c2(col: str):
        return (
            F.lit(2) * F.rank().over(W.orderBy(col))
            + F.count(F.lit(1)).over(W.partitionBy(col)).cast("long")
            - F.lit(1)
            - (n_all + F.lit(1))
        )

    rx = per_user.select(c2("x").alias("cx"), c2("y").alias("cy"))
    s = rx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cx") * F.col("cy")).cast("long").alias("s_xy"),
        F.sum(F.col("cx") * F.col("cx")).cast("long").alias("s_xx"),
        F.sum(F.col("cy") * F.col("cy")).cast("long").alias("s_yy"),
    )
    return s.select(
        "n",
        "s_xy",
        "s_xx",
        "s_yy",
        (
            F.expr(
                "CASE WHEN s_xx = 0 OR s_yy = 0 THEN 0"
                " ELSE CAST(floor(s_xy * 1.0 / (sqrt(s_xx * 1.0) * sqrt(s_yy * 1.0))"
                " * 1000000) AS BIGINT) END"
            )
            / 1e6
        ).alias("spearman_rho"),
    )


def _power_iter_sql(rounds: int) -> str:
    """Power-iteration oracle chain: e0 = the exploded (vec, pos, comp)
    embedding stream; v0 = the all-ones start vector in 1e6 integer
    units; per round, dot products and the matrix-vector product are
    sums of per-term FLOORED products — each term floor(comp * int) is
    an EXACT double (float32 mantissa 24 bits x |int| < 2^28 fits a
    53-bit mantissa; |comp| < 1 is a fixture contract), so the floors
    are boundary-free and the sums exact BIGINTs — and the iterate
    renormalizes by its max magnitude with pure integer division
    (magnitude + sign, G-shrink guard against (m*1e6) overflow at
    extreme row counts)."""
    parts = [
        r"""
    WITH e0 AS MATERIALIZED (
        -- CAST to DOUBLE first (the x86 rule): DuckDB would otherwise
        -- multiply FLOAT * BIGINT in single precision where Spark
        -- promotes to double
        SELECT vec_id, CAST(u.dim - 1 AS BIGINT) AS pos,
               CAST(u.comp AS DOUBLE) AS comp
        FROM (
            SELECT vec_id, unnest(embedding) AS comp,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ) u
    ),
    v0 AS MATERIALIZED (
        SELECT DISTINCT pos, CAST(1000000 AS BIGINT) AS vq FROM e0
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
    d{r} AS MATERIALIZED (
        SELECT e.vec_id,
               CAST(sum(CAST(floor(e.comp * v.vq) AS BIGINT)) AS BIGINT) AS dq
        FROM e0 e JOIN v{r - 1} v USING (pos)
        GROUP BY e.vec_id
    ),
    w{r} AS MATERIALIZED (
        SELECT e.pos,
               CAST(sum(CAST(floor(e.comp * d.dq) AS BIGINT)) AS BIGINT) AS wq
        FROM e0 e JOIN d{r} d USING (vec_id)
        GROUP BY e.pos
    ),
    v{r} AS MATERIALIZED (
        SELECT w.pos,
               CAST((CASE WHEN w.wq < 0 THEN -1 ELSE 1 END)
                    * (((abs(w.wq) // s.g) * 1000000) // greatest(s.mx // s.g, 1))
                    AS BIGINT) AS vq
        FROM w{r} w CROSS JOIN (
            SELECT greatest(max(abs(wq)), 1) AS mx,
                   greatest(greatest(max(abs(wq)), 1) // 1000000000000, 1) AS g
            FROM w{r}
        ) s
    )"""
        )
    parts.append(
        f"""
    SELECT v.pos, v.vq, w.wq, v.vq / 1e6 AS loading
    FROM v{rounds} v JOIN w{rounds} w USING (pos)
    ORDER BY v.pos
    """
    )
    return ",".join(parts[:-1]) + parts[-1]


@query(
    "pca_power_iteration",
    _power_iter_sql(5),
    "TOP PRINCIPAL COMPONENT by POWER ITERATION over the embedding "
    "gram matrix (the ML-linear-algebra closer next to xb6 centroids "
    "and the IVF family — v_{k+1} ~ X^T(Xv_k), 5 bounded rounds, "
    "never materializing the dim x dim covariance): every seam is "
    "EXACT INTEGERS — per-term products floor(comp * int) are exact "
    "doubles (float32 24-bit mantissa x |int| < 2^28 fits 53 bits; "
    "|comp| < 1 fixture-pinned), so the per-vector dots and per-dim "
    "matvec sums are order-independent BIGINT sums with NO float "
    "boundary anywhere (contrast the x66 ln class, which needs "
    "boundary contracts); renormalization is magnitude+sign integer "
    "division by the max component (G-shrink guards (m*1e6) overflow "
    "past ~1e12-scale iterates). Spark runs the measured kmeans "
    "pattern — per round two aggregations over the vec_id-partitioned "
    "persisted stream and ONE 64-int collect re-emitted as a literal "
    "array (in-plan iterate joins re-plan broadcast subtrees and "
    "benched 2-4x slower on the same shape); the oracle runs the "
    "identical integer chain as unrolled MATERIALIZED CTEs. "
    "Convergence note: fixture vectors are isotropic-random (tiny "
    "eigengap), so 5 rounds demonstrate the MECHANISM (x41's "
    "posture); real embedding spectra converge fast. Python replica "
    "pinned (the oracle mirrors the expression, so the hash gate "
    "alone cannot catch a mirrored math bug)",
    ("similarity", "analytics"),
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    t = _t(spark, sf_dir)
    emb = t["embeddings"].select("embedding")
    dim = 64  # fixture contract: embeddings are 64-dim (pinned below)
    vq = [1_000_000] * dim
    wq = [0] * dim
    # Each round is a single in-array pass (r14 rewrite of the former
    # posexplode + repartition.persist + per-round join, 3.1 s / 16
    # jobs -> ~2 s / 10): dq = sum_j floor(comp_j * v_j) folds per row
    # over zip_with(embedding, literal iterate) — no vec_id shuffle,
    # no join — and w re-ranks through one posexplode + groupBy(pos)
    # of the 64x-narrow integer rows. The HOF lambdas are interpreted
    # but touch |V| * 64 elements once per round; integer sums are
    # order-independent, so every value is bit-identical to the old
    # plan and the python replica.
    for _ in range(5):
        varr = F.lit(np.asarray(vq, dtype=np.int64))
        rowd = emb.select(
            "embedding",
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    varr,
                    lambda x, v: F.floor(x.cast("double") * v).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dq"),
        )
        w = (
            rowd.select(
                F.posexplode(
                    F.transform(
                        F.col("embedding"),
                        lambda x: F.floor(x.cast("double") * F.col("dq")).cast(
                            "long"
                        ),
                    )
                ).alias("pos", "u")
            )
            .groupBy("pos")
            .agg(F.sum("u").cast("long").alias("wq"))
        )
        wq_rows = sorted((r.pos, r.wq) for r in w.collect())
        wq = [int(q) for _, q in wq_rows]
        M = max(max(abs(q) for q in wq), 1)
        G = max(M // 10**12, 1)
        den = max(M // G, 1)
        vq = [
            (1 if q >= 0 else -1) * (((abs(q) // G) * 1_000_000) // den)
            for q in wq
        ]
    rows = [(p, int(vq[p]), int(wq[p]), vq[p] / 1e6) for p in range(dim)]
    return spark.createDataFrame(
        rows, "pos long, vq long, wq long, loading double"
    ).orderBy("pos")


@query(
    "xfp_cms_sketch_probe",
    r"""
    WITH words AS (
        SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents
    ),
    hashed AS (SELECT md5('cms:' || w) AS h FROM words),
    cells AS (
        SELECT r.r AS r,
               ('0x' || substr(h, r.r * 6 + 1, 6))::BIGINT % 256 AS b
        FROM hashed, (SELECT unnest([0, 1, 2, 3]) AS r) r
    ),
    cms AS (
        SELECT r, b, CAST(count(*) AS BIGINT) AS c
        FROM cells GROUP BY r, b
    ),
    probes AS (
        SELECT w, CAST(count(*) AS BIGINT) AS exact_n
        FROM words GROUP BY w
        ORDER BY exact_n DESC, w LIMIT 10
    ),
    est AS (
        SELECT p.w, p.exact_n, CAST(min(s.c) AS BIGINT) AS cms_est
        FROM probes p, (SELECT unnest([0, 1, 2, 3]) AS r) r
        JOIN cms s
          ON s.r = r.r
         AND s.b = ('0x' || substr(md5('cms:' || p.w), r.r * 6 + 1, 6))::BIGINT % 256
        GROUP BY p.w, p.exact_n
    )
    SELECT w, exact_n, cms_est,
           cms_est - exact_n AS overcount,
           cms_est >= exact_n AS never_underestimates
    FROM est
    ORDER BY exact_n DESC, w
    """,
    "COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005 — completes the "
    "sketch family next to x44 HLL cardinality, x45 Misra-Gries heavy "
    "hitters and the MinHash/SimHash signatures): 4 rows x 256 buckets "
    "of portable-md5 counters built in ONE map-side-combinable "
    "aggregation over the word stream (the sketch is 1024 cells — "
    "mergeable across shards/streams by cell-wise addition, the "
    "production use), then the top-10 exact words are probed back: "
    "estimate = min over the 4 rows of the word's bucket counter, "
    "verified in-query against the exact counts with the structural "
    "guarantee cms_est >= exact_n (CMS never underestimates) shipped "
    "as a column. All integers end-to-end; ONE portable md5 per word "
    "with four independent 6-hex-digit slices as the row hashes, so "
    "both engines address identical cells at a quarter of the hash "
    "cost. "
    "Scale shape: the sketch build is corpus-linear with a "
    "1024-row output (the whole point at 100 TB: a fixed-size "
    "mergeable summary); the probe side touches only the top-k "
    "aggregate",
    ("sketch", "text", "aggregation"),
)
def xfp_cms_sketch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    words = t["documents"].select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    )
    rows_ = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("r")
    # ONE md5 per word, four independent 6-hex-digit slices as the row
    # hashes — 4x less hashing than per-row salted digests; the sketch
    # build is the corpus-linear cost at scale, so the constant matters
    bucket = F.expr("cast(conv(substring(__h, r * 6 + 1, 6), 16, 10) as bigint) % 256")
    cells = (
        words.select(F.md5(F.concat(F.lit("cms:"), F.col("w"))).alias("__h"))
        .select("__h", rows_)
        .select("r", bucket.alias("b"))
    )
    cms = cells.groupBy("r", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    probes = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "w")
        .limit(10)
    )
    probe_cells = (
        probes.select(
            "w", "exact_n", F.md5(F.concat(F.lit("cms:"), F.col("w"))).alias("__h")
        )
        .select("w", "exact_n", "__h", rows_)
        .select("w", "exact_n", "r", bucket.alias("b"))
    )
    est = (
        probe_cells.join(F.broadcast(cms), ["r", "b"])
        .groupBy("w", "exact_n")
        .agg(F.min("c").cast("long").alias("cms_est"))
    )
    return est.select(
        "w",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        (F.col("cms_est") >= F.col("exact_n")).alias("never_underestimates"),
    ).orderBy(F.col("exact_n").desc(), "w")


@query(
    "roc_auc_eval",
    """
    WITH scored AS (
        SELECT c.c_mktsegment AS segment,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS score_cents,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    ranked AS (
        SELECT segment, pos,
               2 * rank() OVER (PARTITION BY segment ORDER BY score_cents)
                 + CAST(count(*) OVER (PARTITION BY segment, score_cents) AS BIGINT)
                 - 1 AS r2
        FROM scored
    ),
    agg AS (
        SELECT segment,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(1 - pos) AS BIGINT) AS n_neg,
               CAST(sum(CASE WHEN pos = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r2_pos
        FROM ranked GROUP BY segment
    ),
    agg2 AS (
        SELECT segment, n_pos, n_neg,
               r2_pos - n_pos * (n_pos + 1) AS u2
        FROM agg
    )
    SELECT segment, n_pos, n_neg, u2,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(((u2 // greatest(u2 // 1000000000000, 1)) * 1000000)
                          // greatest((2 * n_pos * n_neg)
                                      // greatest(u2 // 1000000000000, 1), 1)
                          AS BIGINT) / 1e6
           END AS auc
    FROM agg2 ORDER BY segment
    """,
    "ROC-AUC VIA TIE-CORRECTED MANN-WHITNEY RANK SUMS (the "
    "classifier-discrimination closer next to xdc's nDCG ranking "
    "quality, xdo's Spearman association and xdb-family conformal "
    "coverage — AUC is THE standard binary-score readout and it is "
    "exactly the Mann-Whitney U statistic, so it needs no curve "
    "integration and no float thresholds): per market segment, does "
    "order VALUE discriminate URGENT orders? AUC = P(score_pos > "
    "score_neg) + P(=)/2 computed from the xdo doubled-average-rank "
    "identity (2*avg_rank = 2*rank() + tie_count - 1, an exact "
    "integer), summed over positives: u2 = 2*R_pos - n_pos*(n_pos+1) "
    "= 2*U with ties contributing exactly 1/2 each; auc = u2 / "
    "(2*n_pos*n_neg) as ONE integer-quantized division (1e-6) under "
    "the xdp G-shrink guard (g = max(u2 div 1e12, 1) divides both "
    "sides first — u2*1e6 would overflow at ~4e6 rows/segment, one "
    "decade past the repo's own 100x probes; the guard is exact "
    "whenever g = 1 and keeps the quotient within one quantum "
    "otherwise, r12 ADVICE fix). All "
    "BIGINT end-to-end — scores are 2dp-true prices in integer cents "
    "(the recovery class), ranks/counts/sums exact. Scale shape: one "
    "segment-keyed rank window over the orders-customer join (AQE "
    "broadcasts the dimension), one same-keyed aggregation — the "
    "groupBy reuses the window's hash partitioning, zero extra "
    "exchanges",
    ("orders", "customer", "analytics"),
)
def roc_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    scored = (
        t["orders"]
        .select(
            "o_custkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("score_cents"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .cast("long")
            .alias("pos"),
        )
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(F.col("c_mktsegment").alias("segment"), "score_cents", "pos")
    )
    r2 = (
        F.lit(2).cast("long")
        * F.rank().over(W.partitionBy("segment").orderBy("score_cents"))
        + F.count(F.lit(1)).over(W.partitionBy("segment", "score_cents")).cast("long")
        - F.lit(1)
    )
    ranked = scored.select("segment", "pos", r2.alias("r2"))
    agg = ranked.groupBy("segment").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.lit(1).cast("long") - F.col("pos")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("pos") == 1, F.col("r2")).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("r2_pos"),
    )
    agg2 = agg.select(
        "segment",
        "n_pos",
        "n_neg",
        (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + F.lit(1).cast("long")))
        .cast("long")
        .alias("u2"),
    )
    return agg2.select(
        "segment",
        "n_pos",
        "n_neg",
        "u2",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(((u2 div greatest(u2 div 1000000000000, 1)) * 1000000)"
            " div greatest((2 * n_pos * n_neg)"
            " div greatest(u2 div 1000000000000, 1), 1) AS BIGINT) / 1e6 END"
        ).alias("auc"),
    ).orderBy("segment")


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Unrolled bounded-LPA oracle for ``graph_lpa_communities``:
    label states l0..l{rounds}, each round the plurality-label argmax
    (count DESC, label ASC) over the previous state joined one hop out.
    Every per-round CTE is ``AS MATERIALIZED`` (the kcore rule: DuckDB
    inlines plain CTEs, so an unrolled chain would otherwise compile
    exponential subtree copies). Synchronous semantics + deterministic
    tie-break make the fixed-depth chain a total function identical to
    the Spark loop on any fixture."""
    ctes = [
        "items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    )""",
        "und AS MATERIALIZED (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS p, u AS lbl FROM und)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""c{r} AS MATERIALIZED (
        SELECT e.u, l.lbl, count(*) AS c
        FROM und e JOIN l{r - 1} l ON l.p = e.v
        GROUP BY e.u, l.lbl
    )"""
        )
        ctes.append(
            f"""l{r} AS MATERIALIZED (
        SELECT u AS p, lbl FROM (
            SELECT u, lbl,
                   row_number() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn
            FROM c{r}
        ) WHERE rn = 1
    )"""
        )
    cte_sql = ",\n    ".join(ctes)
    return f"""
    WITH {cte_sql}
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members
    FROM l{rounds} GROUP BY lbl ORDER BY community
    """


@query(
    "graph_lpa_communities",
    _lpa_oracle_sql(),
    "LABEL-PROPAGATION COMMUNITIES (bounded synchronous LPA, Raghavan "
    "et al. 2007 — the community-DETECTION closer for the graph "
    "family: CC finds reachability classes, kcore strips periphery by "
    "degree, PageRank ranks by centrality; LPA finds internally-DENSE "
    "groups, the curation lens that splits a connected co-purchase "
    "blob into its actual product neighborhoods): support-2 "
    "co-purchase edges (the kcore graph), labels start as own part "
    "key, then exactly 4 synchronous rounds of adopt-the-plurality-"
    "neighbor-label (tie -> smallest label); output = per-community "
    "member counts. Synchronous updates + deterministic tie-break "
    "make the bounded iteration a total function both engines compute "
    "identically on ANY fixture (oracle = 4 unrolled MATERIALIZED "
    "argmax CTEs; the sync-LPA oscillation caveat is accepted "
    "semantics, not nondeterminism). Spark side: static "
    "both-directions edges cached pre-partitioned on the neighbor key "
    "(zero re-shuffles across rounds), per-round = one equi-join + "
    "plurality counts + a HashAggregate argmax via max(struct(count, "
    "-label)) — no sort window; each round's labels are consumed "
    "exactly once so the fixed 4-round chain runs as ONE linear-"
    "lineage action (the pagerank shape — localCheckpoint only every "
    "checkpoint_interval rounds for long runs); FIXED round count, "
    "probe-free (the x75 rule). All integer; no RNG, no update-order "
    "dependence",
    ("lineitem", "graph", "analytics"),
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import label_propagation

    t = _t(spark, sf_dir)
    edges = _copurchase_support2_edges(t)
    return (
        label_propagation(edges, "u", "v", rounds=4)
        .groupBy(F.col("community").cast("long").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .orderBy("community")
    )


@query(
    "xdx_link_prediction_cn",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    und AS MATERIALIZED (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    deg AS MATERIALIZED (
        SELECT u AS p, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u
    ),
    wedges AS (
        SELECT e1.v AS u, e2.v AS v
        FROM und e1
        JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN deg dc ON dc.p = e1.u AND dc.d <= 64
    ),
    cn AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors
        FROM wedges GROUP BY u, v
    ),
    cand AS (
        SELECT c.u, c.v, c.common_neighbors
        FROM cn c
        WHERE NOT EXISTS (
            SELECT 1 FROM edges e WHERE e.u = c.u AND e.v = c.v
        )
    )
    SELECT c.u, c.v, c.common_neighbors,
           du.d AS deg_u, dv.d AS deg_v,
           CAST(c.common_neighbors * 1000000
                // (du.d + dv.d - c.common_neighbors) AS BIGINT) / 1e6
               AS jaccard
    FROM cand c
    JOIN deg du ON du.p = c.u
    JOIN deg dv ON dv.p = c.v
    ORDER BY c.common_neighbors DESC, c.u, c.v
    LIMIT 20
    """,
    "COMMON-NEIGHBOR LINK PREDICTION (Liben-Nowell & Kleinberg 2003 — "
    "the graph family's PREDICTIVE member: CC/kcore/LPA describe the "
    "graph that exists, this scores the edges most likely MISSING, "
    "the recommender / knowledge-graph-completion primitive): on the "
    "support-2 co-purchase graph, top-20 non-adjacent part pairs by "
    "common-neighbor count with neighborhood-Jaccard cn/(du+dv-cn) "
    "integer-quantized at 1e-6. Spark side reuses the x94 IN-ARRAY "
    "wedge kernel: per-center sorted neighbor arrays of (v, deg_v) "
    "STRUCTS — each neighbor's degree is a window count over the "
    "symmetric edge list attached BEFORE collection, so the wedge "
    "explode carries both endpoint degrees and no degree join exists "
    "in the plan (the former deg_u/deg_v joins re-joined an aggregate "
    "onto its own lineage and straddled an AQE broadcast threshold — "
    "the r12 jobs_spread 10<->11 flip, fixed by the x87 window "
    "recipe) — map-side explode of in-array (i<j) pairs, one wedge "
    "row per common neighbor, ONE groupBy counts the score, then a "
    "left-anti join against the canonical edge set. Centers "
    "with degree > 64 are excluded ON BOTH SIDES (explicit semantics: "
    "hub-mediated co-occurrence is uninformative for link prediction "
    "AND the cap bounds wedge fan-out at sum(min(deg,64)^2) — the "
    "100 TB guard the LSH band-cap idiom uses); full degrees still "
    "feed the Jaccard. Top-20 via orderBy().limit() -> "
    "TakeOrderedAndProject (the xco rule), unique (cn DESC, u, v) "
    "order; all integers end-to-end",
    ("lineitem", "graph", "analytics"),
)
def xdx_link_prediction_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    edges = _copurchase_support2_edges(t)
    from pyspark.sql.window import Window as W

    from .operators.graph import _both_directions

    und = _both_directions(edges, "u", "v").distinct()
    # Attach each NEIGHBOR's degree before collecting adjacency: on the
    # symmetric distinct edge list, count() over partition __v IS
    # deg(v), so the wedge explode below carries both endpoint degrees
    # and the former deg_u/deg_v joins (an aggregate joined back onto
    # its own lineage — the x87 class; they sat on an AQE broadcast
    # threshold and flipped the job count 10<->11 WITHIN one session,
    # the only r12 jobs_spread entry) disappear from the plan entirely.
    und_d = und.select(
        "__u",
        F.struct(
            F.col("__v"), F.count(F.lit(1)).over(W.partitionBy("__v")).cast("long").alias("dv")
        ).alias("nbr"),
    )
    adj = und_d.groupBy("__u").agg(F.sort_array(F.collect_list("nbr")).alias("nb"))
    centers = adj.filter(F.size("nb") <= 64)
    pair_arr = F.flatten(
        F.transform(
            F.col("nb"),
            lambda s, i: F.transform(
                F.slice(F.col("nb"), i + F.lit(2), F.size(F.col("nb"))),
                lambda v2: F.array(s, v2),
            ),
        )
    )
    wedges = centers.select(F.explode(pair_arr).alias("p")).select(
        F.col("p")[0]["__v"].alias("u"),
        F.col("p")[0]["dv"].alias("deg_u"),
        F.col("p")[1]["__v"].alias("v"),
        F.col("p")[1]["dv"].alias("deg_v"),
    )
    cn = wedges.groupBy("u", "deg_u", "v", "deg_v").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors")
    )
    cand = cn.join(edges, ["u", "v"], "left_anti")
    return (
        cand
        .select(
            "u",
            "v",
            "common_neighbors",
            "deg_u",
            "deg_v",
            (
                F.expr(
                    "CAST(common_neighbors * 1000000"
                    " div (deg_u + deg_v - common_neighbors) AS BIGINT)"
                )
                / 1e6
            ).alias("jaccard"),
        )
        .orderBy(F.col("common_neighbors").desc(), "u", "v")
        .limit(20)
    )


@query(
    "xdy_seasonal_dow_profile",
    """
    WITH daily0 AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    b AS (SELECT min(day_i) AS dmin, max(day_i) AS dmax FROM daily0),
    spine AS (
        SELECT s.dmin, s.dmax, s.d AS day_i,
               COALESCE(d0.cents, 0) AS cents
        FROM (SELECT b.dmin, b.dmax,
                     unnest(generate_series(b.dmin, b.dmax)) AS d
              FROM b) s
        LEFT JOIN daily0 d0 ON d0.day_i = s.d
    ),
    ma AS (
        SELECT day_i, dmin, dmax, cents,
               CAST(sum(cents) OVER (ORDER BY day_i
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS ma7
        FROM spine
    ),
    interior AS (
        SELECT day_i % 7 AS dow, cents, 7 * cents - ma7 AS detr7
        FROM ma WHERE day_i BETWEEN dmin + 3 AND dmax - 3
    ),
    per_dow AS (
        SELECT dow,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(cents) AS BIGINT) AS revenue_cents,
               CAST(sum(detr7) AS BIGINT) AS detr7_sum
        FROM interior GROUP BY dow
    )
    SELECT dow, n_days, revenue_cents,
           CASE WHEN sum(revenue_cents) OVER () = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(revenue_cents * 1000000
                          // CAST(sum(revenue_cents) OVER () AS BIGINT) AS BIGINT) / 1e6
           END AS revenue_share,
           CAST(detr7_sum * 1000000 // (7 * n_days) AS BIGINT) / 1e6
               AS mean_detrended_cents
    FROM per_dow
    ORDER BY dow
    """,
    "DAY-OF-WEEK SEASONAL PROFILE (classical seasonal decomposition, "
    "weekly period — the time-series closer next to xcu's EWMA level, "
    "xdr's CUSUM changepoint and x39's anomaly flags: those react to "
    "shifts, this SEPARATES the recurring weekly shape from trend so "
    "capacity planning reads signal, not weekday artifact): daily "
    "purchase revenue on a DENSE integer epoch-day spine (gap days = "
    "0, no calendar/tz function anywhere — dow = epoch_day % 7, a "
    "monotone tz-free anchor, 0 = Thursday), trend = centered 7-day "
    "moving sum over the spine, detrended = 7*daily - ma7_sum (an "
    "integer cross-multiplication — no float trend mean is ever "
    "formed), interior days only (complete windows; the boundary rows "
    "would bias the profile), then per-dow mean detrended cents and "
    "revenue share as integer-quantized divisions (signed BIGINT "
    "truncation is engine-identical, the pinned r7 rule). Scale "
    "shape: everything after the one groupBy(day) runs on the "
    "bounded day axis",
    ("events", "analytics", "timeseries"),
)
def xdy_seasonal_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    daily0 = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            F.expr(
                "datediff(cast(ts as date), DATE '1970-01-01')"
            ).cast("long").alias("day_i"),
            F.expr("cast(round(value * 100) as bigint)").alias("__vc"),
        )
        .groupBy("day_i")
        .agg(F.sum("__vc").cast("long").alias("cents"))
    )
    b = daily0.agg(
        F.min("day_i").alias("dmin"), F.max("day_i").alias("dmax")
    )
    spine = (
        b.select(
            "dmin",
            "dmax",
            F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias("day_i"),
        )
        .join(daily0, "day_i", "left")
        .select(
            "day_i", "dmin", "dmax", F.coalesce("cents", F.lit(0)).alias("cents")
        )
    )
    ma = spine.select(
        "day_i",
        "dmin",
        "dmax",
        "cents",
        F.sum("cents")
        .over(W.orderBy("day_i").rowsBetween(-3, 3))
        .cast("long")
        .alias("ma7"),
    )
    interior = ma.filter(
        (F.col("day_i") >= F.col("dmin") + 3) & (F.col("day_i") <= F.col("dmax") - 3)
    ).select(
        (F.col("day_i") % 7).alias("dow"),
        "cents",
        (F.lit(7).cast("long") * F.col("cents") - F.col("ma7")).alias("detr7"),
    )
    per_dow = interior.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum("detr7").cast("long").alias("detr7_sum"),
    )
    return (
        per_dow.withColumn(
            "__tot", F.sum("revenue_cents").over(W.partitionBy()).cast("long")
        )
        .select(
            "dow",
            "n_days",
            "revenue_cents",
            F.expr(
                "CASE WHEN __tot = 0 THEN CAST(0 AS DOUBLE)"
                " ELSE CAST(revenue_cents * 1000000 div __tot AS BIGINT) / 1e6 END"
            ).alias("revenue_share"),
            (
                F.expr("CAST(detr7_sum * 1000000 div (7 * n_days) AS BIGINT)") / 1e6
            ).alias("mean_detrended_cents"),
        )
        .orderBy("dow")
    )


@query(
    "xdz_lang_confusion_eval",
    f"""
    WITH scores AS (SELECT doc_id, lang, {{LANG_SCORES}} FROM documents),
    ranked AS (
        SELECT doc_id, lang,
               list_sort([{{LANG_STRUCTS}}])[1] AS best
        FROM scores
    ),
    pred AS (
        SELECT lang AS labeled,
               CASE WHEN best.neg_s < 0 THEN best.l ELSE 'unknown' END AS detected
        FROM ranked
    ),
    cm AS (
        SELECT labeled, detected, CAST(count(*) AS BIGINT) AS c
        FROM pred GROUP BY labeled, detected
    ),
    lab AS (SELECT labeled AS cls, CAST(sum(c) AS BIGINT) AS lab_n FROM cm GROUP BY labeled),
    det AS (SELECT detected AS cls, CAST(sum(c) AS BIGINT) AS det_n FROM cm GROUP BY detected),
    tp AS (SELECT labeled AS cls, CAST(sum(c) AS BIGINT) AS tp FROM cm
           WHERE labeled = detected GROUP BY labeled),
    spine AS (
        SELECT COALESCE(l.cls, d.cls) AS cls,
               COALESCE(l.lab_n, 0) AS lab_n,
               COALESCE(d.det_n, 0) AS det_n,
               COALESCE(t.tp, 0) AS tp
        FROM lab l
        FULL OUTER JOIN det d ON d.cls = l.cls
        LEFT JOIN tp t ON t.cls = COALESCE(l.cls, d.cls)
    ),
    tot AS (
        SELECT cls, lab_n, det_n, tp,
               CAST(sum(lab_n) OVER () AS BIGINT) AS n_total,
               CAST(sum(tp) OVER () AS BIGINT) AS agree,
               CAST(sum(lab_n * det_n) OVER () AS BIGINT) AS pe
        FROM spine
    )
    SELECT cls, lab_n, det_n, tp,
           CASE WHEN det_n = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(tp * 1000000 // det_n AS BIGINT) / 1e6 END AS precision_q,
           CASE WHEN lab_n = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(tp * 1000000 // lab_n AS BIGINT) / 1e6 END AS recall_q,
           CASE WHEN det_n + lab_n = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(2 * tp * 1000000 // (det_n + lab_n) AS BIGINT) / 1e6
           END AS f1_q,
           CAST(agree * 1000000 // n_total AS BIGINT) / 1e6 AS accuracy_q,
           CASE WHEN n_total * n_total = pe THEN CAST(0 AS DOUBLE)
                ELSE CAST((n_total * agree - pe) * 1000000
                          // (n_total * n_total - pe) AS BIGINT) / 1e6
           END AS kappa_q
    FROM tot
    ORDER BY cls
    """.replace("{LANG_SCORES}", _lang_scores_sql()).replace(
        "{LANG_STRUCTS}",
        ", ".join(
            f"{{'neg_s': -score_{lang}, 'l': '{lang}'}}"
            for lang in sorted(text_ops.LANG_PROFILES)
        ),
    ),
    "CLASSIFIER CONFUSION-MATRIX EVALUATION WITH COHEN'S KAPPA (the "
    "model-eval closer for CLASSIFICATION, next to xdv's score-ranking "
    "AUC, xdc's nDCG and xdb's conformal coverage — and the first "
    "oracle-checked CALLER of the public operators/text.lang_id "
    "surface, previously pinned only by its doc_stats consistency "
    "test): the heuristic language-ID prediction vs the labeled lang "
    "over the full documents table; per-class support/detected/TP "
    "with precision tp/det, recall tp/lab and F1 via the exact "
    "integer identity 2tp/(det+lab) (no float p*r/(p+r) chain), plus "
    "overall accuracy and chance-corrected Cohen's kappa "
    "(N*agree - sum lab_k*det_k) / (N^2 - sum lab_k*det_k) — signed "
    "BIGINT numerator, truncating division engine-identical (pinned "
    "r7 rule); every metric ONE integer-quantized division, zero "
    "denominators CASE-guarded on both engines. Class spine = full "
    "outer of labeled and detected classes, so an 'unknown'-only "
    "prediction class still reports (precision 0 row). All window "
    "totals ride the class-level aggregate (bounded). Headroom: "
    "N^2*1e6 < 2^63 to ~3e6 docs, then pre-divide pe by gcd stages",
    ("documents", "text", "analytics"),
)
def xdz_lang_confusion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.text import lang_id

    t = _t(spark, sf_dir)
    pred = lang_id(t["documents"].select("doc_id", "lang", "text")).select(
        F.col("lang").alias("labeled"), F.col("detected_lang").alias("detected")
    )
    cm = pred.groupBy("labeled", "detected").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lab = cm.groupBy(F.col("labeled").alias("cls")).agg(
        F.sum("c").cast("long").alias("lab_n")
    )
    det = cm.groupBy(F.col("detected").alias("cls")).agg(
        F.sum("c").cast("long").alias("det_n")
    )
    tp = (
        cm.filter(F.col("labeled") == F.col("detected"))
        .groupBy(F.col("labeled").alias("cls"))
        .agg(F.sum("c").cast("long").alias("tp"))
    )
    spine = (
        lab.join(det, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("lab_n", F.lit(0)).cast("long").alias("lab_n"),
            F.coalesce("det_n", F.lit(0)).cast("long").alias("det_n"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    w = W.partitionBy()
    tot = spine.select(
        "cls",
        "lab_n",
        "det_n",
        "tp",
        F.sum("lab_n").over(w).cast("long").alias("n_total"),
        F.sum("tp").over(w).cast("long").alias("agree"),
        F.sum(F.col("lab_n") * F.col("det_n")).over(w).cast("long").alias("pe"),
    )
    return tot.select(
        "cls",
        "lab_n",
        "det_n",
        "tp",
        F.expr(
            "CASE WHEN det_n = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(tp * 1000000 div det_n AS BIGINT) / 1e6 END"
        ).alias("precision_q"),
        F.expr(
            "CASE WHEN lab_n = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(tp * 1000000 div lab_n AS BIGINT) / 1e6 END"
        ).alias("recall_q"),
        F.expr(
            "CASE WHEN det_n + lab_n = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(2 * tp * 1000000 div (det_n + lab_n) AS BIGINT) / 1e6 END"
        ).alias("f1_q"),
        F.expr("CAST(agree * 1000000 div n_total AS BIGINT) / 1e6").alias(
            "accuracy_q"
        ),
        F.expr(
            "CASE WHEN n_total * n_total = pe THEN CAST(0 AS DOUBLE)"
            " ELSE CAST((n_total * agree - pe) * 1000000"
            " div (n_total * n_total - pe) AS BIGINT) / 1e6 END"
        ).alias("kappa_q"),
    ).orderBy("cls")


@query(
    "content_defined_chunks",
    """
    WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
    bnd AS (
        SELECT doc_id, p FROM (
            SELECT doc_id, text,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p
            FROM documents
        )
        WHERE ('0x' || substr(md5('0:' || substr(text, p, 8)), 1, 15))::BIGINT
              % 64 = 0
    ),
    allb AS (
        SELECT DISTINCT doc_id, p FROM (
            SELECT doc_id, p FROM bnd
            UNION ALL SELECT doc_id, len AS p FROM d
        )
    ),
    chunks AS (
        SELECT doc_id,
               COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS s,
               p AS e
        FROM allb
    ),
    ct AS (
        SELECT md5(substr(d.text, c.s, c.e - c.s + 1)) AS h,
               CAST(c.e - c.s + 1 AS BIGINT) AS clen
        FROM chunks c JOIN d ON d.doc_id = c.doc_id
    ),
    per AS (
        SELECT h, CAST(count(*) AS BIGINT) AS cnt, CAST(min(clen) AS BIGINT) AS clen
        FROM ct GROUP BY h
    )
    SELECT CAST(sum(cnt) AS BIGINT) AS total_chunks,
           CAST(count(*) AS BIGINT) AS distinct_chunks,
           CAST(sum(cnt * clen) AS BIGINT) AS total_bytes,
           CAST(sum(clen) AS BIGINT) AS distinct_bytes,
           CAST(sum(clen) * 1000000 // sum(cnt * clen) AS BIGINT) / 1e6
               AS byte_dedup_ratio,
           CAST(sum(cnt * clen) * 1000000 // sum(cnt) AS BIGINT) / 1e6
               AS mean_chunk_len
    FROM per
    """,
    "CONTENT-DEFINED CHUNKING + chunk-store dedup audit (the "
    "storage-dedup primitive — FastCDC/LBFS-style: x54/xb0 cut FIXED "
    "windows, which shift at every insertion; content-defined "
    "boundaries (hash of the 8-gram AT a position selects it as a cut "
    "with P=1/64, expected ~64-char chunks) survive edits, so shared "
    "regions between near-identical documents dedup at the CHUNK "
    "level): boundary positions from the portable 60-bit md5 gram "
    "hash (engine-identical bits), every doc's end is a sentinel "
    "boundary (DISTINCT against real cut at end — never an empty "
    "tail chunk), chunk spans = lag window per doc, chunk identity = "
    "md5 of the substring, then ONE two-level rollup: total vs "
    "distinct chunks and bytes, byte-level dedup ratio and mean chunk "
    "length integer-quantized. Same-hash chunks share length, so "
    "distinct_bytes = sum(min(len)) is exact. Scale shape: "
    "corpus-linear position hashing (the CMS lesson: the hash IS the "
    "cost — production swaps the md5 for a gear/rolling hash, the "
    "boundary->islands->dedup plumbing is unchanged), one doc-keyed "
    "window on boundary rows only (~len/64 per doc), chunk-hash "
    "groupBy bounded by distinct content",
    ("documents", "text", "dedup"),
)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.dedup import portable_hash

    t = _t(spark, sf_dir)
    d = t["documents"].select("doc_id", "text", F.length("text").alias("len"))
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("len") - 7, F.lit(1)))
        ).alias("p"),
    )
    bnd = pos.filter(
        portable_hash(F.expr("substring(text, p, 8)")) % 64 == 0
    ).select("doc_id", "p")
    allb = bnd.unionByName(d.select("doc_id", F.col("len").alias("p"))).distinct()
    chunks = allb.select(
        "doc_id",
        (
            F.coalesce(
                F.lag("p").over(W.partitionBy("doc_id").orderBy("p")), F.lit(0)
            )
            + 1
        ).alias("s"),
        F.col("p").alias("e"),
    )
    ct = chunks.join(d.select("doc_id", "text"), "doc_id").select(
        F.md5(F.expr("substring(text, s, e - s + 1)")).alias("h"),
        (F.col("e") - F.col("s") + 1).cast("long").alias("clen"),
    )
    per = ct.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min("clen").cast("long").alias("clen"),
    )
    return per.agg(
        F.sum("cnt").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).cast("long").alias("total_bytes"),
        F.sum("clen").cast("long").alias("distinct_bytes"),
    ).select(
        "total_chunks",
        "distinct_chunks",
        "total_bytes",
        "distinct_bytes",
        (
            F.expr("CAST(distinct_bytes * 1000000 div total_bytes AS BIGINT)") / 1e6
        ).alias("byte_dedup_ratio"),
        (
            F.expr("CAST(total_bytes * 1000000 div total_chunks AS BIGINT)") / 1e6
        ).alias("mean_chunk_len"),
    )


@query(
    "cluster_silhouette",
    """
    WITH q AS (
        SELECT vec_id, label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
        SELECT label AS clabel, pos,
               CAST(sum(xq) AS BIGINT) // CAST(count(*) AS BIGINT) AS mq
        FROM q GROUP BY label, pos
    ),
    d2 AS (
        SELECT q.vec_id, q.label AS vlabel, c.clabel,
               CAST(sum((q.xq - c.mq) * (q.xq - c.mq)) AS BIGINT) AS dist_sq
        FROM q JOIN cent c ON c.pos = q.pos
        GROUP BY q.vec_id, q.label, c.clabel
    ),
    ab AS (
        SELECT vec_id, vlabel,
               CAST(max(CASE WHEN clabel = vlabel THEN dist_sq END) AS BIGINT) AS a,
               CAST(min(CASE WHEN clabel <> vlabel THEN dist_sq END) AS BIGINT) AS b
        FROM d2 GROUP BY vec_id, vlabel
    ),
    s AS (
        SELECT vec_id, vlabel,
               CASE WHEN b IS NULL OR greatest(a, b) = 0 THEN 0
                    ELSE (CASE WHEN b - a < 0 THEN -1 ELSE 1 END)
                         * (abs(b - a) * 1000000 // greatest(a, b)) END AS s_q
        FROM ab
    )
    SELECT vlabel AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN s_q > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_well_separated,
           CAST((CASE WHEN sum(s_q) < 0 THEN -1 ELSE 1 END)
                * (abs(CAST(sum(s_q) AS BIGINT)) // CAST(count(*) AS BIGINT))
                AS BIGINT) / 1e6 AS mean_silhouette
    FROM s GROUP BY vlabel
    ORDER BY label
    """,
    "CENTROID SILHOUETTE SCORE (simplified silhouette, squared-"
    "distance variant — the cluster-QUALITY judgment next to xb6's "
    "centroid separation audit and x51/xb6's cluster machinery: xb6 "
    "reports raw centroid geometry, this scores every VECTOR's "
    "assignment and rolls up per label): a = squared distance to the "
    "own-label centroid, b = min squared distance to any other "
    "centroid, s = (b - a)/max(a, b) in [-1, 1] — positive means the "
    "label holds the vector better than any alternative. Exactness: "
    "elements quantize to integer MILLI-units at source (floor of one "
    "IEEE double*1e3 — xb6 idiom, coarsened 1e6 -> 1e3 so that "
    "|b - a| * 1e6 stays within BIGINT: diffs <= 2e3, squares <= 4e6, "
    "64-dim sums <= 2.6e8, times 1e6 <= 2.6e14), centroids integer-"
    "div means, distances exact BIGINT sums of squares in any order; "
    "s is quantized per vector by MAGNITUDE+SIGN (the r6 rule: the "
    "s_q > 0 well-separated THRESHOLD must not skew across zero), "
    "per-label mean = magnitude+sign integer division of the exact "
    "sum. Scale shape: the centroid table (labels x dim) is "
    "broadcast-sized at any corpus scale; per-vector work is one "
    "map-side join fan of labels x dim terms, one (vec, label) agg — "
    "corpus-linear, no pairwise distances anywhere",
    ("embeddings", "similarity", "analytics"),
)
def cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    q = (
        t["embeddings"]
        .select("vec_id", "label", F.posexplode("embedding").alias("pos0", "x"))
        .select(
            "vec_id",
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("x").cast("double") * 1_000).cast("long").alias("xq"),
        )
    )
    cent = (
        q.groupBy(F.col("label").alias("clabel"), "pos")
        .agg(
            F.expr("CAST(sum(xq) div count(1) AS BIGINT)").alias("mq")
        )
    )
    d2 = (
        q.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", F.col("label").alias("vlabel"), "clabel")
        .agg(
            F.sum((F.col("xq") - F.col("mq")) * (F.col("xq") - F.col("mq")))
            .cast("long")
            .alias("dist_sq")
        )
    )
    ab = d2.groupBy("vec_id", "vlabel").agg(
        F.max(F.when(F.col("clabel") == F.col("vlabel"), F.col("dist_sq")))
        .cast("long")
        .alias("a"),
        F.min(F.when(F.col("clabel") != F.col("vlabel"), F.col("dist_sq")))
        .cast("long")
        .alias("b"),
    )
    s = ab.select(
        "vlabel",
        F.expr(
            "CASE WHEN b IS NULL OR greatest(a, b) = 0 THEN 0L"
            " ELSE (CASE WHEN b - a < 0 THEN -1L ELSE 1L END)"
            " * (abs(b - a) * 1000000 div greatest(a, b)) END"
        ).alias("s_q"),
    )
    return (
        s.groupBy(F.col("vlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.when(F.col("s_q") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_well_separated"),
            F.expr(
                "CAST((CASE WHEN sum(s_q) < 0 THEN -1L ELSE 1L END)"
                " * (abs(CAST(sum(s_q) AS BIGINT)) div count(1)) AS BIGINT)"
            ).alias("__ms_q"),
        )
        .select(
            "label",
            "n_vecs",
            "n_well_separated",
            (F.col("__ms_q") / 1e6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


_MARKOV_CHANNELS = ("click", "error", "signup", "view")
_MARKOV_SCALE = 1_000_000_000  # p vector in integer nano-probabilities


def _markov_oracle_sql(rounds: int = 8) -> str:
    """Unrolled bounded-absorption oracle for
    ``xe2_markov_removal_attribution``: journeys -> transition counts,
    a variant fan (base + one per removed channel), then p0..p{rounds}
    one-row-per-variant MATERIALIZED CTEs computing the within-k-steps
    conversion probability from every state in integer
    nano-probabilities (one truncating division per state per round:
    p'(s) = sum_t cnt_st * p(t) div tot_s, with the REMOVED channel's
    rows dropped but tot_s kept at the base total — redirected mass
    converts never, the standard removal-effect semantics)."""
    chans = _MARKOV_CHANNELS
    sc = _MARKOV_SCALE
    cnt_cols = ", ".join(
        f"CAST(COALESCE(sum(CASE WHEN t.to_s = '{c}' THEN t.cnt END), 0) AS BIGINT)"
        f" AS cnt_{c}"
        for c in chans
    )
    base_states = ["START"] + list(chans)
    p_cols0 = ", ".join(f"CAST(0 AS BIGINT) AS p_{s}" for s in base_states)
    num = " + ".join(f"t.cnt_{c} * p.p_{c}" for c in chans)
    upd = ", ".join(
        f"CAST(COALESCE(max(CASE WHEN from_s = '{s}' THEN p_new END), 0) AS BIGINT)"
        f" AS p_{s}"
        for s in base_states
    )
    rounds_sql = []
    for r in range(1, rounds + 1):
        rounds_sql.append(
            f"""p{r} AS MATERIALIZED (
        SELECT variant, {upd}
        FROM (
            SELECT t.variant, t.from_s,
                   ({num} + t.cnt_conv * {sc}) // t.tot AS p_new
            FROM tw t JOIN p{r - 1} p ON p.variant = t.variant
        ) GROUP BY variant
    )"""
        )
    chain = ",\n    ".join(rounds_sql)
    variants = ", ".join(f"('{c}')" for c in ("__BASE__",) + chans)
    return f"""
    WITH ev AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_rows,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS prior_conv
        FROM events
    ),
    kept AS (SELECT * FROM ev WHERE prior_conv = 0),
    steps AS (
        SELECT user_id, rn,
               CASE WHEN rn = 1 THEN 'START'
                    ELSE lag(event_type) OVER (PARTITION BY user_id ORDER BY rn)
               END AS from_s,
               event_type AS to_s
        FROM kept
    ),
    terminal AS (
        SELECT k.event_type AS from_s, 'NULL' AS to_s
        FROM kept k
        JOIN (SELECT user_id, max(rn) AS mx,
                     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_conv
              FROM kept GROUP BY user_id) u
          ON u.user_id = k.user_id AND u.mx = k.rn
        WHERE u.n_conv = 0
    ),
    trans AS (
        SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT from_s, to_s FROM steps UNION ALL SELECT from_s, to_s FROM terminal)
        GROUP BY from_s, to_s
    ),
    tot AS (SELECT from_s, CAST(sum(cnt) AS BIGINT) AS tot FROM trans GROUP BY from_s),
    variants(removed) AS (VALUES {variants}),
    tw AS MATERIALIZED (
        SELECT v.removed AS variant, t.from_s, {cnt_cols},
               CAST(COALESCE(sum(CASE WHEN t.to_s = 'purchase' THEN t.cnt END), 0)
                    AS BIGINT) AS cnt_conv,
               min(o.tot) AS tot
        FROM variants v
        JOIN trans t ON t.from_s <> v.removed AND t.to_s <> v.removed
        JOIN tot o ON o.from_s = t.from_s
        GROUP BY v.removed, t.from_s
    ),
    p0 AS MATERIALIZED (SELECT removed AS variant, {p_cols0} FROM variants),
    {chain},
    base AS (SELECT p_START AS p_base FROM p{rounds} WHERE variant = '__BASE__'),
    rem AS (
        SELECT variant AS channel, p_START AS p_removed
        FROM p{rounds} WHERE variant <> '__BASE__'
    ),
    eff AS (
        SELECT r.channel, b.p_base, r.p_removed,
               b.p_base - r.p_removed AS effect
        FROM rem r CROSS JOIN base b
    )
    SELECT channel,
           CAST(p_base AS BIGINT) / 1e9 AS p_conv_base,
           CAST(p_removed AS BIGINT) / 1e9 AS p_conv_removed,
           CAST(effect AS BIGINT) AS effect_q,
           CASE WHEN sum(effect) OVER () = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(effect * 1000000
                          // CAST(sum(effect) OVER () AS BIGINT) AS BIGINT) / 1e6
           END AS attribution_share
    FROM eff
    ORDER BY channel
    """


@query(
    "attribution_markov",
    _markov_oracle_sql(),
    "MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2014 — the "
    "MODEL-BASED member of the attribution family: x77/xcd credit the "
    "last touch, xe8_attribution_linear splits evenly; this asks "
    "counterfactual 'how much conversion probability disappears if "
    "channel c vanishes' on a first-order Markov model of the "
    "journeys): per user, events up to the FIRST purchase (unique "
    "(ts, event_id) order) form a chain START -> ... -> purchase "
    "(absorbing CONV) or -> NULL (non-converters); removal of channel "
    "c drops its transitions while keeping base out-totals (redirected "
    "mass never converts — the standard semantics); conversion "
    "probability = 8 bounded synchronous rounds of p'(s) = "
    "(sum_t cnt_st * p(t)) div tot_s in integer NANO-probabilities "
    "(ONE truncating division per state per round — deterministic and "
    "engine-identical; within-8-steps absorption is the declared "
    "total-function semantics, oracle = unrolled MATERIALIZED chain), "
    "attribution share = effect / sum(effects) integer-quantized. "
    "Scale shape: the corpus-heavy work is ONE pass (journey windows "
    "+ transition counts); the state space is CHANNEL-bounded, so the "
    "pivoted per-variant transition matrix (~45 rows) is collected "
    "ONCE and the 8 rounds fold driver-side in exact python ints "
    "(non-negative operands make python // identical to engine div — "
    "the kmeans/ivfpq bounded-collect pattern; the in-plan broadcast "
    "iteration re-planned 8 nested AQE subtrees at 34 jobs, r14). "
    "Headroom: cnt * 1e9 < 2^63 to ~9e9 transitions per edge; beyond, "
    "lower the probability scale",
    ("events", "analytics", "attribution"),
)
def attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    chans = _MARKOV_CHANNELS
    sc = _MARKOV_SCALE
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t["events"].select(
        "user_id",
        "event_type",
        F.row_number().over(wu).alias("rn"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1))
            .over(wu.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("prior_conv"),
    )
    kept = ev.filter(F.col("prior_conv") == 0)
    steps = kept.select(
        F.when(F.col("rn") == 1, F.lit("START"))
        .otherwise(F.lag("event_type").over(W.partitionBy("user_id").orderBy("rn")))
        .alias("from_s"),
        F.col("event_type").alias("to_s"),
    )
    last = (
        kept.groupBy("user_id")
        .agg(
            F.max("rn").alias("mx"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_conv"),
        )
        .filter(F.col("n_conv") == 0)
    )
    terminal = (
        kept.join(last, ["user_id"])
        .filter(F.col("rn") == F.col("mx"))
        .select(F.col("event_type").alias("from_s"), F.lit("NULL").alias("to_s"))
    )
    trans = (
        steps.unionByName(terminal)
        .groupBy("from_s", "to_s")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = trans.groupBy("from_s").agg(F.sum("cnt").cast("long").alias("tot"))
    variants = spark.createDataFrame(
        [(v,) for v in ("__BASE__",) + chans], "removed string"
    )
    tw = (
        variants.crossJoin(trans)
        .filter(
            (F.col("from_s") != F.col("removed")) & (F.col("to_s") != F.col("removed"))
        )
        .join(tot, "from_s")
        .groupBy(F.col("removed").alias("variant"), "from_s")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("to_s") == c, F.col("cnt"))), F.lit(0)
                )
                .cast("long")
                .alias(f"cnt_{c}")
                for c in chans
            ],
            F.coalesce(
                F.sum(F.when(F.col("to_s") == "purchase", F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("cnt_conv"),
            F.min("tot").cast("long").alias("tot"),
        )
    )
    base_states = ["START"] + list(chans)
    # The transition matrix is data-derived ONCE and channel-bounded
    # ((1+|chans|) variants x <=|chans|+1 states ~ 45 rows), so the 8
    # absorption rounds are the kmeans/ivfpq COLLECT pattern, not the
    # in-plan pivoted iteration: r14 measured the 8 nested
    # broadcast-join rounds at 34 jobs / 7.45 s (AQE re-plans every
    # level's broadcast subtree into extra stage jobs — the r7 kmeans
    # counter-lesson) vs ~4 jobs for collect-once + driver fold. The
    # fold is exact: every operand is a non-negative BIGINT (counts,
    # nano-probabilities, positive totals), so python // (floor) is
    # identical to the engines' truncating div — pinned by the
    # from-scratch replica test (test_markov_removal_matches_python_
    # replica) and the DuckDB-oracle hash gate.
    tw_rows = tw.collect()
    by_variant: dict[str, list] = {}
    for r in tw_rows:
        by_variant.setdefault(r["variant"], []).append(r)
    p_vec = {
        v: {s: 0 for s in base_states} for v in ("__BASE__",) + tuple(chans)
    }
    for _ in range(8):
        for v, cur in p_vec.items():
            new = {s: 0 for s in base_states}
            for r in by_variant.get(v, ()):
                if r["from_s"] in new:
                    num_i = (
                        sum(r[f"cnt_{c}"] * cur[c] for c in chans)
                        + r["cnt_conv"] * sc
                    )
                    new[r["from_s"]] = num_i // r["tot"]
            p_vec[v] = new
    p_base = p_vec["__BASE__"]["START"]
    eff = spark.createDataFrame(
        [(c, p_base, p_vec[c]["START"]) for c in chans],
        "channel string, p_base long, p_removed long",
    ).select(
        "channel",
        "p_base",
        "p_removed",
        (F.col("p_base") - F.col("p_removed")).cast("long").alias("effect"),
    )
    return eff.select(
        "channel",
        (F.col("p_base") / 1e9).alias("p_conv_base"),
        (F.col("p_removed") / 1e9).alias("p_conv_removed"),
        F.col("effect").alias("effect_q"),
        F.expr(
            "CASE WHEN sum(effect) OVER () = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(effect * 1000000 div CAST(sum(effect) OVER () AS BIGINT)"
            " AS BIGINT) / 1e6 END"
        ).alias("attribution_share"),
    ).orderBy("channel")


@query(
    "xe3_average_precision",
    """
    WITH scored AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS score_cents,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    ranked AS (
        SELECT segment, pos,
               CAST(row_number() OVER (PARTITION BY segment
                    ORDER BY score_cents DESC, o_orderkey) AS BIGINT) AS rk,
               CAST(sum(pos) OVER (PARTITION BY segment
                    ORDER BY score_cents DESC, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pos
        FROM scored
    ),
    terms AS (
        SELECT segment, cum_pos * 1000000000 // rk AS term_q
        FROM ranked WHERE pos = 1
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_pos,
           CAST(sum(term_q) AS BIGINT) AS ap_num_q,
           CAST(CAST(sum(term_q) AS BIGINT) // count(*) AS BIGINT) / 1e9
               AS average_precision
    FROM terms GROUP BY segment ORDER BY segment
    """,
    "AVERAGE PRECISION / PR-AUC (the imbalanced-class companion to "
    "xdv's ROC-AUC — with rare positives ROC flatters a classifier; "
    "AP weighs precision AT each positive's rank, the retrieval/"
    "rare-event standard): same orders-value-vs-URGENT frame as xdv; "
    "AP = mean over positives of precision@rank under the unique "
    "(score DESC, orderkey) order (tie-break is declared semantics, "
    "identical both engines — AP, unlike AUC, has no closed tie "
    "correction); each precision term cum_pos/rank is quantized to "
    "integer NANO-units at its source (the x66 idiom: one truncating "
    "division per positive, then exact BIGINT sums), the mean is one "
    "more integer division. One rank window feeding one cumulative "
    "window over the SAME (segment, score, key) sort — a single "
    "window node, then a same-keyed aggregation; headroom: term_q "
    "<= 1e9, sum < 2^63 to ~9e9 positives per segment",
    ("orders", "customer", "analytics"),
)
def xe3_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    scored = (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("score_cents"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .cast("long")
            .alias("pos"),
        )
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            "score_cents",
            "pos",
        )
    )
    wo = W.partitionBy("segment").orderBy(
        F.col("score_cents").desc(), F.col("o_orderkey")
    )
    ranked = scored.select(
        "segment",
        "pos",
        F.row_number().over(wo).cast("long").alias("rk"),
        F.sum("pos")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("cum_pos"),
    )
    terms = ranked.filter(F.col("pos") == 1).select(
        "segment", F.expr("cum_pos * 1000000000L div rk").alias("term_q")
    )
    return (
        terms.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pos"),
            F.sum("term_q").cast("long").alias("ap_num_q"),
        )
        .select(
            "segment",
            "n_pos",
            "ap_num_q",
            (F.expr("CAST(ap_num_q div n_pos AS BIGINT)") / 1e9).alias(
                "average_precision"
            ),
        )
        .orderBy("segment")
    )


@query(
    "xe4_mann_kendall_trend",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN b.cents > a.cents THEN 1
                    WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg
        FROM daily a
        JOIN daily b ON b.event_type = a.event_type AND b.day_i > a.day_i
    ),
    s AS (
        SELECT event_type, CAST(COALESCE(sum(sg), 0) AS BIGINT) AS s_stat
        FROM pairs GROUP BY event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS corr
        FROM (
            SELECT event_type, cents, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, cents
        ) g_outer
        GROUP BY event_type
    ),
    v AS (
        SELECT t.event_type, t.n_days, s.s_stat,
               t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.corr AS var18
        FROM ties t JOIN s ON s.event_type = t.event_type
    )
    SELECT event_type, n_days, s_stat, var18,
           CASE WHEN var18 = 0 OR s_stat = 0 THEN CAST(0 AS DOUBLE)
                ELSE (CASE WHEN s_stat < 0 THEN -1 ELSE 1 END)
                     * CAST(floor((abs(s_stat) - 1) * sqrt(CAST(18 AS DOUBLE))
                                  / sqrt(CAST(var18 AS DOUBLE)) * 1000000)
                            AS BIGINT) / 1e6
           END AS z_q,
           CASE WHEN var18 > 0
                     AND (abs(s_stat) - 1) * (abs(s_stat) - 1) * 180000
                         > var18 * 38416
                     AND s_stat > 0 THEN 'up'
                WHEN var18 > 0
                     AND (abs(s_stat) - 1) * (abs(s_stat) - 1) * 180000
                         > var18 * 38416
                     AND s_stat < 0 THEN 'down'
                ELSE 'none' END AS trend
    FROM v ORDER BY event_type
    """,
    "MANN-KENDALL TREND TEST (the nonparametric is-there-a-monotone-"
    "trend judgment for the time-series family — xce fits an OLS "
    "slope, xdr localizes a changepoint, EWMA smooths; this answers "
    "whether the daily series TRENDS at all, distribution-free): per "
    "event type over the daily revenue series, S = sum over day pairs "
    "of sign(x_later - x_earlier) — an exact integer from a bounded-"
    "day-axis self-join (the axis is days, so the pair fan is "
    "days^2/2 per type regardless of corpus size; ~9e18 headroom at "
    "10-year daily series, docstring-noted) with the RENAMED join key "
    "(xdb same-lineage rule); tie-corrected variance as the exact "
    "integer var18 = 18*Var = n(n-1)(2n+5) - sum t(t-1)(2t+5); "
    "z = (|S|-1)*sqrt(18)/sqrt(var18) with continuity correction, "
    "magnitude+sign floor-quantized (every operand an exact integer "
    "-> identical IEEE doubles, two correctly-rounded sqrts — the "
    "xdo denominator idiom); the p<0.05 verdict NEVER touches the "
    "float z: (|S|-1)^2 * 180000 > var18 * 38416 is the integer "
    "cross-multiplication of |z| > 1.96 (the r5 threshold rule)",
    ("events", "analytics", "timeseries"),
)
def xe4_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    daily = (
        t["events"]
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), DATE '1970-01-01')")
            .cast("long")
            .alias("day_i"),
            F.expr("cast(round(value * 100) as bigint)").alias("__vc"),
        )
        .groupBy("event_type", "day_i")
        .agg(F.sum("__vc").cast("long").alias("cents"))
    )
    b = daily.select(
        F.col("event_type").alias("__et"),
        F.col("day_i").alias("__dj"),
        F.col("cents").alias("__cj"),
    )
    pairs = daily.join(
        b,
        (F.col("__et") == F.col("event_type")) & (F.col("__dj") > F.col("day_i")),
    ).select(
        "event_type",
        F.when(F.col("__cj") > F.col("cents"), 1)
        .when(F.col("__cj") < F.col("cents"), -1)
        .otherwise(0)
        .cast("long")
        .alias("sg"),
    )
    s = pairs.groupBy("event_type").agg(
        F.coalesce(F.sum("sg"), F.lit(0)).cast("long").alias("s_stat")
    )
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n_groups"),
            F.sum("t").cast("long").alias("n_days"),
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("corr"),
        )
        .select("event_type", "n_days", "corr")
    )
    v = ties.join(s, "event_type").select(
        "event_type",
        "n_days",
        "s_stat",
        (
            F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
            - F.col("corr")
        )
        .cast("long")
        .alias("var18"),
    )
    return v.select(
        "event_type",
        "n_days",
        "s_stat",
        "var18",
        F.expr(
            "CASE WHEN var18 = 0 OR s_stat = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE (CASE WHEN s_stat < 0 THEN -1L ELSE 1L END)"
            " * CAST(floor((abs(s_stat) - 1) * sqrt(CAST(18 AS DOUBLE))"
            " / sqrt(CAST(var18 AS DOUBLE)) * 1000000) AS BIGINT) / 1e6 END"
        ).alias("z_q"),
        F.expr(
            "CASE WHEN var18 > 0 AND (abs(s_stat) - 1) * (abs(s_stat) - 1) * 180000"
            " > var18 * 38416 AND s_stat > 0 THEN 'up'"
            " WHEN var18 > 0 AND (abs(s_stat) - 1) * (abs(s_stat) - 1) * 180000"
            " > var18 * 38416 AND s_stat < 0 THEN 'down'"
            " ELSE 'none' END"
        ).alias("trend"),
    ).orderBy("event_type")


_DBSCAN_EPS2 = 1_500_000  # squared eps in milli-unit space (cos ~ 0.25)
_DBSCAN_MIN_NBRS = 2  # core = >= 2 OTHER points in range (minPts=3 w/ self)
# Loud ceiling on one blocking cell (r12, the VERDICT watch item made a
# CONTRACT): the per-cell kernel is O(cell^2 * dim) flops by design —
# exact DBSCAN within a cell — so a skewed giant cell must FAIL with a
# named mitigation rather than silently go quadratic at 100 TB. 1e5
# rows/cell ~ 6.4e14 BLAS flops, the edge of single-task sanity; the
# fixture cells are ~3 orders of magnitude under it (contract-tested).
_DBSCAN_MAX_CELL = 100_000


def _dbscan_cell_kernel(pdf):
    """Arrow-batched per-cell DBSCAN kernel for ``dbscan_embeddings``:
    one BLAS matmul per 2048-row block against the whole cell — exact
    despite float64 (every quantized component is an integer with
    |xq| <= ~1e3, so products <= ~1.6e7 and 64-dim sums <= ~1e9, far
    inside 2^53; the <= eps^2 compare is an integer compare).

    Because the blocker is a hard partition (pairs exist only WITHIN a
    label cell, by declared semantics), degrees, core flags, core-core
    components AND border labels all decompose per cell — so the whole
    classification runs here: integer min-label propagation with
    pointer jumping over the in-cell core-core edges (vectorized numpy,
    O(E log n)), min-core-neighbor border rule, noise = -1. The r14
    rewrite deleted the distributed CC loop this kernel used to feed
    (~60 scheduling-bound jobs for graphs that never cross cells).
    Emits only integer ids/flags (the r8 rule: python never touches
    driver-facing floats). Cells beyond ``_DBSCAN_MAX_CELL`` raise —
    the blocker (label today, finer IVF/grid cells at scale) must keep
    cells bounded; a loud error names the fix, silent O(cell^2) does
    not."""
    import numpy as np
    import pandas as pd

    if len(pdf) > _DBSCAN_MAX_CELL:
        raise ValueError(
            f"dbscan blocking cell holds {len(pdf)} rows > _DBSCAN_MAX_CELL="
            f"{_DBSCAN_MAX_CELL}; the per-cell kernel is O(cell^2) by design "
            "— use a finer blocking key (trained IVF cells / grid refine) "
            "so cells stay bounded instead of letting one cell go quadratic"
        )
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    n = len(ids)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vq"]])
    n2 = (X * X).sum(axis=1)
    out_a: list = []
    out_b: list = []
    step = 2048
    for s in range(0, n, step):
        blk = X[s : s + step]
        sqd = n2[s : s + step, None] + n2[None, :] - 2.0 * (blk @ X.T)
        ii, jj = np.nonzero(sqd <= float(_DBSCAN_EPS2))
        gi = ii + s
        keep = gi < jj  # sorted by vec_id, so index order IS id order
        out_a.append(gi[keep])
        out_b.append(jj[keep])
    ia = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
    ib = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
    # degree = number of OTHER in-range points; core threshold
    deg = np.bincount(ia, minlength=n) + np.bincount(ib, minlength=n)
    core = deg >= _DBSCAN_MIN_NBRS
    # components of the core-core subgraph: min-index propagation +
    # pointer jumping. Labels are always indices within the node's own
    # component (induction over relax/jump), monotone non-increasing,
    # and the component-min index m keeps labels[m] == m — so at the
    # fixpoint (no change over a full round ⇒ every edge's endpoints
    # agree) every member holds exactly the component-min index. Index
    # order IS vec_id order (sorted above), so ids[labels] is the
    # oracle's least(u, min(reach)) cluster id.
    cm = core[ia] & core[ib]
    ea, eb = ia[cm], ib[cm]
    labels = np.arange(n)
    while True:
        before = labels.copy()
        np.minimum.at(labels, ea, labels[eb])
        np.minimum.at(labels, eb, labels[ea])
        labels = labels[labels]
        if np.array_equal(labels, before):
            break
    cluster = np.where(core, ids[labels], np.int64(-1))
    # border: non-core point with >=1 core neighbor takes the MIN core
    # neighbor's cluster id (the oracle's min(cl.cl) rule)
    sentinel = np.iinfo(np.int64).max
    bmin = np.full(n, sentinel, dtype=np.int64)
    m1 = core[ia] & ~core[ib]
    np.minimum.at(bmin, ib[m1], cluster[ia[m1]])
    m2 = core[ib] & ~core[ia]
    np.minimum.at(bmin, ia[m2], cluster[ib[m2]])
    cluster = np.where(
        core, cluster, np.where(bmin < sentinel, bmin, np.int64(-1))
    )
    return pd.DataFrame(
        {
            "vec_id": ids,
            "is_core": core.astype("int32"),
            "cluster": cluster.astype("int64"),
        }
    )


@query(
    "dbscan_embeddings",
    f"""
    WITH RECURSIVE q AS (
        SELECT vec_id, label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM q a
        JOIN q b ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
        HAVING sum((a.xq - b.xq) * (a.xq - b.xq)) <= {_DBSCAN_EPS2}
    ),
    und AS (SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS nn FROM und GROUP BY u),
    core AS (SELECT u FROM deg WHERE nn >= {_DBSCAN_MIN_NBRS}),
    ce AS (
        SELECT e.u, e.v FROM und e
        JOIN core c1 ON c1.u = e.u
        JOIN core c2 ON c2.u = e.v
    ),
    reach(u, r) AS (
        SELECT u, v FROM ce
        UNION
        SELECT reach.u, e.v FROM reach JOIN ce e ON reach.r = e.u
    ),
    lab AS (SELECT u, least(u, min(r)) AS cl FROM reach GROUP BY u),
    corelab AS (
        SELECT c.u, COALESCE(l.cl, c.u) AS cl
        FROM core c LEFT JOIN lab l ON l.u = c.u
    ),
    border AS (
        SELECT e.u, min(cl.cl) AS cl
        FROM und e
        JOIN corelab cl ON cl.u = e.v
        WHERE e.u NOT IN (SELECT u FROM core)
        GROUP BY e.u
    ),
    roles AS (
        SELECT p.vec_id,
               CASE WHEN c.cl IS NOT NULL THEN 'core'
                    WHEN b.cl IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               COALESCE(c.cl, b.cl, -1) AS cluster
        FROM (SELECT vec_id FROM embeddings) p
        LEFT JOIN corelab c ON c.u = p.vec_id
        LEFT JOIN border b ON b.u = p.vec_id
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(sum(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
           CAST(sum(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_border,
           CAST(count(*) AS BIGINT) AS n_points
    FROM roles GROUP BY cluster ORDER BY cluster
    """,
    "DBSCAN DENSITY CLUSTERING over embeddings (Ester et al. 1996 — "
    "the density member of the clustering family: x51/xaf cluster by "
    "near-dup REACHABILITY alone, kmeans/IVF partition EVERYTHING; "
    "DBSCAN separates dense structure (core), its fringe (border) "
    "and outliers (noise) — the curation lens that finds both the "
    "over-represented clumps AND the junk): exact integer squared "
    "distances in milli-unit space (the cluster_silhouette (ex-xe1) quantization; eps^2 = "
    "1.5e6 ~ cosine 0.25 on unit vectors, core = >= 2 other points "
    "in range i.e. minPts=3 counting self — declared constants), "
    "candidates blocked by the coarse label cell (the x98 IVF-style "
    "declared semantics — at scale the blocker is the pluggable "
    "part, the density classification is the mechanism); clusters = "
    "connected components over CORE-CORE edges (recursive transitive "
    "closure in the oracle), isolated core points self-cluster, "
    "border points take the MIN core-neighbor cluster "
    "(deterministic), everything else is noise (cluster -1); output "
    "= per-cluster core/border/point counts. The blocker is a HARD "
    "partition (pairs never cross cells), so the whole "
    "classification decomposes per cell: ONE vectorized "
    "Arrow-batched applyInPandas kernel per label cell does the "
    "BLAS pair scan AND the integer min-label components (pointer "
    "jumping) AND the border rule — exact despite float64 (every "
    "intermediate an integer < 2^53), integer-only output (the r8 "
    "python-kernel rule); the r13 distributed-CC-loop version spent "
    "~60 scheduling-bound jobs on graphs that are cell-local by "
    "construction. Cell-size CONTRACT (r12): the kernel is O(cell^2) by "
    "design, so cells beyond _DBSCAN_MAX_CELL=1e5 raise a loud error "
    "naming the mitigation (finer blocking cells) instead of silently "
    "going quadratic; fixture cells contract-tested ~3 orders under "
    "the bound. All integer end-to-end; python replica replays the "
    "whole pipeline from raw floats",
    ("embeddings", "similarity", "graph", "analytics"),
)
def dbscan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    # Quantize in-array (the knn_graph_descent idiom): the embedding is
    # already position-ordered, so one F.transform computes vq with zero
    # shuffle — the former posexplode + groupBy/collect_list rebuild of
    # the same array cost two exchanges over 64x-exploded rows.
    vecs = t["embeddings"].select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1_000).cast("long"),
        ).alias("vq"),
    )
    # The whole classification runs in ONE Arrow kernel pass per label
    # cell (_dbscan_cell_kernel): the blocker is a hard partition, so
    # degrees, cores, core-core components and border labels never
    # cross cells — the distributed CC loop the r13 version fed was
    # ~60 scheduling-bound jobs spent on per-cell-local graphs. Every
    # point comes back exactly once with integer (is_core, cluster);
    # role strings and the per-cluster rollup stay JVM-side.
    roles = (
        vecs.groupBy("label")
        .applyInPandas(_dbscan_cell_kernel, "vec_id long, is_core int, cluster long")
        .select(
            "vec_id",
            F.when(F.col("is_core") == 1, F.lit("core"))
            .when(F.col("cluster") >= 0, F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.col("cluster").cast("long").alias("cluster"),
        )
    )
    return (
        roles.groupBy("cluster")
        .agg(
            F.sum(F.when(F.col("role") == "core", 1).otherwise(0))
            .cast("long")
            .alias("n_core"),
            F.sum(F.when(F.col("role") == "border", 1).otherwise(0))
            .cast("long")
            .alias("n_border"),
            F.count(F.lit(1)).cast("long").alias("n_points"),
        )
        .orderBy("cluster")
    )


@query(
    "xe6_seasonal_naive_mase",
    """
    WITH daily0 AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    b AS (SELECT event_type, min(day_i) AS dmin, max(day_i) AS dmax
          FROM daily0 GROUP BY event_type),
    spine AS (
        SELECT s.event_type, s.d AS day_i, COALESCE(d0.cents, 0) AS cents
        FROM (SELECT event_type, unnest(generate_series(dmin, dmax)) AS d FROM b) s
        LEFT JOIN daily0 d0 ON d0.event_type = s.event_type AND d0.day_i = s.d
    ),
    lagged AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day_i) AS r,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day_i) AS c1,
               lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day_i) AS c7
        FROM spine
    ),
    agg AS (
        SELECT event_type,
               CAST(sum(CASE WHEN r > n - 14 AND c7 IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               CAST(COALESCE(sum(CASE WHEN r > n - 14
                    THEN abs(cents - c7) END), 0) AS BIGINT) AS sum_test_abs,
               CAST(sum(CASE WHEN r >= 2 AND r <= n - 14 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_den,
               CAST(COALESCE(sum(CASE WHEN r >= 2 AND r <= n - 14
                    THEN abs(cents - c1) END), 0) AS BIGINT) AS sum_den_abs,
               CAST(COALESCE(sum(CASE WHEN r > n - 14 THEN
                    CASE WHEN abs(cents - c7) = 0 THEN 0
                         ELSE 2 * abs(cents - c7) * 1000000
                              // (abs(c7) + abs(cents)) END END), 0) AS BIGINT)
                   AS smape_sum_q
        FROM lagged
        GROUP BY event_type
    )
    SELECT event_type, n_test, sum_test_abs, n_den, sum_den_abs,
           CASE WHEN n_test = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(sum_test_abs // n_test AS BIGINT) / 100.0 END
               AS mae_seasonal_dollars,
           CASE WHEN sum_den_abs = 0 OR n_test = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(sum_test_abs * n_den * 1000000
                          // (sum_den_abs * n_test) AS BIGINT) / 1e6
           END AS mase,
           CASE WHEN n_test = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(smape_sum_q // n_test AS BIGINT) / 1e6 END AS smape
    FROM agg ORDER BY event_type
    """,
    "SEASONAL-NAIVE FORECAST EVALUATION: MASE + sMAPE (Hyndman & "
    "Koehler 2006 — the forecast-accuracy judgment that completes the "
    "time-series family: xdy EXTRACTS the weekly shape, this measures "
    "whether 'same weekday last week' actually predicts, the baseline "
    "every production forecaster must beat): per event type on the "
    "dense zero-filled day spine, forecast f_t = x_(t-7) over the "
    "last-14-day test window (a test row counts toward n_test only "
    "when its seasonal lag exists — c7 IS NOT NULL on both engines, "
    "r12 ADVICE fix: sub-21-day series otherwise kept NULL-skipped "
    "error rows in the denominator count, silently deflating "
    "MAE/sMAPE); MASE = test MAE over the IN-SAMPLE "
    "one-step naive MAE as ONE integer cross-multiplied division "
    "(sum_test*n_den*1e6 div (sum_den*n_test) — no float MAE is ever "
    "formed); sMAPE per test day 2|f-x|*1e6 div (|f|+|x|) quantized "
    "at its source (x66 idiom, both-zero guarded to 0), then an "
    "integer mean. Absolute errors of integer cents are exact; all "
    "window work rides the bounded day axis. Headroom: "
    "sum_test*n_den*1e6 < 2^63 to ~1e5-day series at 1e8-cent days",
    ("events", "analytics", "timeseries"),
)
def xe6_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    daily0 = (
        t["events"]
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), DATE '1970-01-01')")
            .cast("long")
            .alias("day_i"),
            F.expr("cast(round(value * 100) as bigint)").alias("__vc"),
        )
        .groupBy("event_type", "day_i")
        .agg(F.sum("__vc").cast("long").alias("cents"))
    )
    b = daily0.groupBy("event_type").agg(
        F.min("day_i").alias("dmin"), F.max("day_i").alias("dmax")
    )
    spine = (
        b.select(
            "event_type",
            F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias("day_i"),
        )
        .join(daily0, ["event_type", "day_i"], "left")
        .select("event_type", "day_i", F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    wt = W.partitionBy("event_type").orderBy("day_i")
    lagged = spine.select(
        "event_type",
        "cents",
        F.row_number().over(wt).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).cast("long").alias("n"),
        F.lag("cents", 1).over(wt).alias("c1"),
        F.lag("cents", 7).over(wt).alias("c7"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.sum(
            F.when(
                (F.col("r") > F.col("n") - 14) & F.col("c7").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_test"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("r") > F.col("n") - 14, F.abs(F.col("cents") - F.col("c7"))
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_test_abs"),
        F.sum(
            F.when((F.col("r") >= 2) & (F.col("r") <= F.col("n") - 14), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_den"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("r") >= 2) & (F.col("r") <= F.col("n") - 14),
                    F.abs(F.col("cents") - F.col("c1")),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_den_abs"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("r") > F.col("n") - 14,
                    F.expr(
                        "CASE WHEN abs(cents - c7) = 0 THEN 0L"
                        " ELSE 2 * abs(cents - c7) * 1000000"
                        " div (abs(c7) + abs(cents)) END"
                    ),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("smape_sum_q"),
    )
    return agg.select(
        "event_type",
        "n_test",
        "sum_test_abs",
        "n_den",
        "sum_den_abs",
        F.expr(
            "CASE WHEN n_test = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(sum_test_abs div n_test AS BIGINT) / 100.0 END"
        ).alias("mae_seasonal_dollars"),
        F.expr(
            "CASE WHEN sum_den_abs = 0 OR n_test = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(sum_test_abs * n_den * 1000000"
            " div (sum_den_abs * n_test) AS BIGINT) / 1e6 END"
        ).alias("mase"),
        F.expr(
            "CASE WHEN n_test = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(smape_sum_q div n_test AS BIGINT) / 1e6 END"
        ).alias("smape"),
    ).orderBy("event_type")


def _ece_bin_sql() -> str:
    """bin = 1 + count of train-decile boundaries strictly below the
    score (ties fall to the lower bin)."""
    return "1 + " + " + ".join(
        f"(CASE WHEN b.b{k} < s.score_cents THEN 1 ELSE 0 END)" for k in range(1, 10)
    )


@query(
    "calibration_ece",
    f"""
    WITH scored AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS score_cents,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos,
               ('0x' || substr(md5('split:' || o_orderkey), 1, 15))::BIGINT
                   % 1000000 AS bkt
        FROM orders
    ),
    train AS (SELECT * FROM scored WHERE bkt < 800000),
    test AS (SELECT * FROM scored WHERE bkt >= 800000),
    ranked AS (
        SELECT score_cents,
               CAST(row_number() OVER (ORDER BY score_cents, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM train
    ),
    bounds AS (
        SELECT {", ".join(f"max(CASE WHEN rn * 10 <= n * {k} THEN score_cents END) AS b{k}" for k in range(1, 10))}
        FROM ranked
    ),
    tr_binned AS (
        SELECT {_ece_bin_sql()} AS bin, s.pos
        FROM train s CROSS JOIN bounds b
    ),
    te_binned AS (
        SELECT {_ece_bin_sql()} AS bin, s.pos
        FROM test s CROSS JOIN bounds b
    ),
    tr AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_train,
               CAST(sum(pos) AS BIGINT) AS pos_train
        FROM tr_binned GROUP BY bin
    ),
    te AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(pos) AS BIGINT) AS pos_test
        FROM te_binned GROUP BY bin
    ),
    joined AS (
        SELECT te.bin, te.n_test, te.pos_test,
               COALESCE(tr.n_train, 0) AS n_train,
               COALESCE(tr.pos_train, 0) AS pos_train,
               CASE WHEN COALESCE(tr.n_train, 0) = 0 THEN 0
                    ELSE pos_train * 1000000 // tr.n_train END AS conf_q,
               pos_test * 1000000 // te.n_test AS acc_q
        FROM te LEFT JOIN tr ON tr.bin = te.bin
    )
    SELECT bin, n_train, n_test,
           CAST(conf_q AS BIGINT) / 1e6 AS confidence,
           CAST(acc_q AS BIGINT) / 1e6 AS accuracy,
           CAST(CAST(sum(n_test * abs(acc_q - conf_q)) OVER () AS BIGINT)
                // CAST(sum(n_test) OVER () AS BIGINT) AS BIGINT) / 1e6 AS ece
    FROM joined
    ORDER BY bin
    """,
    "EXPECTED CALIBRATION ERROR (the calibration judgment completing "
    "the eval quartet — xdv AUC ranks, xe3 AP weighs rare positives, "
    "xdb conformal guarantees coverage; ECE asks whether the score's "
    "implied RATE matches reality per bin, Naeini et al. 2015): "
    "80/20 portable-hash split (the established split idiom), decile "
    "bin boundaries as EXACT order statistics of the train scores "
    "(rank condition rn*10 <= n*k, an integer cross-multiplication — "
    "no percentile float), bin assignment by a 9-compare codegen "
    "CASE against the broadcast one-row boundary set (the xab "
    "pattern), confidence = train positive rate and accuracy = test "
    "positive rate per bin as integer-quantized ratios, ECE = "
    "sum(n_test_b * |acc_q - conf_q|) div N_test — every term an "
    "exact integer, the weighted mean ONE division. Empty-train bins "
    "take confidence 0 (declared, both engines). Scale shape: two "
    "scans + one rank window on the train split; everything after "
    "rides the 10-row bin aggregate",
    ("orders", "analytics"),
)
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.dedup import portable_hash

    t = _t(spark, sf_dir)
    scored = t["orders"].select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("score_cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .cast("long")
        .alias("pos"),
        (portable_hash(F.col("o_orderkey").cast("string"), seed=F.lit("split"))
         % 1_000_000).alias("bkt"),
    )
    train = scored.filter(F.col("bkt") < 800_000)
    test = scored.filter(F.col("bkt") >= 800_000)
    ranked = train.select(
        "score_cents",
        F.row_number()
        .over(W.orderBy("score_cents", "o_orderkey"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("long").alias("n"),
    )
    bounds = ranked.agg(
        *[
            F.max(
                F.when(F.col("rn") * 10 <= F.col("n") * k, F.col("score_cents"))
            ).alias(f"b{k}")
            for k in range(1, 10)
        ]
    )
    bin_expr = sum(
        [
            F.when(F.col(f"b{k}") < F.col("score_cents"), 1).otherwise(0)
            for k in range(1, 10)
        ],
        F.lit(1),
    ).alias("bin")
    tr = (
        train.crossJoin(F.broadcast(bounds))
        .select(bin_expr, "pos")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.sum("pos").cast("long").alias("pos_train"),
        )
    )
    te = (
        test.crossJoin(F.broadcast(bounds))
        .select(bin_expr, "pos")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("pos").cast("long").alias("pos_test"),
        )
    )
    joined = (
        te.join(tr, "bin", "left")
        .select(
            "bin",
            "n_test",
            "pos_test",
            F.coalesce("n_train", F.lit(0)).cast("long").alias("n_train"),
            F.coalesce("pos_train", F.lit(0)).cast("long").alias("pos_train"),
        )
        .select(
            "bin",
            "n_train",
            "n_test",
            F.expr(
                "CASE WHEN n_train = 0 THEN 0L"
                " ELSE pos_train * 1000000 div n_train END"
            ).alias("conf_q"),
            F.expr("pos_test * 1000000 div n_test").alias("acc_q"),
        )
    )
    w = W.partitionBy()
    return joined.select(
        "bin",
        "n_train",
        "n_test",
        (F.col("conf_q") / 1e6).alias("confidence"),
        (F.col("acc_q") / 1e6).alias("accuracy"),
        (
            F.expr(
                "CAST(CAST(sum(n_test * abs(acc_q - conf_q)) OVER () AS BIGINT)"
                " div CAST(sum(n_test) OVER () AS BIGINT) AS BIGINT)"
            )
            / 1e6
        ).alias("ece"),
    ).orderBy("bin")


@query(
    "xfr_ks_drift",
    """
    WITH ev AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    < (SELECT min(date_diff('day', DATE '1970-01-01',
                                            CAST(ts AS DATE))) FROM events) + 15
                    THEN 1 ELSE 2 END AS half
        FROM events
    ),
    n AS (
        SELECT event_type,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM ev GROUP BY event_type
    ),
    pv AS (
        SELECT event_type, cents,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM ev GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type,
               CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS f1,
               CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS f2
        FROM pv
    ),
    d AS (
        SELECT c.event_type, n.n1, n.n2,
               CAST(max(abs(c.f1 * n.n2 - c.f2 * n.n1)) AS BIGINT) AS d_num
        FROM cum c JOIN n ON n.event_type = c.event_type
        GROUP BY c.event_type, n.n1, n.n2
    )
    SELECT event_type, n1, n2, d_num,
           CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(d_num * 1000000 // (n1 * n2) AS BIGINT) / 1e6
           END AS ks_stat,
           CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(floor(1358 * sqrt((n1 + n2) * 1.0 / (n1 * n2)) * 1000)
                          AS BIGINT) / 1e6
           END AS crit_05,
           CASE WHEN n1 = 0 OR n2 = 0 THEN false
                ELSE CAST(d_num * 1000000 // (n1 * n2) AS BIGINT)
                     > CAST(floor(1358 * sqrt((n1 + n2) * 1.0 / (n1 * n2)) * 1000)
                            AS BIGINT)
           END AS drifted
    FROM d ORDER BY event_type
    """,
    "TWO-SAMPLE KOLMOGOROV-SMIRNOV DRIFT TEST (the exact-supremum "
    "counterpart to x68's binned PSI — PSI needs bin choices, KS is "
    "the binning-free distribution-shift judgment): per event type, "
    "the value distribution of the first 15 days vs the rest; D is "
    "EXACT over the common denominator n1*n2 — two cumulative window "
    "sums over the (type, cents) aggregate give f1*n2 - f2*n1 as "
    "exact BIGINTs at every distinct value, D = max |.| (the "
    "t-closeness EMD common-denominator idiom applied to a supremum), "
    "ks = ONE integer-quantized division; the alpha=0.05 critical "
    "value 1.358*sqrt((n1+n2)/(n1*n2)) is one fixed double expression "
    "over exact integers floor-quantized at 1e-3 precision/1e6 scale, "
    "and the drift verdict compares the two QUANTIZED BIGINTs — both "
    "engine-identical, so the boolean cannot flip on an ulp (the xe4 "
    "z pattern). ECDF evaluation points are the distinct observed "
    "values (the KS supremum is attained there); all window work on "
    "the (type x distinct-cents) aggregate",
    ("events", "analytics", "quality"),
)
def xfr_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev0 = t["events"].select(
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        F.expr("datediff(cast(ts as date), DATE '1970-01-01')")
        .cast("long")
        .alias("day_i"),
    )
    dmin = ev0.agg(F.min("day_i").alias("__dmin"))
    ev = ev0.crossJoin(F.broadcast(dmin)).select(
        "event_type",
        "cents",
        F.when(F.col("day_i") < F.col("__dmin") + 15, 1)
        .otherwise(2)
        .alias("half"),
    )
    # eager-checkpoint the (type, cents) aggregate: both the half
    # totals n1/n2 (derived FROM it, not from a second events pass)
    # and the ECDF window consume it — one corpus scan for the half
    # split instead of three (dmin's pruned day-only scan is the
    # only other events read)
    pv = (
        ev.groupBy("event_type", "cents")
        .agg(
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("half") == 2, 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
        .localCheckpoint(eager=True)
    )
    n = pv.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    wc = W.partitionBy("event_type").orderBy("cents").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = pv.select(
        "event_type",
        F.sum("c1").over(wc).cast("long").alias("f1"),
        F.sum("c2").over(wc).cast("long").alias("f2"),
    )
    d = (
        cum.join(n, "event_type")
        .groupBy("event_type", "n1", "n2")
        .agg(
            F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
            .cast("long")
            .alias("d_num")
        )
    )
    ks_q = "CAST(d_num * 1000000 div (n1 * n2) AS BIGINT)"
    crit_q = (
        "CAST(floor(1358 * sqrt((n1 + n2) * 1.0 / (n1 * n2)) * 1000) AS BIGINT)"
    )
    return d.select(
        "event_type",
        "n1",
        "n2",
        "d_num",
        F.expr(
            f"CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0 AS DOUBLE)"
            f" ELSE {ks_q} / 1e6 END"
        ).alias("ks_stat"),
        F.expr(
            f"CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(0 AS DOUBLE)"
            f" ELSE {crit_q} / 1e6 END"
        ).alias("crit_05"),
        F.expr(
            f"CASE WHEN n1 = 0 OR n2 = 0 THEN false"
            f" ELSE {ks_q} > {crit_q} END"
        ).alias("drifted"),
    ).orderBy("event_type")


@query(
    "chi2_cramers_v",
    """
    WITH joined AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cells AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS o FROM joined
              GROUP BY seg, pri),
    rm AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY seg),
    cm AS (SELECT pri, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY pri),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST((SELECT count(*) FROM rm) AS BIGINT) AS k1,
                   CAST((SELECT count(*) FROM cm) AS BIGINT) AS k2
            FROM cells),
    spine AS (
        SELECT rm.seg, cm.pri, rm.r, cm.c, COALESCE(x.o, 0) AS o
        FROM rm CROSS JOIN cm
        LEFT JOIN cells x ON x.seg = rm.seg AND x.pri = cm.pri
    ),
    terms AS (
        SELECT CAST(floor(
                   (CAST(o * (SELECT n FROM tot) - r * c AS DOUBLE)
                    * CAST(o * (SELECT n FROM tot) - r * c AS DOUBLE))
                   / ((CAST((SELECT n FROM tot) AS DOUBLE) * r) * c)
                   * 1000000) AS BIGINT) AS term_q
        FROM spine
    )
    SELECT t.n AS n_total, t.k1 AS k_segments, t.k2 AS k_priorities,
           CAST(s.chi2_q AS BIGINT) AS chi2_q,
           CAST(s.chi2_q AS BIGINT) / 1e6 AS chi2,
           CAST(floor(sqrt((CAST(s.chi2_q AS BIGINT) / 1e6)
                           / (CAST(t.n AS DOUBLE)
                              * least(t.k1 - 1, t.k2 - 1))) * 1000000)
                AS BIGINT) / 1e6 AS cramers_v
    FROM (SELECT CAST(sum(term_q) AS BIGINT) AS chi2_q FROM terms) s
    CROSS JOIN tot t
    """,
    "CHI-SQUARE INDEPENDENCE + CRAMER'S V (the categorical-"
    "association judgment next to x84's numeric Pearson and xdo's "
    "rank Spearman — does market segment associate with order "
    "priority at all, and how strongly on a 0..1 scale): the 5x5 "
    "contingency table with FULL margin spine (a missing cell "
    "contributes (0*N - r*c)^2/(N*r*c), never silently dropped); "
    "per-cell deviation d = o*N - r*c is an exact BIGINT (common-"
    "denominator idiom), each cell's chi2 term floor-quantized to "
    "integer micro-units from ONE fixed-order double expression over "
    "exact integers (d*d may exceed 2^53, but both engines compute "
    "the IDENTICAL IEEE product of identical doubles — the xe4 "
    "pattern; and the 25 terms then sum as exact INTEGERS, killing "
    "the x63 agg-order float-sum trap), V = sqrt(chi2/(N*min(k1-1,"
    "k2-1))) floor-quantized. Everything after the one groupBy rides "
    "the 25-cell aggregate",
    ("orders", "customer", "analytics"),
)
def chi2_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    joined = (
        t["orders"]
        .select("o_custkey", F.col("o_orderpriority").alias("pri"))
        .join(
            t["customer"].select("c_custkey", F.col("c_mktsegment").alias("seg")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("seg", "pri")
    )
    # the 25-row contingency table derives from the corpus-sized
    # orders-customer join but feeds FIVE consumers (rm, cm, tot's
    # three legs, the spine) — eager-checkpoint so the join runs once
    cells = joined.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).localCheckpoint(eager=True)
    rm = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("r"))
    cm = cells.groupBy("pri").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(F.sum("o").cast("long").alias("n")).crossJoin(
        rm.agg(F.count(F.lit(1)).cast("long").alias("k1"))
    ).crossJoin(cm.agg(F.count(F.lit(1)).cast("long").alias("k2")))
    spine = (
        rm.crossJoin(cm)
        .join(cells, ["seg", "pri"], "left")
        .select("seg", "pri", "r", "c", F.coalesce("o", F.lit(0)).alias("o"))
        .crossJoin(F.broadcast(tot))
    )
    terms = spine.select(
        "n",
        "k1",
        "k2",
        F.expr(
            "CAST(floor((CAST(o * n - r * c AS DOUBLE)"
            " * CAST(o * n - r * c AS DOUBLE))"
            " / ((CAST(n AS DOUBLE) * r) * c) * 1000000) AS BIGINT)"
        ).alias("term_q"),
    )
    return (
        terms.groupBy("n", "k1", "k2")
        .agg(F.sum("term_q").cast("long").alias("chi2_q"))
        .select(
            F.col("n").alias("n_total"),
            F.col("k1").alias("k_segments"),
            F.col("k2").alias("k_priorities"),
            "chi2_q",
            (F.col("chi2_q") / 1e6).alias("chi2"),
            F.expr(
                "CAST(floor(sqrt((chi2_q / 1e6)"
                " / (CAST(n AS DOUBLE) * least(k1 - 1, k2 - 1))) * 1000000)"
                " AS BIGINT)"
            ).alias("__v_q"),
        )
        .select(
            "n_total",
            "k_segments",
            "k_priorities",
            "chi2_q",
            "chi2",
            (F.col("__v_q") / 1e6).alias("cramers_v"),
        )
    )


def _hits_oracle_sql(rounds: int = 4) -> str:
    """Unrolled HITS oracle: alternating authority/hub halves, each
    renormalized by its max via pure integer division with the xdp
    G-shrink overflow guard; every CTE MATERIALIZED (the kcore rule)."""
    parts = [
        """edges AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )""",
        "h0 AS MATERIALIZED (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS hq"
        " FROM edges)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""ar{r} AS MATERIALIZED (
        SELECT e.p, CAST(sum(h.hq) AS BIGINT) AS raw
        FROM edges e JOIN h{r - 1} h ON h.c = e.c GROUP BY e.p
    )"""
        )
        parts.append(
            f"""a{r} AS MATERIALIZED (
        SELECT p, ((raw // s.g) * 1000000) // greatest(s.mx // s.g, 1) AS aq
        FROM ar{r} CROSS JOIN (
            SELECT greatest(max(raw), 1) AS mx,
                   greatest(greatest(max(raw), 1) // 1000000000000, 1) AS g
            FROM ar{r}) s
    )"""
        )
        parts.append(
            f"""hr{r} AS MATERIALIZED (
        SELECT e.c, CAST(sum(a.aq) AS BIGINT) AS raw
        FROM edges e JOIN a{r} a ON a.p = e.p GROUP BY e.c
    )"""
        )
        parts.append(
            f"""h{r} AS MATERIALIZED (
        SELECT c, ((raw // s.g) * 1000000) // greatest(s.mx // s.g, 1) AS hq
        FROM hr{r} CROSS JOIN (
            SELECT greatest(max(raw), 1) AS mx,
                   greatest(greatest(max(raw), 1) // 1000000000000, 1) AS g
            FROM hr{r}) s
    )"""
        )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes},
    tops AS (
        SELECT 'authority' AS side, p AS node_key, aq AS score_q
        FROM a{rounds} ORDER BY aq DESC, p LIMIT 10
    ),
    toph AS (
        SELECT 'hub' AS side, c AS node_key, hq AS score_q
        FROM h{rounds} ORDER BY hq DESC, c LIMIT 10
    )
    SELECT side, CAST(node_key AS BIGINT) AS node_key,
           CAST(score_q AS BIGINT) / 1e6 AS score
    FROM (SELECT * FROM tops UNION ALL SELECT * FROM toph)
    ORDER BY side, score DESC, node_key
    """


@query(
    "hits_bipartite",
    _hits_oracle_sql(),
    "HITS HUBS AND AUTHORITIES (Kleinberg 1999 — the mutual-"
    "reinforcement centrality the graph family lacked: PageRank "
    "scores a vertex by incoming mass on ONE side; HITS alternates "
    "two scores on a BIPARTITE relation, here customers (hubs) vs "
    "parts (authorities) of the purchase graph — an authority is a "
    "part bought by strong hubs, a hub a customer buying strong "
    "authorities): 4 bounded alternating rounds, each half-step = "
    "one equi-join + map-side-combinable sum over the cached "
    "pre-partitioned distinct edge list, renormalized by its MAX via "
    "pure integer division with the xdp G-shrink overflow guard "
    "(values stay in 1e6-scale integers; sum bound deg*1e6, the "
    "guard divides both operands first so raw*1e6 can never overflow "
    "at any degree); the max fold is an unpartitioned window OVER "
    "the half-step's own aggregate — one flat action per half-step, "
    "no broadcast-fold diamond (r15; the window's single partition "
    "holds one row per node, bounded by the node set, never the "
    "corpus) — and each SMALL renormed state is localCheckpointed "
    "(probe-free fixed rounds, the x75 rule); output "
    "= top-10 per side via TakeOrderedAndProject, unique (score, "
    "key) order. Oracle = unrolled MATERIALIZED alternating chain; "
    "all integer end-to-end",
    ("orders", "lineitem", "graph", "analytics"),
)
def hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .session import track_cache

    t = _t(spark, sf_dir)
    # ONE exchange builds the cached edge list: hash-partitioning by c
    # colocates every (c, p) duplicate, so the dedup aggregate rides the
    # repartition('c') exchange instead of adding its own (c, p)
    # exchange followed by a second c-keyed one (r15: distinct() +
    # repartition('c') was two full shuffles of the edge list)
    edges = track_cache(
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_partkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .repartition("c")
        .dropDuplicates(["c", "p"])
    )

    from pyspark.sql.window import Window as W

    def _half(prev, join_key, out_key):
        # ONE flat action per half-step: join + map-side-combinable sum,
        # renormalized in place by an unpartitioned window over the
        # half-step's own aggregate (max/g/q integer expressions are
        # byte-identical to the r14 broadcast-fold form, so every score
        # is the same integer). The r14 shape checkpointed the RAW
        # aggregate and re-derived the renorm from it through a
        # broadcast max-fold — a per-half-step diamond whose broadcast
        # subquery cost extra AQE jobs; the window form has no second
        # consumer at all. The window's single partition holds one row
        # per node (bounded by the node SET, never the corpus — the
        # frame any HITS renorm must materialize anyway); the
        # checkpointed state is that same small frame.
        return (
            edges.join(prev.select(F.col("q").alias("pq"), join_key), join_key)
            .groupBy(out_key)
            .agg(F.sum("pq").cast("long").alias("raw"))
            .select(
                out_key,
                "raw",
                F.greatest(F.max("raw").over(W.partitionBy()), F.lit(1))
                .cast("long")
                .alias("mx"),
            )
            .select(
                out_key,
                "raw",
                "mx",
                F.greatest(F.expr("mx div 1000000000000"), F.lit(1))
                .cast("long")
                .alias("g"),
            )
            .select(
                out_key,
                F.expr("((raw div g) * 1000000) div greatest(mx div g, 1)")
                .cast("long")
                .alias("q"),
            )
            .localCheckpoint(eager=True)
        )

    h = edges.select("c").distinct().select(
        "c", F.lit(1_000_000).cast("long").alias("q")
    )
    a = None
    for _ in range(4):
        a = _half(h, "c", "p")
        h = _half(a, "p", "c")
    tops = (
        a.orderBy(F.col("q").desc(), "p")
        .limit(10)
        .select(
            F.lit("authority").alias("side"),
            F.col("p").cast("long").alias("node_key"),
            (F.col("q") / 1e6).alias("score"),
        )
    )
    toph = (
        h.orderBy(F.col("q").desc(), "c")
        .limit(10)
        .select(
            F.lit("hub").alias("side"),
            F.col("c").cast("long").alias("node_key"),
            (F.col("q") / 1e6).alias("score"),
        )
    )
    return tops.unionByName(toph).orderBy(
        "side", F.col("score").desc(), "node_key"
    )


@query(
    "acf_ljung_box",
    """
    WITH daily0 AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT)
                   AS dol
        FROM events GROUP BY 1, 2
    ),
    b AS (SELECT event_type, min(day_i) AS dmin, max(day_i) AS dmax
          FROM daily0 GROUP BY event_type),
    spine AS (
        SELECT s.event_type, s.d AS day_i, COALESCE(d0.dol, 0) AS x
        FROM (SELECT event_type, unnest(generate_series(dmin, dmax)) AS d
              FROM b) s
        LEFT JOIN daily0 d0 ON d0.event_type = s.event_type AND d0.day_i = s.d
    ),
    cent AS (
        SELECT event_type, day_i,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(count(*) OVER (PARTITION BY event_type) * x
                    - sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS y
        FROM spine
    ),
    lagged AS (
        SELECT event_type, n, y,
               lag(y, 1) OVER (PARTITION BY event_type ORDER BY day_i) AS y1,
               lag(y, 2) OVER (PARTITION BY event_type ORDER BY day_i) AS y2,
               lag(y, 3) OVER (PARTITION BY event_type ORDER BY day_i) AS y3,
               lag(y, 4) OVER (PARTITION BY event_type ORDER BY day_i) AS y4,
               lag(y, 5) OVER (PARTITION BY event_type ORDER BY day_i) AS y5,
               lag(y, 6) OVER (PARTITION BY event_type ORDER BY day_i) AS y6,
               lag(y, 7) OVER (PARTITION BY event_type ORDER BY day_i) AS y7
        FROM cent
    ),
    agg AS (
        SELECT event_type, n,
               CAST(sum(y * y) AS BIGINT) AS den,
               CAST(COALESCE(sum(y * y1), 0) AS BIGINT) AS num1,
               CAST(COALESCE(sum(y * y2), 0) AS BIGINT) AS num2,
               CAST(COALESCE(sum(y * y3), 0) AS BIGINT) AS num3,
               CAST(COALESCE(sum(y * y4), 0) AS BIGINT) AS num4,
               CAST(COALESCE(sum(y * y5), 0) AS BIGINT) AS num5,
               CAST(COALESCE(sum(y * y6), 0) AS BIGINT) AS num6,
               CAST(COALESCE(sum(y * y7), 0) AS BIGINT) AS num7
        FROM lagged GROUP BY event_type, n
    ),
    quant AS (
        SELECT event_type, n, den,
               greatest(den // 1000000000000, 1) AS g,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num1 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a1,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num2 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a2,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num3 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a3,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num4 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a4,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num5 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a5,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num6 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a6,
               CASE WHEN den = 0 THEN 0 ELSE
                    ((num7 // greatest(den // 1000000000000, 1)) * 1000000)
                    // greatest(den // greatest(den // 1000000000000, 1), 1)
               END AS a7
        FROM agg
    ),
    qstat AS (
        SELECT event_type, n, a1, a2, a3, a4, a5, a6, a7,
               CAST(n * (n + 2) * (
                   CASE WHEN n <= 1 THEN 0 ELSE (a1 * a1) // (n - 1) END
                 + CASE WHEN n <= 2 THEN 0 ELSE (a2 * a2) // (n - 2) END
                 + CASE WHEN n <= 3 THEN 0 ELSE (a3 * a3) // (n - 3) END
                 + CASE WHEN n <= 4 THEN 0 ELSE (a4 * a4) // (n - 4) END
                 + CASE WHEN n <= 5 THEN 0 ELSE (a5 * a5) // (n - 5) END
                 + CASE WHEN n <= 6 THEN 0 ELSE (a6 * a6) // (n - 6) END
                 + CASE WHEN n <= 7 THEN 0 ELSE (a7 * a7) // (n - 7) END
               ) AS BIGINT) AS q_q
        FROM quant
    )
    SELECT event_type, CAST(l.lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_days,
           CAST(CASE l.lag WHEN 1 THEN a1 WHEN 2 THEN a2 WHEN 3 THEN a3
                WHEN 4 THEN a4 WHEN 5 THEN a5 WHEN 6 THEN a6
                ELSE a7 END AS BIGINT) / 1e6 AS acf,
           q_q / 1e12 AS lb_q,
           q_q > 14067140449340 AS autocorrelated
    FROM qstat CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
    ORDER BY event_type, lag
    """,
    "AUTOCORRELATION FUNCTION + LJUNG-BOX PORTMANTEAU TEST (Box & "
    "Pierce 1970 / Ljung & Box 1978 — the seasonality/dependence "
    "DETECTOR the time-series family lacked: xdy EXTRACTS a weekly "
    "shape, xe4 tests monotone trend, xdr locates a level shift; "
    "this answers 'is the series autocorrelated AT ALL, at which "
    "lags' — the Box-Jenkins first step): per event type on the "
    "dense zero-filled daily floor-dollar series, sample ACF at "
    "lags 1..7 with the common-denominator centering idiom — "
    "y_t = n*x_t - S is an exact BIGINT, r_k = sum(y_t*y_{t-k}) / "
    "sum(y_t^2) scaled by n^2 on both sides so no float mean is "
    "ever formed; the quantized division carries the xdp G-shrink "
    "guard (den ~ 3.7e13 at sf0.1 — num*1e6 would overflow "
    "BIGINT; both operands pre-divided by g = den div 1e12, a "
    "declared deterministic coarsening), signed quotients truncate "
    "toward zero identically on both engines (r8 engine-pair pin); "
    "Ljung-Box Q = n(n+2)*sum(r_k_q^2 div (n-k)) rides the "
    "1e6-scale integers (1e12-scale Q), verdict = integer compare "
    "vs the chi2(7, 0.95) literal 14.06714044934e12 — no float "
    "ever crosses the threshold. One day-axis window chain, one "
    "5-row-per-type aggregate, lag spine via stack. Headroom: den "
    "< 2^63 to ~1000x bench SF; beyond, coarsen dollars by a "
    "magnitude probe (docstring contract)",
    ("events", "analytics", "timeseries"),
)
def acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    daily0 = (
        t["events"]
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), DATE '1970-01-01')")
            .cast("long")
            .alias("day_i"),
            F.expr("cast(round(value * 100) as bigint)").alias("__vc"),
        )
        .groupBy("event_type", "day_i")
        .agg(F.expr("cast(sum(__vc) div 100 as bigint)").alias("dol"))
    )
    b = daily0.groupBy("event_type").agg(
        F.min("day_i").alias("dmin"), F.max("day_i").alias("dmax")
    )
    spine = (
        b.select(
            "event_type",
            F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias("day_i"),
        )
        .join(daily0, ["event_type", "day_i"], "left")
        .select("event_type", "day_i", F.coalesce("dol", F.lit(0)).alias("x"))
    )
    wp = W.partitionBy("event_type")
    wt = W.partitionBy("event_type").orderBy("day_i")
    cent = spine.select(
        "event_type",
        "day_i",
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        (F.count(F.lit(1)).over(wp) * F.col("x") - F.sum("x").over(wp))
        .cast("long")
        .alias("y"),
    )
    lagged = cent.select(
        "event_type",
        "n",
        "y",
        *[F.lag("y", k).over(wt).alias(f"y{k}") for k in range(1, 8)],
    )
    agg = lagged.groupBy("event_type", "n").agg(
        F.sum(F.col("y") * F.col("y")).cast("long").alias("den"),
        *[
            F.coalesce(F.sum(F.col("y") * F.col(f"y{k}")), F.lit(0))
            .cast("long")
            .alias(f"num{k}")
            for k in range(1, 8)
        ],
    )
    gexpr = "greatest(den div 1000000000000, 1)"
    quant = agg.select(
        "event_type",
        "n",
        "den",
        *[
            F.expr(
                f"CASE WHEN den = 0 THEN 0L ELSE"
                f" ((num{k} div {gexpr}) * 1000000)"
                f" div greatest(den div {gexpr}, 1) END"
            ).alias(f"a{k}")
            for k in range(1, 8)
        ],
    )
    qterms = " + ".join(
        f"CASE WHEN n <= {k} THEN 0L ELSE (a{k} * a{k}) div (n - {k}) END"
        for k in range(1, 8)
    )
    qstat = quant.select(
        "event_type",
        "n",
        *[f"a{k}" for k in range(1, 8)],
        F.expr(f"CAST(n * (n + 2) * ({qterms}) AS BIGINT)").alias("q_q"),
    )
    pairs = ", ".join(f"{k}L, a{k}" for k in range(1, 8))
    return (
        qstat.selectExpr(
            "event_type",
            "n",
            "q_q",
            f"stack(7, {pairs}) AS (lag, acf_q)",
        )
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.col("n").cast("long").alias("n_days"),
            (F.col("acf_q") / 1e6).alias("acf"),
            (F.col("q_q") / 1e12).alias("lb_q"),
            (F.col("q_q") > F.lit(14067140449340)).alias("autocorrelated"),
        )
        .orderBy("event_type", "lag")
    )


@query(
    "xfq_rfm_segments",
    """
    WITH cust AS (
        SELECT o_custkey AS ck,
               CAST(date_diff('day', max(o_orderdate),
                    (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS rec,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS mon
        FROM orders GROUP BY o_custkey
    ),
    long_f AS (
        SELECT 'r' AS dim, rec AS v FROM cust
        UNION ALL SELECT 'f', freq FROM cust
        UNION ALL SELECT 'm', mon FROM cust
    ),
    hist AS (
        SELECT dim, v, CAST(count(*) AS BIGINT) AS c
        FROM long_f GROUP BY dim, v
    ),
    cum AS (
        SELECT dim, v,
               CAST(sum(c) OVER (PARTITION BY dim ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cm,
               CAST(sum(c) OVER (PARTITION BY dim) AS BIGINT) AS n
        FROM hist
    ),
    bounds AS (
        SELECT
            min(CASE WHEN dim = 'r' AND 5 * cm >= n * 1 THEN v END) AS r1,
            min(CASE WHEN dim = 'r' AND 5 * cm >= n * 2 THEN v END) AS r2,
            min(CASE WHEN dim = 'r' AND 5 * cm >= n * 3 THEN v END) AS r3,
            min(CASE WHEN dim = 'r' AND 5 * cm >= n * 4 THEN v END) AS r4,
            min(CASE WHEN dim = 'f' AND 5 * cm >= n * 1 THEN v END) AS f1,
            min(CASE WHEN dim = 'f' AND 5 * cm >= n * 2 THEN v END) AS f2,
            min(CASE WHEN dim = 'f' AND 5 * cm >= n * 3 THEN v END) AS f3,
            min(CASE WHEN dim = 'f' AND 5 * cm >= n * 4 THEN v END) AS f4,
            min(CASE WHEN dim = 'm' AND 5 * cm >= n * 1 THEN v END) AS m1,
            min(CASE WHEN dim = 'm' AND 5 * cm >= n * 2 THEN v END) AS m2,
            min(CASE WHEN dim = 'm' AND 5 * cm >= n * 3 THEN v END) AS m3,
            min(CASE WHEN dim = 'm' AND 5 * cm >= n * 4 THEN v END) AS m4
        FROM cum
    ),
    scored AS (
        SELECT ck, rec, freq, mon,
               6 - (1 + CASE WHEN rec > r1 THEN 1 ELSE 0 END
                      + CASE WHEN rec > r2 THEN 1 ELSE 0 END
                      + CASE WHEN rec > r3 THEN 1 ELSE 0 END
                      + CASE WHEN rec > r4 THEN 1 ELSE 0 END) AS rs,
               1 + CASE WHEN freq > f1 THEN 1 ELSE 0 END
                 + CASE WHEN freq > f2 THEN 1 ELSE 0 END
                 + CASE WHEN freq > f3 THEN 1 ELSE 0 END
                 + CASE WHEN freq > f4 THEN 1 ELSE 0 END AS fs,
               1 + CASE WHEN mon > m1 THEN 1 ELSE 0 END
                 + CASE WHEN mon > m2 THEN 1 ELSE 0 END
                 + CASE WHEN mon > m3 THEN 1 ELSE 0 END
                 + CASE WHEN mon > m4 THEN 1 ELSE 0 END AS ms
        FROM cust CROSS JOIN bounds
    ),
    labeled AS (
        SELECT *,
               CASE WHEN rs >= 4 AND fs >= 4 THEN 'champions'
                    WHEN fs >= 4 THEN 'loyal'
                    WHEN rs <= 2 AND fs >= 3 THEN 'at_risk'
                    WHEN rs <= 2 THEN 'hibernating'
                    WHEN rs >= 4 THEN 'recent'
                    ELSE 'regular' END AS segment_class
        FROM scored
    )
    SELECT segment_class,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rs) * 1000000 // count(*) AS BIGINT) / 1e6 AS avg_r_score,
           CAST(sum(freq) * 1000000 // count(*) AS BIGINT) / 1e6 AS avg_freq,
           CAST(sum(mon) // (100 * count(*)) AS BIGINT) AS avg_monetary_dollars,
           CAST(sum(rec) // count(*) AS BIGINT) AS avg_recency_days
    FROM labeled GROUP BY segment_class ORDER BY segment_class
    """,
    "RFM CUSTOMER SEGMENTATION (Hughes 1994 — the product-analytics "
    "staple the inventory lacked: score every purchasing customer "
    "1..5 on Recency/Frequency/Monetary quintiles and roll up named "
    "lifecycle classes — champions, loyal, at_risk, hibernating, "
    "recent, regular, tie-broken in that declared CASE order): "
    "quintile BOUNDARIES are exact order statistics computed on the "
    "(dim, value) HISTOGRAM (5*cum >= n*k rank condition, xe7 "
    "tie-to-lower semantics; shuffle bounded by distinct values — "
    "never a global per-customer rank, the xco scale rule), all "
    "three dimensions ride ONE unpivoted histogram chain; the "
    "12-value boundary row broadcasts back (crossJoin) and "
    "assignment is a pure codegen CASE ladder; recency inverts "
    "(6 - bin) so recent = 5; averages are integer-division exact "
    "(avg scores 1e6-quantized, monetary floor-dollars). One "
    "customer agg + one tiny histogram chain + one rollup",
    ("orders", "analytics", "customer"),
)
def xfq_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    orders = t["orders"]
    gmax = orders.agg(F.max("o_orderdate").alias("__gmax"))
    cust = (
        orders.select(
            "o_custkey",
            "o_orderdate",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("__cents"),
        )
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("__cents").cast("long").alias("mon"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "ck",
            F.expr("cast(datediff(__gmax, __last) as bigint)").alias("rec"),
            "freq",
            "mon",
        )
        # consumed by the histogram chain AND the boundary-assignment
        # pass in one action — eager-checkpoint so the orders scan +
        # customer agg run once (the r6 self-union lesson: a 3-way
        # union of the same frame evaluates its subtree 3x)
        .localCheckpoint(eager=True)
    )
    long_f = cust.select(
        F.explode(
            F.expr(
                "array(named_struct('dim', 'r', 'v', rec),"
                " named_struct('dim', 'f', 'v', freq),"
                " named_struct('dim', 'm', 'v', mon))"
            )
        ).alias("s")
    ).select(F.col("s.dim").alias("dim"), F.col("s.v").alias("v"))
    hist = long_f.groupBy("dim", "v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = W.partitionBy("dim").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = hist.select(
        "dim",
        "v",
        F.sum("c").over(wc).cast("long").alias("cm"),
        F.sum("c").over(W.partitionBy("dim")).cast("long").alias("n"),
    )
    bounds = cum.agg(
        *[
            F.min(
                F.when(
                    (F.col("dim") == d) & (5 * F.col("cm") >= F.col("n") * k),
                    F.col("v"),
                )
            ).alias(f"{d}{k}")
            for d in ("r", "f", "m")
            for k in range(1, 5)
        ]
    )
    bin_expr = lambda col, d: " + ".join(
        f"CASE WHEN {col} > {d}{k} THEN 1 ELSE 0 END" for k in range(1, 5)
    )
    scored = cust.crossJoin(F.broadcast(bounds)).select(
        "ck",
        "rec",
        "freq",
        "mon",
        F.expr(f"6 - (1 + {bin_expr('rec', 'r')})").alias("rs"),
        F.expr(f"1 + {bin_expr('freq', 'f')}").alias("fs"),
        F.expr(f"1 + {bin_expr('mon', 'm')}").alias("ms"),
    )
    labeled = scored.withColumn(
        "segment_class",
        F.expr(
            "CASE WHEN rs >= 4 AND fs >= 4 THEN 'champions'"
            " WHEN fs >= 4 THEN 'loyal'"
            " WHEN rs <= 2 AND fs >= 3 THEN 'at_risk'"
            " WHEN rs <= 2 THEN 'hibernating'"
            " WHEN rs >= 4 THEN 'recent'"
            " ELSE 'regular' END"
        ),
    )
    return (
        labeled.groupBy("segment_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("rs").cast("long").alias("__srs"),
            F.sum("freq").cast("long").alias("__sf"),
            F.sum("mon").cast("long").alias("__sm"),
            F.sum("rec").cast("long").alias("__sr"),
        )
        .select(
            "segment_class",
            F.col("__n").alias("n_customers"),
            F.expr("cast(__srs * 1000000 div __n as bigint) / 1e6").alias(
                "avg_r_score"
            ),
            F.expr("cast(__sf * 1000000 div __n as bigint) / 1e6").alias("avg_freq"),
            F.expr("cast(__sm div (100 * __n) as bigint)").alias(
                "avg_monetary_dollars"
            ),
            F.expr("cast(__sr div __n as bigint)").alias("avg_recency_days"),
        )
        .orderBy("segment_class")
    )


@query(
    "attribution_shapley",
    """
    WITH uf AS (
        SELECT user_id,
               CAST(COALESCE(sum(DISTINCT CASE event_type
                    WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                    ELSE 0 END), 0) AS BIGINT) AS m,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    exact AS (
        SELECT m, CAST(count(*) AS BIGINT) AS u,
               CAST(sum(conv) AS BIGINT) AS c
        FROM uf GROUP BY m
    ),
    spine AS (SELECT unnest(generate_series(0, 15)) AS t),
    rates AS (
        SELECT s.t,
               COALESCE(e.u, 0) AS u,
               CASE WHEN COALESCE(e.u, 0) = 0 THEN 0
                    ELSE e.c * 1000000 // e.u END AS r_q
        FROM spine s LEFT JOIN exact e ON e.m = s.t
    ),
    w AS (
        SELECT s.t AS s, CAST(sum(r.r_q) AS BIGINT) AS w_q
        FROM spine s JOIN rates r ON (r.t & s.t) = r.t
        GROUP BY s.t
    ),
    ch AS (
        SELECT col0 AS channel, CAST(col1 AS BIGINT) AS b
        FROM (VALUES ('click', 1), ('error', 2), ('signup', 4),
                     ('view', 8)) v(col0, col1)
    ),
    phi AS (
        SELECT ch.channel, ch.b,
               CAST(sum(
                   (CASE bit_count(ws.s) WHEN 0 THEN 1 WHEN 1 THEN 1
                         WHEN 2 THEN 2 ELSE 6 END)
                 * (CASE 3 - bit_count(ws.s) WHEN 0 THEN 1 WHEN 1 THEN 1
                         WHEN 2 THEN 2 ELSE 6 END)
                 * (wsb.w_q - ws.w_q)
               ) AS BIGINT) AS phi_num
        FROM ch
        JOIN w ws ON (ws.s & ch.b) = 0
        JOIN w wsb ON wsb.s = (ws.s | ch.b)
        GROUP BY ch.channel, ch.b
    ),
    tot AS (SELECT CAST(sum(phi_num // 24) AS BIGINT) AS total FROM phi)
    SELECT p.channel,
           CAST((SELECT CAST(sum(u) AS BIGINT) FROM rates r
                 WHERE (r.t & p.b) <> 0) AS BIGINT) AS exposed_users,
           CAST(p.phi_num // 24 AS BIGINT) / 1e6 AS shapley_rate_credit,
           CASE WHEN t.total = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST((p.phi_num // 24) * 1000000 // t.total AS BIGINT)
                     / 1e6 END AS credit_share
    FROM phi p CROSS JOIN tot t
    ORDER BY p.channel
    """,
    "SHAPLEY-VALUE ATTRIBUTION (Shapley 1953 via Zhao, Mahboobi & "
    "Manavoglu 2018 — completes the attribution family's model "
    "ladder: x77/xcd last-touch argmax, xe8 linear equal-credit, "
    "attribution_markov removal effects; Shapley is the "
    "order-free cooperative-game solution marketers quote): users "
    "are exposure coalitions — per-user bitmask of touched "
    "non-purchase channels (bit_or as sum DISTINCT of power-of-2 "
    "codes, engine-portable), conversion = any purchase; exact-set "
    "conversion rates r_T = c_T*1e6 div u_T (safe count-ratio "
    "quantization) on the FULL 16-mask spine, characteristic "
    "w(S) = sum of r_T over T subset-of S via one bitwise-contain "
    "join on the 16-row lattice (T & S = T), Shapley phi_i = "
    "sum over S avoiding i of |S|!(n-1-|S|)!*(w(S+i)-w(S)) with "
    "factorial literals CASEd on bit_count, one exact division by "
    "n!=24 — marginals are non-negative (w is monotone), so every "
    "quotient truncates identically; efficiency invariant "
    "sum(phi) = w(N)-w(empty) pins the replica. The lattice work "
    "is CONSTANT-size (16 rows) regardless of corpus scale — the "
    "whole query is one events scan + one user agg + one 16-row "
    "agg; exposed_users context via a bit-filtered spine sum",
    ("events", "analytics", "attribution"),
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    uf = (
        t["events"]
        .select(
            "user_id",
            F.expr(
                "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
                " WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"
            ).alias("__bit"),
            F.expr(
                "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
            ).alias("__cv"),
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum_distinct(F.col("__bit")), F.lit(0))
            .cast("long")
            .alias("m"),
            F.max("__cv").alias("conv"),
        )
    )
    # the exact-set table is <= 16 rows but derives from the full
    # events scan + user agg; BOTH the w-lattice and the exposed_users
    # branch consume it in one action — eager-checkpoint so the corpus
    # is scanned exactly once (22 -> fewer jobs, 1 scan at any scale)
    exact = uf.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("u"),
        F.sum("conv").cast("long").alias("c"),
    ).localCheckpoint(eager=True)
    spine = spark.range(16).select(F.col("id").cast("long").alias("t"))
    rates = (
        spine.join(exact, spine["t"] == exact["m"], "left")
        .select(
            "t",
            F.coalesce("u", F.lit(0)).cast("long").alias("u"),
            F.expr(
                "CASE WHEN coalesce(u, 0) = 0 THEN 0L"
                " ELSE c * 1000000 div u END"
            ).alias("r_q"),
        )
    )
    w = (
        spine.select(F.col("t").alias("s"))
        .join(rates, F.expr("(t & s) = t"))
        .groupBy("s")
        .agg(F.sum("r_q").cast("long").alias("w_q"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, b long",
    )
    fact_expr = (
        "(CASE bit_count(s) WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2"
        " ELSE 6 END) * (CASE 3 - bit_count(s) WHEN 0 THEN 1 WHEN 1 THEN 1"
        " WHEN 2 THEN 2 ELSE 6 END)"
    )
    ws = w.select(F.col("s"), F.col("w_q").alias("w_s"))
    wsb = w.select(F.col("s").alias("sb"), F.col("w_q").alias("w_sb"))
    phi = (
        ch.join(ws, F.expr("(s & b) = 0"))
        .join(wsb, F.expr("sb = (s | b)"))
        .groupBy("channel", "b")
        .agg(
            F.sum(F.expr(f"{fact_expr} * (w_sb - w_s)"))
            .cast("long")
            .alias("phi_num")
        )
    )
    tot = phi.agg(
        F.sum(F.expr("phi_num div 24")).cast("long").alias("total")
    )
    exposed = (
        rates.crossJoin(F.broadcast(ch.select(F.col("channel").alias("__c"), F.col("b").alias("__b"))))
        .filter(F.expr("(t & __b) <> 0"))
        .groupBy("__c")
        .agg(F.sum("u").cast("long").alias("exposed_users"))
        .select(F.col("__c").alias("channel"), "exposed_users")
    )
    return (
        phi.crossJoin(F.broadcast(tot))
        .join(exposed, "channel")
        .select(
            "channel",
            "exposed_users",
            F.expr("CAST(phi_num div 24 AS BIGINT) / 1e6").alias(
                "shapley_rate_credit"
            ),
            F.expr(
                "CASE WHEN total = 0 THEN CAST(0 AS DOUBLE)"
                " ELSE CAST((phi_num div 24) * 1000000 div total AS BIGINT)"
                " / 1e6 END"
            ).alias("credit_share"),
        )
        .orderBy("channel")
    )


@query(
    "vocab_good_turing",
    """
    WITH ws AS (
        SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    toks AS (
        SELECT w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
        FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
              FROM ws WHERE len(w) >= 3)
    ),
    wc AS (
        SELECT g, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY g
    ),
    fof AS (
        SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY c
    ),
    scal AS (
        SELECT CAST(sum(n_r) AS BIGINT) AS v_total,
               CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
               CAST(COALESCE(sum(CASE WHEN r = 1 THEN n_r END), 0) AS BIGINT)
                   AS n1,
               CAST(COALESCE(sum(CASE WHEN r = 2 THEN n_r END), 0) AS BIGINT)
                   AS n2
        FROM fof
    )
    SELECT f.r, f.n_r, s.v_total, s.n_tokens,
           CAST(s.n1 * 1000000 // s.n_tokens AS BIGINT) / 1e6 AS p0_unseen,
           CAST(s.v_total + (s.n1 * (s.n1 - 1)) // (2 * (s.n2 + 1))
                AS BIGINT) AS chao1_richness
    FROM fof f CROSS JOIN scal s
    WHERE f.r <= 10
    ORDER BY f.r
    """,
    "GOOD-TURING UNSEEN MASS + CHAO1 RICHNESS OVER WORD TRIGRAMS "
    "(Good 1953, Chao 1984 - the corpus-PLANNING readout the text "
    "family lacked: xcr measures how token mass is distributed, xdl "
    "how a tokenizer covers languages; this estimates what the "
    "corpus has NOT seen - the probability the next 3-gram is novel "
    "and how many distinct 3-grams exist beyond the sample, i.e. "
    "the 'is more data worth crawling' judgment AND the open-mass "
    "estimate for the dedup family's own 3-shingle space): "
    "frequency-of-frequencies N_r over \\s+-lowercased word "
    "trigrams (the pinned tokenization rule; trigram unit chosen "
    "because the fixtures' unigram/bigram vocabularies SATURATE at "
    "sf0.1 - N1 = 0 - while the trigram space stays open at every "
    "SF, which is also why shingle dedup works there), built by "
    "filtered-array index explode with the len >= 3 guard on BOTH "
    "sides (the xa0 sequence-descend rule); Good-Turing p0 = N1/N "
    "as the safe count-ratio quantization, bias-corrected Chao1 = "
    "V + N1(N1-1)/(2(N2+1)) kept ENTIRELY in integer vocabulary "
    "units (quotient forms before any scaling - no 1e6 blow-up at "
    "corpus scale; +1 is the standard bias correction and the div0 "
    "guard). Output = the r<=10 head of N_r with corpus scalars. "
    "One scan, one gram-keyed agg (the only corpus-sized shuffle), "
    "one tiny count-keyed agg, broadcast scalar fold",
    ("documents", "text", "analytics"),
)
def vocab_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ws = t["documents"].select(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda x: x != "",
        ).alias("w")
    )
    toks = (
        ws.filter(F.size("w") >= 3)
        .select(
            F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i"),
            "w",
        )
        .select(
            F.concat_ws(
                " ",
                F.element_at("w", F.col("i")),
                F.element_at("w", F.col("i") + 1),
                F.element_at("w", F.col("i") + 2),
            ).alias("g")
        )
    )
    wc = toks.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # the tiny frequency-of-frequencies table derives from the
    # corpus-sized gram shuffle but feeds both the scalar fold and
    # the r<=10 head — eager-checkpoint so the scan+shuffle run once
    fof = wc.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    ).localCheckpoint(eager=True)
    scal = fof.agg(
        F.sum("n_r").cast("long").alias("v_total"),
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(F.sum(F.when(F.col("r") == 2, F.col("n_r"))), F.lit(0))
        .cast("long")
        .alias("n2"),
    )
    return (
        fof.filter(F.col("r") <= 10)
        .crossJoin(F.broadcast(scal))
        .select(
            "r",
            "n_r",
            "v_total",
            "n_tokens",
            F.expr(
                "CAST(n1 * 1000000 div n_tokens AS BIGINT) / 1e6"
            ).alias("p0_unseen"),
            F.expr(
                "CAST(v_total + (n1 * (n1 - 1)) div (2 * (n2 + 1))"
                " AS BIGINT)"
            ).alias("chao1_richness"),
        )
        .orderBy("r")
    )


@query(
    "eb_shrunk_rates",
    """
    WITH u AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    p AS (SELECT user_id, n, c, c * 1000000 // n AS p_q FROM u),
    sc0 AS (
        SELECT CAST(count(*) AS BIGINT) AS g,
               CAST(sum(p_q) AS BIGINT) AS sm,
               CAST(sum(p_q * p_q) AS BIGINT) AS sv
        FROM p
    ),
    sc1 AS (
        SELECT g, sm // g AS m_q,
               sv // g - (sm // g) * (sm // g) AS v_q
        FROM sc0
    ),
    sc AS (
        SELECT g, m_q, v_q,
               CASE WHEN v_q <= 0 THEN 0
                    ELSE greatest(
                        (m_q * (1000000 - m_q)) * 1000000
                        // greatest(v_q, 1) - 1000000, 0)
               END AS k_q
        FROM sc1
    ),
    scored AS (
        SELECT p.user_id, p.n, p.c, p.p_q, s.m_q, s.k_q,
               (s.m_q * s.k_q) // 1000000 AS a6,
               greatest((p.n * 1000000 + s.k_q) // 1000000000000, 1) AS gg
        FROM p CROSS JOIN sc s
    ),
    shr AS (
        SELECT user_id, n, c, p_q, m_q, k_q,
               (((c * 1000000 + a6) // gg) * 1000000)
               // greatest((n * 1000000 + k_q) // gg, 1) AS shrunk_q
        FROM scored
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           n AS n_events, c AS n_purchases,
           CAST(p_q AS BIGINT) / 1e6 AS raw_rate,
           CAST(shrunk_q AS BIGINT) / 1e6 AS shrunk_rate,
           CAST(m_q AS BIGINT) / 1e6 AS prior_mean,
           CAST(k_q AS BIGINT) / 1e6 AS prior_strength
    FROM shr
    ORDER BY shrunk_q DESC, user_id LIMIT 15
    """,
    "EMPIRICAL-BAYES BETA-BINOMIAL SHRINKAGE of per-user purchase "
    "rates (Efron & Morris 1975 / the 'how not to rank by raw "
    "average' estimator — the small-sample RANKING fix next to "
    "xcl's bootstrap uncertainty and xdb's conformal intervals: a "
    "3/10 user must not outrank a 25/86 user): method-of-moments "
    "beta prior from the group-rate distribution — per-user rates "
    "quantized at source (safe count ratio c*1e6 div n), prior "
    "mean m = Sm div G and variance v = Sv div G - m^2 as DECLARED "
    "integer-op moments (two divisions instead of the (G*Sv - "
    "Sm^2)/G^2 form, which overflows BIGINT at ~10x bench scale; "
    "engine-identical either way), prior strength K = m(1e6-m)*1e6 "
    "div v - 1e6 clamped at 0 (v <= 0 degenerates to no "
    "shrinkage), posterior mean (c + a)/(n + K) as ONE quantized "
    "division under the xdp G-shrink guard; top-15 by (shrunk "
    "DESC, user_id) via TakeOrderedAndProject (xco rule). "
    "Differential shrinkage is live on the fixtures: K ~ typical "
    "n, exposures vary ~2x, so raw and shrunk ORDERINGS disagree "
    "(replica-pinned). One events scan + user agg + broadcast "
    "one-row prior fold",
    ("events", "analytics", "quality"),
)
def eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    u = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("c"),
        )
    )
    # consumed by the prior fold AND the posterior scoring in one
    # action — eager-checkpoint the user aggregate so the events scan
    # + user shuffle run once (xeg pattern; #users << #events)
    p = u.select(
        "user_id", "n", "c", F.expr("c * 1000000 div n").alias("p_q")
    ).localCheckpoint(eager=True)
    sc = (
        p.agg(
            F.count(F.lit(1)).cast("long").alias("g"),
            F.sum("p_q").cast("long").alias("sm"),
            F.sum(F.col("p_q") * F.col("p_q")).cast("long").alias("sv"),
        )
        .select(
            "g",
            F.expr("sm div g").alias("m_q"),
            F.expr("sv div g - (sm div g) * (sm div g)").alias("v_q"),
        )
        .select(
            "g",
            "m_q",
            "v_q",
            F.expr(
                "CASE WHEN v_q <= 0 THEN 0L"
                " ELSE greatest((m_q * (1000000 - m_q)) * 1000000"
                " div greatest(v_q, 1) - 1000000, 0L) END"
            ).alias("k_q"),
        )
    )
    shr = (
        p.crossJoin(F.broadcast(sc))
        .select(
            "user_id",
            "n",
            "c",
            "p_q",
            "m_q",
            "k_q",
            F.expr("(m_q * k_q) div 1000000").alias("a6"),
            F.expr(
                "greatest((n * 1000000 + k_q) div 1000000000000, 1)"
            ).alias("gg"),
        )
        .select(
            "user_id",
            "n",
            "c",
            "p_q",
            "m_q",
            "k_q",
            F.expr(
                "(((c * 1000000 + a6) div gg) * 1000000)"
                " div greatest((n * 1000000 + k_q) div gg, 1)"
            ).alias("shrunk_q"),
        )
    )
    return (
        shr.orderBy(F.col("shrunk_q").desc(), "user_id")
        .limit(15)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n").alias("n_events"),
            F.col("c").alias("n_purchases"),
            (F.col("p_q") / 1e6).alias("raw_rate"),
            (F.col("shrunk_q") / 1e6).alias("shrunk_rate"),
            (F.col("m_q") / 1e6).alias("prior_mean"),
            (F.col("k_q") / 1e6).alias("prior_strength"),
        )
    )


@query(
    "xej_neyman_allocation",
    """
    WITH strata AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(length(text)) AS BIGINT) AS sx,
               CAST(sum(length(text) * length(text)) AS BIGINT) AS sxx
        FROM documents GROUP BY lang
    ),
    sd AS (
        SELECT lang, n_h,
               CAST(floor(sqrt(greatest(
                   sxx // n_h - (sx // n_h) * (sx // n_h), 0)) * 1000)
                   AS BIGINT) AS sd_milli
        FROM strata
    ),
    wts AS (
        SELECT lang, n_h, sd_milli, n_h * sd_milli AS w,
               CAST(sum(n_h * sd_milli) OVER () AS BIGINT) AS tw
        FROM sd
    ),
    base AS (
        SELECT lang, n_h, sd_milli, w, tw,
               greatest(tw // 1000000000000, 1) AS g
        FROM wts
    ),
    seats AS (
        SELECT lang, n_h, sd_milli, w,
               (10000 * (w // g)) // greatest(tw // g, 1) AS base_n,
               (10000 * (w // g)) % greatest(tw // g, 1) AS rem
        FROM base
    ),
    ranked AS (
        SELECT lang, n_h, sd_milli, w, base_n,
               row_number() OVER (ORDER BY rem DESC, lang) AS rk,
               CAST(10000 - sum(base_n) OVER () AS BIGINT) AS leftover
        FROM seats
    )
    SELECT lang, n_h AS n_docs,
           CAST(sd_milli AS BIGINT) / 1e3 AS sd_chars,
           CAST(w AS BIGINT) AS neyman_weight,
           CAST(base_n + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_labels
    FROM ranked ORDER BY lang
    """,
    "NEYMAN OPTIMAL ALLOCATION of a 10k-label annotation budget "
    "across language strata (Neyman 1934 — the survey-sampling "
    "design step the sampling family lacked: the samplers EXECUTE a "
    "split, this DECIDES the split that minimizes estimator "
    "variance, n_h proportional to N_h*S_h): per-language doc-length "
    "moments as the declared integer-op form (xei rule — the exact "
    "cross-multiplied variance overflows at corpus scale), S_h = "
    "floor(sqrt(var)*1000) milli-units (IEEE sqrt of an identical "
    "integer-derived double is correctly rounded — the x37 "
    "precedent), weights w_h = N_h*S_h exact BIGINTs, integer "
    "seats 10000*w_h div W under the xdp G-shrink guard, and the "
    "leftover distributed by LARGEST REMAINDER with deterministic "
    "(rem DESC, lang) ties — the xd1 Hamilton idiom on weighted "
    "strata, so allocations sum to EXACTLY 10000 (replica-pinned "
    "invariant). Window work rides the strata frame (bounded by "
    "language count); one documents scan + one lang-keyed agg",
    ("documents", "analytics", "sampling"),
)
def xej_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    strata = (
        t["documents"]
        .select("lang", F.length("text").cast("long").alias("x"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )
    sd = strata.select(
        "lang",
        "n_h",
        F.expr(
            "CAST(floor(sqrt(greatest("
            "sxx div n_h - (sx div n_h) * (sx div n_h), 0L)) * 1000)"
            " AS BIGINT)"
        ).alias("sd_milli"),
    )
    wts = sd.select(
        "lang",
        "n_h",
        "sd_milli",
        (F.col("n_h") * F.col("sd_milli")).alias("w"),
        F.sum(F.col("n_h") * F.col("sd_milli"))
        .over(W.partitionBy())
        .cast("long")
        .alias("tw"),
    )
    seats = wts.select(
        "lang",
        "n_h",
        "sd_milli",
        "w",
        F.expr(
            "(10000 * (w div greatest(tw div 1000000000000, 1)))"
            " div greatest(tw div greatest(tw div 1000000000000, 1), 1)"
        ).alias("base_n"),
        F.expr(
            "(10000 * (w div greatest(tw div 1000000000000, 1)))"
            " % greatest(tw div greatest(tw div 1000000000000, 1), 1)"
        ).alias("rem"),
    )
    ranked = seats.select(
        "lang",
        "n_h",
        "sd_milli",
        "w",
        "base_n",
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("rem").desc(), "lang"))
        .alias("rk"),
        (F.lit(10000) - F.sum("base_n").over(W.partitionBy()))
        .cast("long")
        .alias("leftover"),
    )
    return ranked.select(
        "lang",
        F.col("n_h").alias("n_docs"),
        (F.col("sd_milli") / 1e3).alias("sd_chars"),
        F.col("w").cast("long").alias("neyman_weight"),
        F.expr(
            "CAST(base_n + CASE WHEN rk <= leftover THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("alloc_labels"),
    ).orderBy("lang")


@query(
    "xek_anova_doc_length",
    """
    WITH g AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_j,
               CAST(sum(length(text)) AS BIGINT) AS s_j,
               CAST(sum(length(text) * length(text)) AS BIGINT) AS sxx_j
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT CAST(sum(n_j) AS BIGINT) AS n,
               CAST(sum(s_j) AS BIGINT) AS s,
               CAST(sum(sxx_j) AS BIGINT) AS sxx,
               CAST(sum((s_j * s_j) // n_j) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS k
        FROM g
    ),
    ss AS (
        SELECT n, k,
               t - (s * s) // n AS ssb,
               sxx - t AS ssw
        FROM tot
    ),
    f AS (
        SELECT n, k, ssb, ssw,
               greatest(greatest(ssb, ssw) // 1000000000000, 1) AS gg
        FROM ss
    )
    SELECT g.lang, g.n_j AS n_docs,
           CAST(g.s_j // g.n_j AS BIGINT) AS mean_chars,
           f.ssb AS ss_between, f.ssw AS ss_within,
           CAST(CASE WHEN f.ssw = 0 OR f.k <= 1 THEN 0
                ELSE (((f.ssb // f.gg) * 1000000)
                      // greatest(f.ssw // f.gg, 1))
                     * (f.n - f.k) // (f.k - 1) END AS BIGINT) / 1e6
               AS f_stat,
           CAST(CASE WHEN f.ssb + f.ssw = 0 THEN 0
                ELSE ((f.ssb // f.gg) * 1000000)
                     // greatest((f.ssb + f.ssw) // f.gg, 1) END AS BIGINT)
               / 1e6 AS eta_squared
    FROM g CROSS JOIN f
    ORDER BY g.lang
    """,
    "ONE-WAY ANOVA + ETA-SQUARED: does document length differ by "
    "language (Fisher 1925 — completes the bivariate-association "
    "matrix: xed chi-square is categorical x categorical, x84/xdo "
    "Pearson/Spearman numeric x numeric, xfr_ks_drift KS two-sample; this is "
    "the categorical x numeric member): per-language char-length "
    "moments, between/within sum-of-squares via the quantized "
    "group-term T = sum(S_j^2 div n_j) (error < 1 char^2 per group, "
    "bounded group count — declared quantization), SSB = T - S^2 "
    "div N and SSW = Sxx - T exact BIGINTs from there, F = "
    "(SSB/(k-1))/(SSW/(N-k)) and effect size eta^2 = SSB/(SSB+SSW) "
    "each as ONE G-shrink-guarded integer division (ratios in 1e6 "
    "units; SSB*1e6 alone would overflow at ~10x bench scale). NO "
    "significance verdict is emitted: the F critical value depends "
    "on data-driven degrees of freedom (k-1, N-k), which cannot be "
    "a pinned literal — the statistic and effect size are the "
    "deliverable (the xe4/xfr_ks_drift verdict pattern applies only when "
    "dof is fixed). One scan + one lang agg + broadcast scalar fold",
    ("documents", "analytics", "text"),
)
def xek_anova_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    g = (
        t["documents"]
        .select("lang", F.length("text").cast("long").alias("x"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_j"),
            F.sum("x").cast("long").alias("s_j"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx_j"),
        )
        # feeds the SS fold and the per-language output rows in one
        # action — eager-checkpoint so the documents scan runs once
        .localCheckpoint(eager=True)
    )
    tot = g.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.sum("s_j").cast("long").alias("s"),
        F.sum("sxx_j").cast("long").alias("sxx"),
        F.sum(F.expr("(s_j * s_j) div n_j")).cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    f = tot.select(
        "n",
        "k",
        F.expr("t - (s * s) div n").alias("ssb"),
        F.expr("sxx - t").alias("ssw"),
    ).select(
        "n",
        "k",
        "ssb",
        "ssw",
        F.expr("greatest(greatest(ssb, ssw) div 1000000000000, 1)").alias(
            "gg"
        ),
    )
    return (
        g.crossJoin(F.broadcast(f))
        .select(
            "lang",
            F.col("n_j").alias("n_docs"),
            F.expr("CAST(s_j div n_j AS BIGINT)").alias("mean_chars"),
            F.col("ssb").alias("ss_between"),
            F.col("ssw").alias("ss_within"),
            F.expr(
                "CAST(CASE WHEN ssw = 0 OR k <= 1 THEN 0"
                " ELSE (((ssb div gg) * 1000000)"
                " div greatest(ssw div gg, 1)) * (n - k) div (k - 1) END"
                " AS BIGINT) / 1e6"
            ).alias("f_stat"),
            F.expr(
                "CAST(CASE WHEN ssb + ssw = 0 THEN 0"
                " ELSE ((ssb div gg) * 1000000)"
                " div greatest((ssb + ssw) div gg, 1) END AS BIGINT) / 1e6"
            ).alias("eta_squared"),
        )
        .orderBy("lang")
    )


@query(
    "xeo_theil_sen_slope",
    """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               (b.c - a.c) * 1000000 // (b.d - a.d) AS slope_q,
               a.d AS d1, b.d AS d2
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d
    ),
    med AS (
        SELECT event_type, slope_q,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope_q, d1, d2) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        FROM pairs
    ),
    sl AS (
        SELECT event_type, slope_q AS ts_slope_q, m AS n_pairs
        FROM med WHERE rn = (m + 1) // 2
    ),
    resid AS (
        SELECT d.event_type,
               d.c * 1000000 - s.ts_slope_q * d.d AS r_q,
               d.d,
               s.ts_slope_q, s.n_pairs
        FROM daily d JOIN sl s ON s.event_type = d.event_type
    ),
    rmed AS (
        SELECT event_type, ts_slope_q, n_pairs, r_q,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY r_q, d) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM resid
    )
    SELECT event_type, n AS n_days, n_pairs,
           CAST(ts_slope_q AS BIGINT) / 1e6 AS slope_cents_per_day,
           CAST(r_q AS BIGINT) / 1e6 AS intercept_cents
    FROM rmed WHERE rn = (n + 1) // 2
    ORDER BY event_type
    """,
    "THEIL-SEN ROBUST SLOPE + INTERCEPT (Theil 1950 / Sen 1968 — the "
    "robust ESTIMATOR beside the family's tests: xe4 Mann-Kendall "
    "answers 'is there a monotone trend', xce OLS fits a "
    "least-squares line an outlier day can hijack; Theil-Sen is the "
    "median of all pairwise slopes, 29% breakdown): per event type "
    "on the observed daily revenue-cents series, pairwise slopes "
    "(c2-c1)*1e6 div (d2-d1) from a renamed-key self-join on the "
    "BOUNDED day axis (the xe4 pair frame; C(n,2) pairs per type — "
    "never corpus-sized), signed quotients truncate toward zero "
    "identically (r8 pin); the median is the DECLARED LOWER median "
    "at rank (m+1) div 2 under the unique (slope_q, d1, d2) order "
    "(no two-middle averaging — stays integer); intercept = lower "
    "median of residuals c*1e6 - slope_q*d under (r_q, d) order. "
    "Two bounded-size window passes; one events scan feeds the "
    "checkpointed daily aggregate consumed by pairs AND residuals",
    ("events", "analytics", "timeseries"),
)
def xeo_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    daily = (
        t["events"]
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), DATE '1970-01-01')")
            .cast("long")
            .alias("d"),
            F.expr("cast(round(value * 100) as bigint)").alias("__vc"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("__vc").cast("long").alias("c"))
        # consumed by the pair join (twice, as both sides) and the
        # residual pass — checkpoint so the events scan runs once
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("c").alias("c1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("c").alias("c2"),
    )
    pairs = a.join(
        b, (F.col("et2") == F.col("event_type")) & (F.col("d2") > F.col("d1"))
    ).select(
        "event_type",
        F.expr("(c2 - c1) * 1000000 div (d2 - d1)").alias("slope_q"),
        "d1",
        "d2",
    )
    wm = W.partitionBy("event_type").orderBy("slope_q", "d1", "d2")
    med = pairs.select(
        "event_type",
        "slope_q",
        F.row_number().over(wm).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .cast("long")
        .alias("m"),
    )
    sl = med.filter(F.expr("rn = (m + 1) div 2")).select(
        "event_type",
        F.col("slope_q").alias("ts_slope_q"),
        F.col("m").alias("n_pairs"),
    )
    resid = daily.join(sl, "event_type").select(
        "event_type",
        "ts_slope_q",
        "n_pairs",
        F.expr("c * 1000000 - ts_slope_q * d").alias("r_q"),
        "d",
    )
    wr = W.partitionBy("event_type").orderBy("r_q", "d")
    rmed = resid.select(
        "event_type",
        "ts_slope_q",
        "n_pairs",
        "r_q",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .cast("long")
        .alias("n"),
    )
    return (
        rmed.filter(F.expr("rn = (n + 1) div 2"))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "n_pairs",
            (F.col("ts_slope_q") / 1e6).alias("slope_cents_per_day"),
            (F.col("r_q") / 1e6).alias("intercept_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "xep_file_orc_roundtrip",
    """
    SELECT l_returnflag AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "ORC sink + source roundtrip (completes the file-format matrix "
    "next to xa1's CSV/JSON-lines and the parquet family: ORC is "
    "the other columnar format Spark ships a native vectorized "
    "reader for — Hive-ecosystem interchange): write a pruned "
    "lineitem projection to ORC with integer cents materialized "
    "BEFORE the sink (the float never crosses the format boundary, "
    "so the roundtrip aggregate is exact by construction), read "
    "back with an explicit schema, aggregate; oracle = the same "
    "aggregate straight off parquet — equality proves the "
    "sink+source pair is lossless for longs and strings. Scratch "
    "namespaced per source fixture (_scratch_dir)",
    ("source", "sink", "lineitem"),
)
def xep_file_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import _scratch_dir

    t = _t(spark, sf_dir)
    path = _scratch_dir("file_rt_orc", sf_dir)
    t["lineitem"].select(
        "l_orderkey",
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    ).write.mode("overwrite").orc(path)
    back = spark.read.schema(
        "l_orderkey long, l_returnflag string, cents long"
    ).orc(path)
    return (
        back.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("grp")
    )


@query(
    "xeq_degree_assortativity",
    """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
    ),
    directed AS (
        SELECT u AS s, v AS d FROM pairs
        UNION ALL
        SELECT v, u FROM pairs
    ),
    degs AS (
        SELECT s, d,
               CAST(count(*) OVER (PARTITION BY s) AS BIGINT) AS deg
        FROM directed
    ),
    per_edge AS (
        SELECT least(s, d) AS lo, greatest(s, d) AS hi,
               CAST(max(CASE WHEN s = least(s, d) THEN deg END) AS BIGINT)
                   AS dlo,
               CAST(max(CASE WHEN s = greatest(s, d) THEN deg END) AS BIGINT)
                   AS dhi
        FROM degs GROUP BY least(s, d), greatest(s, d)
    ),
    sums AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(2 * count(*) AS BIGINT) AS n,
               CAST(sum(dlo + dhi) AS BIGINT) AS sx,
               CAST(sum(2 * dlo * dhi) AS BIGINT) AS sxy,
               CAST(sum(dlo * dlo + dhi * dhi) AS BIGINT) AS sxx,
               CAST(max(greatest(dlo, dhi)) AS BIGINT) AS maxdeg
        FROM per_edge
    )
    SELECT m AS n_edges,
           CAST(sx // n AS BIGINT) AS mean_degree,
           maxdeg AS max_degree,
           CAST(CASE WHEN sxx // n - (sx // n) * (sx // n) <= 0 THEN 0
                ELSE (sxy // n - (sx // n) * (sx // n)) * 1000000
                     // (sxx // n - (sx // n) * (sx // n)) END AS BIGINT)
               / 1e6 AS assortativity
    FROM sums
    """,
    "DEGREE ASSORTATIVITY of the co-purchase part graph (Newman 2002 "
    "— the graph-diagnostics scalar the family lacked: CC/kcore/LPA "
    "find structure, PageRank/HITS rank vertices; assortativity says "
    "whether hubs attach to hubs (r > 0, social-network-like) or to "
    "leaves (r < 0, hub-and-spoke) — decides if degree-based "
    "sampling/salting is needed before the joins): distinct "
    "co-purchase pairs from a renamed-key same-order self-join "
    "(basket-bounded fan-out — TPC-H baskets <= 7 lines, so pairs "
    "per order are C(7,2)-bounded at any corpus scale), endpoint "
    "degrees via the r8 idiom (ONE window count over the directed "
    "explode, then one (lo,hi)-keyed agg of each edge's two rows — "
    "no degree joins), and Newman's r over the DIRECTED pair list, "
    "where symmetry makes Sy = Sx so r = (Sxy/n - mean^2)/(Sxx/n - "
    "mean^2) — NO sqrt at all; declared integer-op moments (xei "
    "rule, overflow-free at any scale), one signed toward-zero "
    "quantized division, b <= 0 degenerates to 0. Degrees are exact "
    "integers end-to-end; one lineitem self-join + one window + two "
    "aggs",
    ("lineitem", "graph", "analytics"),
)
def xeq_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators.graph import _both_directions

    t = _t(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_partkey")
    # in-array pair enumeration (the apriori/basket_affinity r14
    # rewrite): per-order sorted part arrays are bounded (<= 17 at
    # fixture), so the co-purchase edges explode map-side — no
    # order-keyed self-join.
    its = F.col("__its")
    pair_arr = F.flatten(
        F.transform(
            its,
            lambda x, i: F.transform(
                F.slice(its, i + F.lit(2), F.size(its)),
                lambda y: F.array(x, y),
            ),
        )
    )
    pairs = (
        li.distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("__its"))
        .select(F.explode(pair_arr).alias("__p"))
        .select(F.col("__p")[0].alias("u"), F.col("__p")[1].alias("v"))
        .distinct()
    )
    directed = _both_directions(pairs, "u", "v").select(
        F.col("__u").alias("s"), F.col("__v").alias("d")
    )
    degs = directed.select(
        "s",
        "d",
        F.count(F.lit(1)).over(W.partitionBy("s")).cast("long").alias("deg"),
    )
    per_edge = (
        degs.select(
            F.least("s", "d").alias("lo"),
            F.greatest("s", "d").alias("hi"),
            "s",
            "deg",
        )
        .groupBy("lo", "hi")
        .agg(
            F.max(F.when(F.col("s") == F.col("lo"), F.col("deg")))
            .cast("long")
            .alias("dlo"),
            F.max(F.when(F.col("s") == F.col("hi"), F.col("deg")))
            .cast("long")
            .alias("dhi"),
        )
    )
    sums = per_edge.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        (2 * F.count(F.lit(1))).cast("long").alias("n"),
        F.sum(F.col("dlo") + F.col("dhi")).cast("long").alias("sx"),
        F.sum(2 * F.col("dlo") * F.col("dhi")).cast("long").alias("sxy"),
        F.sum(F.col("dlo") * F.col("dlo") + F.col("dhi") * F.col("dhi"))
        .cast("long")
        .alias("sxx"),
        F.max(F.greatest("dlo", "dhi")).cast("long").alias("maxdeg"),
    )
    return sums.select(
        F.col("m").alias("n_edges"),
        F.expr("CAST(sx div n AS BIGINT)").alias("mean_degree"),
        F.col("maxdeg").alias("max_degree"),
        F.expr(
            "CAST(CASE WHEN sxx div n - (sx div n) * (sx div n) <= 0 THEN 0"
            " ELSE (sxy div n - (sx div n) * (sx div n)) * 1000000"
            " div (sxx div n - (sx div n) * (sx div n)) END AS BIGINT) / 1e6"
        ).alias("assortativity"),
    )


@query(
    "xer_lang_jsd_matrix",
    """
    WITH wcl AS (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT lang,
                     unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                         AS w
              FROM documents)
        WHERE w <> '' GROUP BY lang, w
    ),
    nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM wcl GROUP BY lang),
    legs AS (
        SELECT a.lang AS la, nb.lang AS lb, a.w,
               a.c AS cp, COALESCE(b.c, 0) AS cq,
               na.n AS np, nb.n AS nq
        FROM wcl a
        JOIN nl na ON na.lang = a.lang
        CROSS JOIN nl nb
        LEFT JOIN wcl b ON b.lang = nb.lang AND b.w = a.w
        WHERE nb.lang <> a.lang
    ),
    terms AS (
        SELECT la, lb,
               CAST(cp * CAST(floor(ln(
                   (2.0 * cp * nq) / (cp * nq + cq * np)) * 1000000)
                   AS BIGINT) AS BIGINT) AS t_q,
               np
        FROM legs
    ),
    kl AS (
        SELECT la, lb, np,
               CAST(sum(t_q) AS BIGINT) AS s_q
        FROM terms GROUP BY la, lb, np
    )
    SELECT k1.la AS lang_a, k1.lb AS lang_b,
           k1.np AS n_tokens_a, k2.np AS n_tokens_b,
           CAST(k1.s_q // (2 * k1.np) + k2.s_q // (2 * k2.np) AS BIGINT)
               / 1e6 AS jsd_nats
    FROM kl k1 JOIN kl k2 ON k2.la = k1.lb AND k2.lb = k1.la
    WHERE k1.la < k1.lb
    ORDER BY lang_a, lang_b
    """,
    "PAIRWISE LANGUAGE JENSEN-SHANNON DIVERGENCE MATRIX (Lin 1991 — "
    "the corpus-mixture GEOMETRY readout: xdt resamples languages to "
    "target proportions, xdk importance-weights toward a target "
    "distribution; this measures how far apart the language "
    "subcorpora actually are, the quantity mixture planning needs): "
    "per-language unigram distributions (\\\\s+-lowercase, the pinned "
    "tokenization), JSD(P,Q) = KL(P||M)/1 ... decomposed per word "
    "with ZERO-count words handled natively (a word absent from Q "
    "gives ln(2p/(p+q)) = ln 2 exactly; absent from P contributes "
    "0); the ln ARGUMENT is ONE division of exact BIGINT products "
    "2*c_p*n_q / (c_p*n_q + c_q*n_p) (the xdk rule — identical "
    "quotient doubles on both engines, products < 2^53 to ~100x "
    "bench scale), each term floor-quantized to integer micro-nats "
    "at the WORD level then summed as c_p-weighted exact integers "
    "with the per-language denominator constant per leg — two "
    "integer divisions per pair at the very end. Both KL legs ride "
    "ONE checkpointed (lang, word) aggregate (vocabulary-bounded; "
    "the corpus-sized work is the single word-count shuffle); "
    "ln-boundary fixture contract pinned in "
    "tests/test_fixture_contracts.py",
    ("documents", "text", "analytics"),
)
def xer_lang_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    wcl = (
        t["documents"]
        .select(
            "lang",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # both KL legs and the totals consume this vocabulary-bounded
        # aggregate — checkpoint so the corpus shuffle runs once
        .localCheckpoint(eager=True)
    )
    nl = wcl.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    a = wcl.select(
        F.col("lang").alias("la"), "w", F.col("c").alias("cp")
    ).join(
        nl.select(F.col("lang").alias("la"), F.col("n").alias("np")), "la"
    )
    bspine = nl.select(F.col("lang").alias("lb"), F.col("n").alias("nq"))
    bcounts = wcl.select(
        F.col("lang").alias("lb2"), F.col("w").alias("w2"), F.col("c").alias("cq0")
    )
    legs = (
        a.crossJoin(F.broadcast(bspine))
        .filter(F.col("lb") != F.col("la"))
        .join(
            bcounts,
            (F.col("lb2") == F.col("lb")) & (F.col("w2") == F.col("w")),
            "left",
        )
        .select(
            "la",
            "lb",
            "cp",
            F.coalesce("cq0", F.lit(0)).cast("long").alias("cq"),
            "np",
            "nq",
        )
    )
    terms = legs.select(
        "la",
        "lb",
        "np",
        F.expr(
            "CAST(cp * CAST(floor(ln((2.0 * cp * nq) / (cp * nq + cq * np))"
            " * 1000000) AS BIGINT) AS BIGINT)"
        ).alias("t_q"),
    )
    kl = terms.groupBy("la", "lb", "np").agg(
        F.sum("t_q").cast("long").alias("s_q")
    )
    k2 = kl.select(
        F.col("la").alias("la2"),
        F.col("lb").alias("lb2"),
        F.col("np").alias("np2"),
        F.col("s_q").alias("s_q2"),
    )
    return (
        kl.join(
            k2, (F.col("la2") == F.col("lb")) & (F.col("lb2") == F.col("la"))
        )
        .filter(F.col("la") < F.col("lb"))
        .select(
            F.col("la").alias("lang_a"),
            F.col("lb").alias("lang_b"),
            F.col("np").alias("n_tokens_a"),
            F.col("np2").alias("n_tokens_b"),
            F.expr(
                "CAST(s_q div (2 * np) + s_q2 div (2 * np2) AS BIGINT) / 1e6"
            ).alias("jsd_nats"),
        )
        .orderBy("lang_a", "lang_b")
    )


@query(
    "xes_burstiness",
    """
    WITH ev AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    gaps AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS ds
        FROM ev WHERE prev_ts IS NOT NULL
    ),
    per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(ds) AS BIGINT) AS sx,
               CAST(sum(ds * ds) AS BIGINT) AS sxx
        FROM gaps GROUP BY user_id
    ),
    scored AS (
        SELECT user_id, n,
               (sx // n) * 1000 AS mu_milli,
               CAST(floor(sqrt(greatest(
                   sxx // n - (sx // n) * (sx // n), 0)) * 1000)
                   AS BIGINT) AS sd_milli
        FROM per_user WHERE n >= 5
    ),
    bq AS (
        SELECT user_id, n, mu_milli, sd_milli,
               CASE WHEN sd_milli + mu_milli = 0 THEN 0
                    ELSE (sd_milli - mu_milli) * 1000000
                         // (sd_milli + mu_milli) END AS b_q
        FROM scored
    )
    SELECT CASE WHEN b_q <= -200000 THEN 'periodic'
                WHEN b_q > 200000 THEN 'bursty'
                ELSE 'regular' END AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(b_q) // count(*) AS BIGINT) / 1e6 AS mean_burstiness,
           CAST(sum(n) // count(*) AS BIGINT) AS mean_gaps,
           CAST(sum(mu_milli // 1000) // count(*) AS BIGINT)
               AS mean_gap_seconds
    FROM bq
    GROUP BY CASE WHEN b_q <= -200000 THEN 'periodic'
                  WHEN b_q > 200000 THEN 'bursty'
                  ELSE 'regular' END
    ORDER BY band
    """,
    "INTER-EVENT BURSTINESS BANDS (Goh & Barabási 2008, B = "
    "(sigma - mu)/(sigma + mu) over a user's inter-arrival gaps — "
    "the temporal bot/automation signal next to x87's behavioral "
    "entropy: B -> -1 is a metronome (scripted), B ~ 0 Poisson "
    "(organic), B -> +1 heavy bursts): per-user gaps as EXACT whole "
    "seconds (micros diff div 1e6 — the pinned epoch_us idiom, "
    "second resolution declared; (ts, event_id) unique lag order), "
    "integer-op moments + the xej milli-unit sqrt seam, B one "
    "signed toward-zero quantized division (denominator positive); "
    "band thresholds compare the ENGINE-IDENTICAL quantized b_q "
    "(+-0.2 literals), min 5 gaps declared; banded rollup with "
    "integer-division means. One events scan + one user-ordered "
    "window + two tiny aggs",
    ("events", "analytics", "timeseries"),
)
def xes_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        F.lag("ts")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_ts"),
    )
    gaps = ev.filter(F.col("prev_ts").isNotNull()).select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, prev_ts, ts) div 1000000"
        ).alias("ds"),
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ds").cast("long").alias("sx"),
        F.sum(F.col("ds") * F.col("ds")).cast("long").alias("sxx"),
    )
    scored = per_user.filter(F.col("n") >= 5).select(
        "user_id",
        "n",
        F.expr("(sx div n) * 1000").alias("mu_milli"),
        F.expr(
            "CAST(floor(sqrt(greatest("
            "sxx div n - (sx div n) * (sx div n), 0L)) * 1000) AS BIGINT)"
        ).alias("sd_milli"),
    )
    bq = scored.select(
        "user_id",
        "n",
        "mu_milli",
        "sd_milli",
        F.expr(
            "CASE WHEN sd_milli + mu_milli = 0 THEN 0L"
            " ELSE (sd_milli - mu_milli) * 1000000"
            " div (sd_milli + mu_milli) END"
        ).alias("b_q"),
    )
    return (
        bq.select(
            F.expr(
                "CASE WHEN b_q <= -200000 THEN 'periodic'"
                " WHEN b_q > 200000 THEN 'bursty'"
                " ELSE 'regular' END"
            ).alias("band"),
            "b_q",
            "n",
            "mu_milli",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.expr("CAST(sum(b_q) div count(1) AS BIGINT) / 1e6").alias(
                "mean_burstiness"
            ),
            F.expr("CAST(sum(n) div count(1) AS BIGINT)").alias("mean_gaps"),
            F.expr(
                "CAST(sum(mu_milli div 1000) div count(1) AS BIGINT)"
            ).alias("mean_gap_seconds"),
        )
        .orderBy("band")
    )


# SPRT literal table (Wald 1945, H0 p=0.15 vs H1 p=0.25, alpha=beta=
# 0.05): per-observation LLR steps and decision bounds in integer
# micro-nats, computed once in python and pinned by formula test —
# A = floor(ln(p1/p0)*1e6), B = floor(ln((1-p1)/(1-p0))*1e6) (floor
# of a NEGATIVE value — -125163.14 floors to -125164),
# UP = floor(ln((1-beta)/alpha)*1e6), LO = -UP (symmetric alpha=beta).
_SPRT_STEP_SUCC = 510825
_SPRT_STEP_FAIL = -125164
_SPRT_BOUND_Q = 2944438


@query(
    "sprt_ab",
    """
    WITH arms AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5('ab:' || user_id), 1, 15))::BIGINT
                         % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               max(CASE WHEN event_type = 'purchase' AND value > 250
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    walk AS (
        SELECT arm, user_id, conv,
               CAST(sum(conv * 510825 + (1 - conv) * -125164)
                    OVER (PARTITION BY arm ORDER BY user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS s,
               row_number() OVER (PARTITION BY arm ORDER BY user_id) AS rn
        FROM arms
    ),
    agg AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(conv) AS BIGINT) AS n_conv,
               CAST(sum(conv * 510825 + (1 - conv) * -125164) AS BIGINT)
                   AS final_llr_q,
               min(CASE WHEN s >= 2944438 THEN rn END) AS rn_up,
               min(CASE WHEN s <= -2944438 THEN rn END) AS rn_lo
        FROM walk GROUP BY arm
    )
    SELECT arm, n_users, n_conv,
           CAST(CASE
                WHEN rn_up IS NOT NULL
                     AND (rn_lo IS NULL OR rn_up < rn_lo) THEN rn_up
                WHEN rn_lo IS NOT NULL THEN rn_lo
                ELSE n_users END AS BIGINT) AS n_at_decision,
           CASE WHEN rn_up IS NOT NULL
                     AND (rn_lo IS NULL OR rn_up < rn_lo)
                THEN 'accept_lift'
                WHEN rn_lo IS NOT NULL THEN 'reject_lift'
                ELSE 'undecided' END AS decision,
           CAST(final_llr_q AS BIGINT) / 1e6 AS final_llr
    FROM agg ORDER BY arm
    """,
    "WALD SPRT SEQUENTIAL A/B TEST (Wald 1945 — the EARLY-STOPPING "
    "member of the experimentation family: x73 reads the experiment "
    "out at a fixed horizon, xdd variance-reduces it; SPRT answers "
    "'how early could we have stopped' — the sample-efficiency "
    "judgment sequential testing exists for): H0 p=0.15 vs H1 "
    "p=0.25 at alpha=beta=0.05 over x73's exact arm/conversion "
    "frame (md5-hash arms, high-value purchase conversion), "
    "enrollment order DECLARED as user_id; the log-likelihood walk "
    "is an exact INTEGER cumsum — per-user steps and decision "
    "bounds are python-precomputed micro-nat literals (the r10 "
    "literal-table idiom, formula-pinned incl. the floor-of-"
    "negative B), so crossing detection is a pure integer compare "
    "at every prefix; first crossing via two conditional mins "
    "(earlier bound wins), no crossing -> 'undecided' with n_users "
    "(degenerate-total semantics); final LLR = one exact counts "
    "expression. One events scan + user agg + one arm-ordered "
    "window + tiny agg. SCALE NOTE: a sequential test is inherently "
    "order-dependent — the per-arm cumsum window moves one arm to "
    "one partition; at corpus scale implement the walk as the "
    "standard two-pass parallel prefix scan (per-bucket partial "
    "sums, broadcast prefix offsets, in-bucket cumsum) — "
    "bit-identical integers, no single-partition sort",
    ("events", "analytics", "quality"),
)
def sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    arms = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN event_type = 'purchase' AND value > 250"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("conv")
        )
        .select(
            "user_id",
            "conv",
            F.when(
                F.pmod(
                    dedup_ops.portable_hash(F.col("user_id"), F.lit("ab")),
                    F.lit(2),
                )
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("arm"),
        )
    )
    step = (
        F.col("conv") * F.lit(_SPRT_STEP_SUCC)
        + (1 - F.col("conv")) * F.lit(_SPRT_STEP_FAIL)
    )
    ww = W.partitionBy("arm").orderBy("user_id")
    walk = arms.select(
        "arm",
        "conv",
        F.sum(step)
        .over(ww.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("s"),
        F.row_number().over(ww).alias("rn"),
    )
    agg = walk.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
        F.sum(step).cast("long").alias("final_llr_q"),
        F.min(
            F.when(F.col("s") >= _SPRT_BOUND_Q, F.col("rn"))
        ).alias("rn_up"),
        F.min(
            F.when(F.col("s") <= -_SPRT_BOUND_Q, F.col("rn"))
        ).alias("rn_lo"),
    )
    return agg.select(
        "arm",
        "n_users",
        "n_conv",
        F.expr(
            "CAST(CASE WHEN rn_up IS NOT NULL"
            " AND (rn_lo IS NULL OR rn_up < rn_lo) THEN rn_up"
            " WHEN rn_lo IS NOT NULL THEN rn_lo"
            " ELSE n_users END AS BIGINT)"
        ).alias("n_at_decision"),
        F.expr(
            "CASE WHEN rn_up IS NOT NULL"
            " AND (rn_lo IS NULL OR rn_up < rn_lo) THEN 'accept_lift'"
            " WHEN rn_lo IS NOT NULL THEN 'reject_lift'"
            " ELSE 'undecided' END"
        ).alias("decision"),
        (F.col("final_llr_q") / 1e6).alias("final_llr"),
    ).orderBy("arm")


@query(
    "xeu_hill_tail_index",
    """
    WITH purch AS (
        SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase' AND CAST(round(value * 100) AS BIGINT) > 0
    ),
    top101 AS (
        SELECT cents, event_id FROM purch
        ORDER BY cents DESC, event_id LIMIT 101
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents DESC, event_id) AS rn
        FROM top101
    ),
    ks AS (SELECT unnest([50, 100]) AS k),
    thr AS (
        SELECT ks.k, r.cents AS x_k1
        FROM ks JOIN ranked r ON r.rn = ks.k + 1
    ),
    terms AS (
        SELECT t.k, t.x_k1,
               CAST(sum(CAST(floor(ln(CAST(r.cents AS DOUBLE) / t.x_k1)
                        * 1000000) AS BIGINT)) AS BIGINT) AS sum_ln_q
        FROM thr t JOIN ranked r ON r.rn <= t.k
        GROUP BY t.k, t.x_k1
    )
    SELECT CAST(k AS BIGINT) AS k, x_k1 AS threshold_cents,
           sum_ln_q,
           CASE WHEN sum_ln_q = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(k * 1000000000000 // sum_ln_q AS BIGINT) / 1e6
           END AS hill_alpha
    FROM terms ORDER BY k
    """,
    "HILL TAIL-INDEX ESTIMATOR of the purchase-value distribution "
    "(Hill 1975 — the tail-heaviness judgment completing the "
    "inequality family: xcr's Gini says how unequal the mass is, "
    "this says whether the tail is POWER-LAW and how heavy — "
    "alpha < 2 means infinite variance, the 'can I trust my mean "
    "revenue' diagnostic): alpha_k = k / sum ln(x_(i)/x_(k+1)) "
    "over the k largest order statistics, at k = 50 and 100 (two "
    "rows — the stability readout: a stable alpha across k "
    "supports the power-law read); top-101 via ONE "
    "TakeOrderedAndProject under the unique (cents DESC, event_id) "
    "order (the xco rule — never a global rank), every ln argument "
    "ONE division of two exact BIGINT cents (xdk rule), micro-nat "
    "floor per term, exact integer sums, alpha = one integer "
    "quantized division (k*1e12 div sum); x_i = x_(k+1) gives "
    "ln 1 = 0 exactly; zero-cent purchases excluded (declared); "
    "ln-boundary fixture contract pinned. All window/join work on "
    "the 101-row frame",
    ("events", "analytics", "quality"),
)
def xeu_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    purch = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
        .filter(F.col("cents") > 0)
    )
    top101 = purch.orderBy(F.col("cents").desc(), "event_id").limit(101)
    ranked = top101.select(
        "cents",
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("cents").desc(), "event_id"))
        .alias("rn"),
    ).localCheckpoint(eager=True)
    ks = spark.createDataFrame([(50,), (100,)], "k long")
    thr = ks.join(ranked, F.col("rn") == F.col("k") + 1).select(
        "k", F.col("cents").alias("x_k1")
    )
    terms = (
        thr.join(
            ranked.select(F.col("cents").alias("ci"), "rn"),
            F.col("rn") <= F.col("k"),
        )
        .groupBy("k", "x_k1")
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(ln(CAST(ci AS DOUBLE) / x_k1) * 1000000)"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("sum_ln_q")
        )
    )
    return terms.select(
        F.col("k").cast("long").alias("k"),
        F.col("x_k1").alias("threshold_cents"),
        "sum_ln_q",
        F.expr(
            "CASE WHEN sum_ln_q = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE CAST(k * 1000000000000 div sum_ln_q AS BIGINT) / 1e6 END"
        ).alias("hill_alpha"),
    ).orderBy("k")


@query(
    "xev_zipf_exponent",
    """
    WITH wc AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),
                                                  '\\s+')) AS w
              FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
               c
        FROM wc
    ),
    lns AS (
        SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT) AS x,
               CAST(floor(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS y
        FROM ranked
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM lns
    ),
    ab AS (
        SELECT n,
               sxy // n - (sx // n) * (sy // n) AS a_q,
               sxx // n - (sx // n) * (sx // n) AS b_q,
               syy // n - (sy // n) * (sy // n) AS c_q
        FROM mom
    )
    SELECT n AS vocab_size,
           CAST(CASE WHEN b_q <= 0 THEN 0
                ELSE -(((a_q // greatest(b_q // 1000000000000, 1)) * 1000000)
                       // greatest(b_q // greatest(b_q // 1000000000000, 1),
                                   1)) END AS BIGINT) / 1e6
               AS zipf_exponent,
           CAST(CASE WHEN b_q <= 0 OR c_q <= 0 THEN 0
                ELSE CAST(floor(
                    (CAST(a_q AS DOUBLE) * a_q)
                    / (CAST(b_q AS DOUBLE) * c_q) * 1000000) AS BIGINT)
                END AS BIGINT) / 1e6 AS r_squared
    FROM ab
    """,
    "ZIPF RANK-FREQUENCY EXPONENT (Zipf 1949 — the corpus-"
    "NATURALNESS diagnostic closing the corpus-statistics family: "
    "vocab_good_turing estimates unseen mass, xcr token inequality, xer language "
    "geometry; natural language shows ln(freq) ~ -s*ln(rank) with "
    "s ~ 1, synthetic word salads drift far from it — a cheap "
    "generated-vs-organic screen): vocabulary ranked by the unique "
    "(count DESC, word) order (vocabulary-bounded window — the "
    "corpus-sized work is the one word-count shuffle), ln(rank) "
    "and ln(count) floor-quantized to MILLI-nats (each ln takes "
    "ONE integer argument — trivially the xdk single-quotient "
    "form; boundary fixture contract pinned; r12 ADVICE fix: at "
    "micro-nats the raw moment sums sum(x*x) overflowed BIGINT at "
    "~1e5 distinct words — milli-nats bound x,y <= ln(2^63)*1e3 ~ "
    "43700, so sum(x*x) < 2^63 holds to ~4.8e9 vocabulary words, "
    "beyond any real corpus; slope precision loss ~1e-4, "
    "immaterial for a naturalness screen), OLS slope via "
    "declared integer-op moments (the xei overflow-free form), "
    "exponent = one signed G-shrink-guarded quantized division "
    "NEGATED (the covariance*1e6 product is unguarded-overflow at "
    "giant-corpus ln magnitudes), r^2 = "
    "a^2/(b*c) as ONE fixed double expression over the identical "
    "engine integers floor-quantized (x37 idiom); degenerate "
    "variances CASE-guarded",
    ("documents", "text", "analytics"),
)
def xev_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    wc = (
        t["documents"]
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = wc.select(
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("c").desc(), "w"))
        .cast("long")
        .alias("rk"),
        "c",
    )
    lns = ranked.select(
        F.expr(
            "CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(floor(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT)"
        ).alias("y"),
    )
    mom = lns.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    ab = mom.select(
        "n",
        F.expr("sxy div n - (sx div n) * (sy div n)").alias("a_q"),
        F.expr("sxx div n - (sx div n) * (sx div n)").alias("b_q"),
        F.expr("syy div n - (sy div n) * (sy div n)").alias("c_q"),
    )
    return ab.select(
        F.col("n").alias("vocab_size"),
        F.expr(
            "CAST(CASE WHEN b_q <= 0 THEN 0L"
            " ELSE -(((a_q div greatest(b_q div 1000000000000, 1)) * 1000000)"
            " div greatest(b_q div greatest(b_q div 1000000000000, 1), 1))"
            " END AS BIGINT) / 1e6"
        ).alias("zipf_exponent"),
        F.expr(
            "CAST(CASE WHEN b_q <= 0 OR c_q <= 0 THEN 0L"
            " ELSE CAST(floor((CAST(a_q AS DOUBLE) * a_q)"
            " / (CAST(b_q AS DOUBLE) * c_q) * 1000000) AS BIGINT)"
            " END AS BIGINT) / 1e6"
        ).alias("r_squared"),
    )


@query(
    "xex_ltv_cohort_triangle",
    """
    WITH o AS (
        SELECT o_custkey AS ck,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS mo,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    firsts AS (SELECT ck, min(mo) AS cohort FROM o GROUP BY ck),
    base AS (
        SELECT f.cohort, o.mo - f.cohort AS age,
               o.cents, o.ck
        FROM o JOIN firsts f ON f.ck = o.ck
    ),
    lim AS (SELECT min(cohort) AS c0 FROM firsts),
    cell AS (
        SELECT b.cohort, b.age,
               CAST(sum(b.cents) AS BIGINT) AS rev_cents
        FROM base b CROSS JOIN lim
        WHERE b.cohort < lim.c0 + 12 AND b.age BETWEEN 0 AND 11
        GROUP BY b.cohort, b.age
    ),
    sizes AS (
        SELECT f.cohort, CAST(count(*) AS BIGINT) AS n_cust
        FROM firsts f CROSS JOIN lim
        WHERE f.cohort < lim.c0 + 12
        GROUP BY f.cohort
    ),
    cum AS (
        SELECT c.cohort, c.age, s.n_cust, c.rev_cents,
               CAST(sum(c.rev_cents) OVER (PARTITION BY c.cohort
                    ORDER BY c.age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_cents
        FROM cell c JOIN sizes s ON s.cohort = c.cohort
    )
    SELECT cohort AS cohort_month_idx, age AS age_months, n_cust,
           CAST(rev_cents // 100 AS BIGINT) AS revenue_dollars,
           CAST(cum_cents // (100 * n_cust) AS BIGINT)
               AS cum_ltv_dollars_per_cust
    FROM cum ORDER BY cohort, age
    """,
    "COHORT LTV TRIANGLE (the revenue-accumulation staple next to "
    "xb5's presence-based retention matrix — a MATERIALLY different "
    "measure per the extension rule: retention counts who came "
    "back, LTV sums what each acquisition cohort has spent by age "
    "N, the payback-period readout growth teams plan spend "
    "against): cohort = month index of the customer's first order "
    "(year*12 + month — integer, tz-free on DATE), age = order "
    "month - cohort month, first 12 cohorts x ages 0..11 declared "
    "(the triangle's fixed frame; the min-cohort fold is a "
    "broadcast one-row crossJoin), per-cell exact cent sums, "
    "cumulative LTV per customer = one cohort-partitioned window "
    "cumsum + integer floor-dollar division by cohort size. All "
    "integer end-to-end (2dp-true o_totalprice recovery class); "
    "orders scanned for facts + one first-order agg, both "
    "checkpoint-free linear chains over the bounded month axis",
    ("orders", "analytics", "customer"),
)
def xex_ltv_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    o = t["orders"].select(
        F.col("o_custkey").alias("ck"),
        F.expr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
        ).alias("mo"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    firsts = o.groupBy("ck").agg(F.min("mo").alias("cohort")).localCheckpoint(
        eager=True
    )
    lim = firsts.agg(F.min("cohort").alias("c0"))
    base = o.join(firsts, "ck").select(
        "cohort", (F.col("mo") - F.col("cohort")).alias("age"), "cents"
    )
    cell = (
        base.crossJoin(F.broadcast(lim))
        .filter(
            (F.col("cohort") < F.col("c0") + 12)
            & F.col("age").between(0, 11)
        )
        .groupBy("cohort", "age")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    sizes = (
        firsts.crossJoin(F.broadcast(lim))
        .filter(F.col("cohort") < F.col("c0") + 12)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    )
    wc = W.partitionBy("cohort").orderBy("age").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = cell.join(sizes, "cohort").select(
        "cohort",
        "age",
        "n_cust",
        "rev_cents",
        F.sum("rev_cents").over(wc).cast("long").alias("cum_cents"),
    )
    return cum.select(
        F.col("cohort").alias("cohort_month_idx"),
        F.col("age").alias("age_months"),
        "n_cust",
        F.expr("CAST(rev_cents div 100 AS BIGINT)").alias("revenue_dollars"),
        F.expr("CAST(cum_cents div (100 * n_cust) AS BIGINT)").alias(
            "cum_ltv_dollars_per_cust"
        ),
    ).orderBy("cohort_month_idx", "age_months")


# ---------------------------------------------------------------------------
# Trained quality classifier (r12 depth flagship)
# ---------------------------------------------------------------------------


def _qc_sigmoid_edges() -> list[int]:
    """257 sigmoid samples at the milli-logit edges -16000 + 125*k
    (k = 0..256), each floored to micro-probability.

    The literal-table idiom (sprt_ab / inverse-CDF family) extended to
    a TRANSCENDENTAL CURVE: python computes the table once, both
    engines index the identical literal list and linearly interpolate
    between adjacent edges in pure integer arithmetic, so sigmoid(s)
    is an exact total function of the integer logit on Spark, DuckDB
    and the python replica alike — no engine ever calls exp(). Pinned
    by a formula test (test_statistics_ops)."""
    import math

    return [
        math.floor(1_000_000 / (1 + math.exp(-(-16000 + 125 * k) / 1000)))
        for k in range(257)
    ]


_QC_FEATS = ("w_stop", "w_punct", "w_digit", "w_distinct", "w_len")
_QC_ROUNDS = 10
_QC_ETA_NUM = 4


def _qc_chain_sql() -> str:
    """Unrolled integer-GD logistic-regression oracle for
    ``quality_classifier``: feature extraction -> integer
    standardization -> _QC_ROUNDS gradient/update rounds, every
    per-round CTE ``AS MATERIALIZED`` (the kcore rule — DuckDB inlines
    plain CTEs, so an unrolled chain would otherwise compile
    exponential subtree copies), each one-row state CTE consumed via
    ``LEFT JOIN ... ON true`` (the r11 BPE-chain rule)."""
    edges = "[" + ",".join(str(v) for v in _qc_sigmoid_edges()) + "]"
    split = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
    stop = (
        "list_filter(regexp_split_to_array(trim(text), '\\s+'),"
        " x -> list_contains(['the','a','of','and','in','to','is'], lower(x)))"
    )
    ctes = [
        f"""chars AS MATERIALIZED (
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
        FROM documents
    )""",
        f"""wp AS MATERIALIZED (
        SELECT doc_id,
               len({split}) AS n_words,
               len(list_distinct({split})) AS n_distinct,
               len({stop}) AS n_stop
        FROM documents
    )""",
        """feats AS MATERIALIZED (
        SELECT w.n_stop * 1000 // greatest(w.n_words, 1) AS f1,
               c.n_punct * 1000 // greatest(c.n_chars, 1) AS f2,
               c.n_digit * 1000 // greatest(c.n_chars, 1) AS f3,
               w.n_distinct * 1000 // greatest(w.n_words, 1) AS f4,
               least(w.n_words, 1000) AS f5,
               CASE WHEN w.n_words >= 5 AND w.n_words <= 5000
                     AND c.n_nonspace >= w.n_words * 2
                     AND c.n_nonspace <= w.n_words * 12
                     AND w.n_stop >= 2
                     AND c.n_punct * 10 <= c.n_chars * 3
                     AND c.n_digit * 5 <= c.n_chars
                     AND w.n_distinct * 10 >= w.n_words * 3
                THEN 1 ELSE 0 END AS y
        FROM chars c JOIN wp w USING (doc_id)
    )""",
        "stats AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_, "
        + ", ".join(
            f"CAST(sum(f{j}) AS BIGINT) AS s{j}, CAST(sum(f{j} * f{j}) AS BIGINT) AS q{j}"
            for j in range(1, 6)
        )
        + " FROM feats)",
        "norm AS MATERIALIZED (SELECT n_, "
        + ", ".join(
            f"s{j} // n_ AS m{j}, "
            f"greatest(CAST(floor(sqrt(CAST(greatest(q{j} // n_ - (s{j} // n_) * (s{j} // n_), 0) AS DOUBLE))) AS BIGINT), 1) AS d{j}"
            for j in range(1, 6)
        )
        + " FROM stats)",
        "zf AS MATERIALIZED (SELECT y, "
        + ", ".join(
            f"least(greatest((f{j} - m{j}) * 1000 // d{j}, -4000), 4000) AS z{j}"
            for j in range(1, 6)
        )
        + " FROM feats LEFT JOIN norm ON true)",
        f"edges AS (SELECT {edges} AS e)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(6))
        + ")",
    ]
    zsum = " + ".join(f"w.w{j} * z{j}" for j in range(1, 6))
    for r in range(1, _QC_ROUNDS + 2):
        ctes.append(
            f"""g{r} AS MATERIALIZED (
        SELECT CAST(sum(em * 1000) AS BIGINT) AS g0,
               {", ".join(f"CAST(sum(em * z{j}) AS BIGINT) AS g{j}" for j in range(1, 6))},
               CAST(sum(ok) AS BIGINT) AS correct
        FROM (
            SELECT z1, z2, z3, z4, z5,
                   (e[kk + 1] + (e[kk + 2] - e[kk + 1]) * (sm + 16000 - 125 * kk) // 125)
                       // 1000 - 1000 * y AS em,
                   CASE WHEN (s >= 0) = (y = 1) THEN 1 ELSE 0 END AS ok, y
            FROM (
                SELECT *, (sm + 16000) // 125 AS kk
                FROM (
                    SELECT *, least(greatest(s // 1000, -16000), 15999) AS sm
                    FROM (
                        SELECT zf.*, e, w.w0 * 1000 + {zsum} AS s
                        FROM zf LEFT JOIN w{r - 1} w ON true
                        LEFT JOIN edges ON true
                    )
                )
            )
        ) t(z1, z2, z3, z4, z5, em, ok, y)
    )"""
        )
        if r <= _QC_ROUNDS:
            ctes.append(
                f"w{r} AS MATERIALIZED (SELECT "
                + ", ".join(
                    f"w.w{j} - ({_QC_ETA_NUM} * (g.g{j} // s.n_)) // 1000 AS w{j}"
                    for j in range(6)
                )
                + f" FROM w{r - 1} w LEFT JOIN g{r} g ON true LEFT JOIN norm s ON true)"
            )
    selects = []
    names = ("w_bias",) + _QC_FEATS
    for r in range(_QC_ROUNDS + 1):
        cols = ", ".join(f"w.w{j} AS {names[j]}" for j in range(6))
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS round, {cols},"
            f" CAST(g.correct * 1000000 // s.n_ AS BIGINT) / 1e6 AS acc"
            f" FROM w{r} w LEFT JOIN g{r + 1} g ON true LEFT JOIN norm s ON true"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY round"
    )


@query(
    "quality_classifier",
    _qc_chain_sql(),
    "TRAINED QUALITY CLASSIFIER (the fastText-style learned quality "
    "gate every production corpus pipeline ships between cheap "
    "heuristics and dedup — Brown et al. 2020 trained LR on "
    "WebText-vs-CommonCrawl, CCNet/DSIR distill heuristic signals the "
    "same way; this is the missing TRAINED member of the quality "
    "family: x50 rules -> x53/x66 perplexity -> dsir importance -> "
    "THIS, a logistic regression distilling the Gopher rule verdict "
    "into a smooth linear scorer): 5 integer per-mille features "
    "(stopword/punct/digit/distinct per-mille + capped word count; "
    "the doc_stats extraction, exact on both engines), label = the "
    "x50 Gopher composite (integer cross-multiplication thresholds), "
    "integer z-standardization (milli-z, clamped +-4000; sd = "
    "floor(sqrt(integer variance)) — sqrt of an exact BIGINT is "
    "engine-identical IEEE, the x37 lesson), then _QC_ROUNDS rounds "
    "of full-batch gradient descent in EXACT INTEGER arithmetic: "
    "sigmoid via a 257-edge literal micro-prob table with integer "
    "linear interpolation between edges (the sprt_ab literal-table "
    "idiom extended to a transcendental CURVE — no engine calls "
    "exp(); a step-function table stalled at 0.888 accuracy, "
    "interpolation reaches the 0.97 float ceiling, measured), "
    "milli-quantized error so gradient sums hold BIGINT to ~2.3e12 "
    "docs, truncating-division updates (engine-pair pinned). Output: "
    "the (round, weights, accuracy) training trajectory — accuracy "
    "0.76 base -> 0.97 at round 10 on the fixture. Scale shape "
    "(kmeans collect-per-round pattern, measured optimal r7): ONE "
    "text-parsing pass materialized by eager localCheckpoint (7 ints "
    "per doc — regex parsing is expensive COMPUTE, the r11 cache rule "
    "cuts the other way for cheap re-scans), one stats aggregate, "
    "then rounds+1 scan-agg jobs each collecting a 7-int gradient "
    "row; weights travel as literals, no driver-side data motion "
    "beyond 7 ints per round. Oracle: the identical integer chain "
    "unrolled as MATERIALIZED CTEs (bpe-chain generator pattern)",
    ("documents", "text", "quality", "analytics"),
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"]
    text = F.col("text")
    cc = text_ops.char_classes(text)
    chars = docs.select(
        "doc_id",
        cc["n_chars"].alias("n_chars"),
        cc["n_punct"].alias("n_punct"),
        cc["n_digit"].alias("n_digit"),
        (cc["n_chars"] - cc["n_space"]).alias("n_nonspace"),
    )
    wp = text_ops.word_profile(docs).select(
        "doc_id", "n_words", "n_distinct", "n_stop"
    )
    # left join: empty/whitespace-only docs have no word rows
    j = chars.join(wp, "doc_id", "left").select(
        "n_chars",
        "n_punct",
        "n_digit",
        "n_nonspace",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        F.coalesce("n_stop", F.lit(0)).cast("long").alias("n_stop"),
    )
    feats = j.select(
        F.expr("n_stop * 1000 div greatest(n_words, 1)").alias("f1"),
        F.expr("n_punct * 1000 div greatest(n_chars, 1)").alias("f2"),
        F.expr("n_digit * 1000 div greatest(n_chars, 1)").alias("f3"),
        F.expr("n_distinct * 1000 div greatest(n_words, 1)").alias("f4"),
        F.expr("least(n_words, 1000)").alias("f5"),
        F.expr(
            "CAST(CASE WHEN n_words >= 5 AND n_words <= 5000"
            " AND n_nonspace >= n_words * 2 AND n_nonspace <= n_words * 12"
            " AND n_stop >= 2"
            " AND n_punct * 10 <= n_chars * 3"
            " AND n_digit * 5 <= n_chars"
            " AND n_distinct * 10 >= n_words * 3"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("y"),
    ).localCheckpoint(eager=True)

    def tdiv(a: int, b: int) -> int:
        return abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)

    st = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n_"),
        *[F.sum(f"f{j_}").cast("long").alias(f"s{j_}") for j_ in range(1, 6)],
        *[
            F.sum(F.col(f"f{j_}") * F.col(f"f{j_}")).cast("long").alias(f"q{j_}")
            for j_ in range(1, 6)
        ],
    ).collect()[0]
    import math as _math

    n = int(st["n_"])
    means = [tdiv(int(st[f"s{j_}"]), n) for j_ in range(1, 6)]
    sds = [
        max(
            _math.floor(
                _math.sqrt(
                    max(tdiv(int(st[f"q{j_}"]), n) - tdiv(int(st[f"s{j_}"]), n) ** 2, 0)
                )
            ),
            1,
        )
        for j_ in range(1, 6)
    ]
    zf = feats.select(
        "y",
        *[
            F.expr(
                f"least(greatest((f{j_} - {means[j_ - 1]}) * 1000"
                f" div {sds[j_ - 1]}, -4000), 4000)"
            ).alias(f"z{j_}")
            for j_ in range(1, 6)
        ],
    )
    edges = _qc_sigmoid_edges()
    w = [0] * 6
    rows: list[tuple] = []
    for r in range(_QC_ROUNDS + 1):
        zsum = " + ".join(f"{w[j_]}L * z{j_}" for j_ in range(1, 6))
        scored = zf.select(
            "y",
            *[f"z{j_}" for j_ in range(1, 6)],
            F.expr(f"{w[0]}L * 1000 + {zsum}").alias("s"),
            F.lit(edges).alias("__e"),
        ).select(
            "y",
            *[f"z{j_}" for j_ in range(1, 6)],
            "s",
            F.expr("least(greatest(s div 1000, -16000), 15999)").alias("sm"),
            "__e",
        )
        em = (
            "(element_at(__e, CAST((sm + 16000) div 125 + 1 AS INT))"
            " + (element_at(__e, CAST((sm + 16000) div 125 + 2 AS INT))"
            "    - element_at(__e, CAST((sm + 16000) div 125 + 1 AS INT)))"
            "   * (sm + 16000 - 125 * ((sm + 16000) div 125)) div 125)"
            " div 1000 - 1000 * y"
        )
        g = (
            scored.select(
                F.expr(em).alias("em"),
                F.expr("CASE WHEN (s >= 0) = (y = 1) THEN 1 ELSE 0 END").alias("ok"),
                *[f"z{j_}" for j_ in range(1, 6)],
            )
            .agg(
                F.sum(F.expr("em * 1000")).cast("long").alias("g0"),
                *[
                    F.sum(F.expr(f"em * z{j_}")).cast("long").alias(f"g{j_}")
                    for j_ in range(1, 6)
                ],
                F.sum("ok").cast("long").alias("correct"),
            )
            .collect()[0]
        )
        rows.append(
            (r, *w, (int(g["correct"]) * 1_000_000 // max(n, 1)) / 1e6)
        )
        if r < _QC_ROUNDS:
            for j_ in range(6):
                w[j_] -= tdiv(_QC_ETA_NUM * tdiv(int(g[f"g{j_}"]), n), 1000)
    names = ("w_bias",) + _QC_FEATS
    schema = (
        "round long, "
        + ", ".join(f"{c} long" for c in names)
        + ", acc double"
    )
    return spark.createDataFrame(rows, schema)


@query(
    "cluster_prune_policy",
    """
    WITH q AS (
        SELECT vec_id AS id, label AS cell, i - 1 AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
        SELECT cell, pos, CAST(sum(xq) AS BIGINT) AS sx,
               CAST(count(*) AS BIGINT) AS n_
        FROM q GROUP BY cell, pos
    ),
    c2 AS (SELECT cell, pos, sx // n_ AS cq FROM cent),
    d AS (
        SELECT q.id, q.cell,
               CAST(sum((q.xq - c2.cq) * (q.xq - c2.cq)) AS BIGINT) AS sqd
        FROM q JOIN c2 ON c2.cell = q.cell AND c2.pos = q.pos
        GROUP BY q.id, q.cell
    ),
    cl AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(sqd) // count(*) AS BIGINT) AS mean_sqd
        FROM d GROUP BY cell
    ),
    cl2 AS (
        SELECT cell, n, mean_sqd,
               CASE WHEN mean_sqd < 500000 THEN 'collapse'
                    WHEN n > 50 THEN 'cap' ELSE 'keep' END AS verdict
        FROM cl
    ),
    ranked AS (
        SELECT id, cell,
               row_number() OVER (PARTITION BY cell
                   ORDER BY ('0x' || substr(md5('cp:' || CAST(id AS VARCHAR)),
                             1, 15))::BIGINT, id) AS hrk,
               row_number() OVER (PARTITION BY cell ORDER BY id) AS irk
        FROM d
    ),
    kept AS (
        SELECT r.cell, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(bit_xor(r.id) AS BIGINT) AS kept_xor
        FROM ranked r JOIN cl2 c ON c.cell = r.cell
        WHERE (c.verdict = 'collapse' AND r.irk = 1)
           OR (c.verdict = 'cap' AND r.hrk <= 50)
           OR c.verdict = 'keep'
        GROUP BY r.cell
    )
    SELECT CAST(c.cell AS BIGINT) AS cluster, c.n, c.mean_sqd, c.verdict,
           k.n_kept, k.kept_xor
    FROM cl2 c JOIN kept k ON k.cell = c.cell
    ORDER BY cluster
    """,
    "CLUSTER-LEVEL PRUNE POLICY (SSL-Prune / DataComp-style curation "
    "— score whole clusters and act on cluster STATISTICS: the "
    "curation layer above x51's vector-pair semantic dedup and xaf's "
    "per-cluster representative choice, both of which need a pair "
    "scan; this one needs none, so it is the first line of defense "
    "at 100 TB): milli-quantized components (the silhouette/DBSCAN "
    "integer space), per-cell exact integer centroid (trunc-div "
    "sums), per-vector exact squared distance, mean_sqd = one "
    "integer division per cluster; policy with declared literals — "
    "collapse near-dup farms (mean_sqd < 5e5) to their min-id "
    "representative, cap oversized clusters (n > 50) to a "
    "deterministic portable-hash downsample (x19 idiom), keep the "
    "rest; kept_xor = bit_xor of surviving ids (scale-safe "
    "membership checksum — id sums overflow on huge keep clusters, "
    "XOR never does; bit ops engine-pair pinned r11). Uniform-noise "
    "fixtures correctly fire NO collapse (honest null, replica- "
    "asserted); the collapse branch is pinned by a constructed- "
    "cluster unit test. Corpus-sized work: one posexplode + two "
    "keyed aggs, all row-linear",
    ("embeddings", "similarity", "dedup"),
)
def cluster_prune_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return sim_ops.cluster_prune(t["embeddings"], cap=50, dense_sqd=500_000)


@query(
    "hard_negative_mining",
    f"""
    WITH {_COSINE_SQL},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CASE WHEN c.label = q.label THEN 'pos' ELSE 'neg' END AS role,
               {_pair_sim_sql('q', 'c')} AS sim
        FROM normed q JOIN normed c ON q.vec_id < 20 AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id, role
                      ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, role, rank, neighbor_id, sim
    FROM ranked
    WHERE (role = 'pos' AND rank <= 3) OR (role = 'neg' AND rank <= 3)
    ORDER BY query_id, role, rank
    """,
    "CONTRASTIVE HARD-NEGATIVE MINING (the embedding-model "
    "training-data op — per anchor emit top same-cell POSITIVES and "
    "the most-similar other-cell HARD NEGATIVES, the confusables "
    "a contrastive loss actually learns from; completes the "
    "similarity family's TRAINING-DATA story next to x47 brute / "
    "xg1_ann_topk_ivf serving / x51-xf5 dedup curation): anchors = "
    "vec_id < 20 (a bounded mining batch — batches are how mining "
    "runs at 100 TB), ONE corpus scan against the broadcast anchor "
    "set, roles by cell equality, one (anchor, role)-partitioned "
    "top-k window, cosines round(6) (the pinned cross-engine "
    "compare); for unbounded anchors the docstring swaps the "
    "broadcast for the SRP-bucket blocker",
    ("embeddings", "similarity"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    return sim_ops.mine_contrastive_pairs(
        emb, emb.filter(F.col("vec_id") < 20), k_pos=3, k_neg=3
    )


_BLOOM_PRESENT_PROBES = ("join", "hash", "row", "batch", "scan", "customer")
_BLOOM_ABSENT_PROBES = ("blorptok", "qwxjkl", "snarfle", "vrumpt", "xqzzy", "zyzzyva")


@query(
    "bloom_membership_index",
    f"""
    WITH words AS (
        SELECT DISTINCT unnest(list_filter(
            regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS w
        FROM documents
    ),
    cells AS (
        SELECT (('0x' || substr(md5('bl:' || w), r.r * 6 + 1, 6))::BIGINT
                % 15872) AS pos
        FROM words, (SELECT unnest([0, 1, 2, 3]) AS r) r
    ),
    bloom AS (
        SELECT pos // 62 AS word_idx,
               CAST(bit_or(1::BIGINT << CAST(pos % 62 AS INT)) AS BIGINT) AS bits
        FROM cells GROUP BY pos // 62
    ),
    probes AS (
        SELECT unnest([{", ".join(repr(p) for p in _BLOOM_PRESENT_PROBES + _BLOOM_ABSENT_PROBES)}]) AS probe_key
    ),
    pcells AS (
        SELECT probe_key,
               (('0x' || substr(md5('bl:' || probe_key), r.r * 6 + 1, 6))::BIGINT
                % 15872) AS pos
        FROM probes, (SELECT unnest([0, 1, 2, 3]) AS r) r
    ),
    hits AS (
        SELECT p.probe_key,
               CASE WHEN (COALESCE(b.bits, 0) & (1::BIGINT << CAST(p.pos % 62 AS INT)))
                         != 0 THEN 1 ELSE 0 END AS hit
        FROM pcells p LEFT JOIN bloom b ON b.word_idx = p.pos // 62
    ),
    verdicts AS (
        SELECT probe_key, CAST(sum(hit) AS BIGINT) AS n_bits_set,
               sum(hit) = 4 AS bloom_says
        FROM hits GROUP BY probe_key
    )
    SELECT v.probe_key, v.n_bits_set, v.bloom_says,
           (w.w IS NOT NULL) AS actually_present,
           (v.bloom_says AND w.w IS NULL) AS is_false_positive
    FROM verdicts v LEFT JOIN words w ON w.w = v.probe_key
    ORDER BY v.probe_key
    """,
    "MERGEABLE BLOOM MEMBERSHIP INDEX (Bloom 1970 — completes the "
    "sketch family's MEMBERSHIP axis next to cms counts, x44 HLL "
    "cardinality and x45 heavy hitters; Spark's own bloom_filter_agg "
    "is internal-only in 4.1, so the engine-portable form is 256 "
    "BIGINT words of 62 usable bits built by ONE bit_or aggregation "
    "— bits 62/63 stay clear so every stored word is a plain "
    "positive BIGINT on both engines; two shard indexes merge by "
    "word-wise bit_or, the property that makes a Bloom the "
    "corpus-side seen-before structure for incremental dedup / URL "
    "dedup / cross-shard decontamination where the eval-set "
    "broadcast of decontaminate_evals does not apply): K=4 hashes as "
    "independent 6-hex slices of ONE md5 per key (the "
    "xfp_cms_sketch_probe single-digest idiom), 12 declared probes (6 "
    "corpus words + 6 absent nonsense words) each report bits set, "
    "the maybe-present verdict (all 4 set; any clear bit PROVES "
    "absence) and exact membership for the false-positive readout. "
    "The 31-word saturated fixture vocabulary fills 124/15872 bits "
    "-> zero false positives is the honest null (replica-asserted); "
    "the FP path is pinned by a constructed tiny-index unit test. "
    "Shifts/bit_or/& engine-pair pinned on adversarial literals",
    ("documents", "dedup", "text"),
)
def bloom_membership_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import decontam as decontam_ops

    t = _t(spark, sf_dir)
    words = (
        t["documents"]
        .select(
            F.explode(
                F.array_remove(F.split(F.trim(F.col("text")), r"\s+"), "")
            ).alias("w")
        )
        .distinct()
    )
    bloom = decontam_ops.bloom_build(words, key_col="w", n_words=256, seed="bl")
    probes = spark.createDataFrame(
        [(p,) for p in _BLOOM_PRESENT_PROBES + _BLOOM_ABSENT_PROBES], "probe_key string"
    )
    probed = decontam_ops.bloom_probe(
        bloom, probes, key_col="probe_key", n_words=256, seed="bl"
    )
    return (
        probed.join(
            words.select(F.col("w").alias("probe_key"), F.lit(1).alias("__m")),
            "probe_key",
            "left",
        )
        .select(
            "probe_key",
            "n_bits_set",
            "bloom_says",
            F.col("__m").isNotNull().alias("actually_present"),
            (F.col("bloom_says") & F.col("__m").isNull()).alias("is_false_positive"),
        )
        .orderBy("probe_key")
    )


@query(
    "temperature_mixture",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS n_tokens
        FROM documents
    ),
    totals AS (
        SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM toks GROUP BY lang
    ),
    weights AS (
        SELECT lang, lang_tokens, n_docs,
               CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE))) AS BIGINT) AS w_q
        FROM totals
    ),
    seats AS (
        SELECT w.lang, w.lang_tokens, w.n_docs, w.w_q,
               (200 * w.w_q) // s.w_all AS base,
               (200 * w.w_q) % s.w_all AS rem
        FROM weights w LEFT JOIN (SELECT CAST(sum(w_q) AS BIGINT) AS w_all
                                  FROM weights) s ON true
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY rem DESC, lang) AS rrk,
               CAST(200 - sum(base) OVER () AS BIGINT) AS leftover
        FROM seats
    ),
    quota AS (
        SELECT lang, lang_tokens, n_docs, w_q,
               base + CASE WHEN rrk <= leftover THEN 1 ELSE 0 END AS quota
        FROM ranked
    ),
    srk AS (
        SELECT t.doc_id, t.lang,
               row_number() OVER (PARTITION BY t.lang
                   ORDER BY ('0x' || substr(md5('tmx:' || CAST(t.doc_id AS VARCHAR)),
                             1, 15))::BIGINT, t.doc_id) AS hrk
        FROM toks t
    ),
    sel AS (
        SELECT s.lang, CAST(count(*) AS BIGINT) AS n_selected,
               CAST(bit_xor(s.doc_id) AS BIGINT) AS selected_xor
        FROM srk s JOIN quota q ON q.lang = s.lang
        WHERE s.hrk <= q.quota
        GROUP BY s.lang
    )
    SELECT q.lang, q.lang_tokens, q.n_docs, q.w_q, CAST(q.quota AS BIGINT) AS quota,
           COALESCE(l.n_selected, 0) AS n_selected,
           COALESCE(l.selected_xor, 0) AS selected_xor
    FROM quota q LEFT JOIN sel l ON l.lang = q.lang
    ORDER BY q.lang
    """,
    "TEMPERATURE-SCALED MIXTURE SAMPLING (the mT5 / XLM-R alpha-"
    "sampling data-mixture op: quotas proportional to corpus-token "
    "counts raised to alpha = 1/2, boosting low-resource languages "
    "against head domination — the DERIVED-weight counterpart to "
    "xdt's declared-literal target proportions, exactly as xej's "
    "Neyman allocation derives where xd1's Hamilton declares): "
    "per-language exact token totals, temperature weight w = "
    "floor(sqrt(tokens)) (sqrt of an exact BIGINT is engine-"
    "identical IEEE — the xej milli-sqrt seam family), a declared "
    "200-doc budget apportioned by Hamilton largest remainder over "
    "the w's (exact integers, (remainder DESC, lang) deterministic "
    "tie-break — allocations sum to exactly 200), then per-language "
    "deterministic portable-hash sampling to the quota; selected_xor "
    "= bit_xor of chosen doc_ids pins WHICH docs were sampled, not "
    "just how many. Scale shape: one corpus scan for token counts, "
    "language-bounded lattice work, one hash-rank window per "
    "language partition; all integer end-to-end",
    ("documents", "text", "analytics"),
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        "lang",
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    totals = toks.groupBy("lang").agg(
        F.sum("n_tokens").cast("long").alias("lang_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    weights = totals.select(
        "lang",
        "lang_tokens",
        "n_docs",
        F.expr("CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE))) AS BIGINT)").alias(
            "w_q"
        ),
    )
    wsum = weights.agg(F.sum("w_q").cast("long").alias("w_all"))
    seats = weights.join(F.broadcast(wsum), how="left").select(
        "lang",
        "lang_tokens",
        "n_docs",
        "w_q",
        F.expr("(200 * w_q) div w_all").alias("base"),
        F.expr("(200 * w_q) % w_all").alias("rem"),
    )
    ranked = seats.select(
        "*",
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("rem").desc(), "lang"))
        .alias("rrk"),
        (F.lit(200) - F.sum("base").over(W.partitionBy())).cast("long").alias(
            "leftover"
        ),
    )
    quota = ranked.select(
        "lang",
        "lang_tokens",
        "n_docs",
        "w_q",
        (
            F.col("base")
            + F.when(F.col("rrk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
    srk = toks.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                dedup_ops.portable_hash(F.col("doc_id").cast("string"), F.lit("tmx")),
                "doc_id",
            )
        )
        .alias("hrk"),
    )
    sel = (
        srk.join(F.broadcast(quota.select("lang", "quota")), "lang")
        .filter(F.col("hrk") <= F.col("quota"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.expr("bit_xor(doc_id)").cast("long").alias("selected_xor"),
        )
    )
    return (
        quota.join(sel, "lang", "left")
        .select(
            "lang",
            "lang_tokens",
            "n_docs",
            "w_q",
            "quota",
            F.coalesce("n_selected", F.lit(0)).cast("long").alias("n_selected"),
            F.coalesce("selected_xor", F.lit(0)).cast("long").alias("selected_xor"),
        )
        .orderBy("lang")
    )


def _bh_pvalue_table() -> list[int]:
    """641 two-sided normal p-value samples at z^2 = 0.0, 0.1, ... 64.0
    in nano-units: floor(erfc(sqrt(z2/2)) * 1e9). The literal-table
    idiom on its third transcendental (sprt ln steps, quality_classifier
    sigmoid, now the normal tail): both engines interpolate the same
    list in integer arithmetic, nobody calls erfc. Monotone decreasing;
    formula-pinned."""
    import math

    return [
        math.floor(math.erfc(math.sqrt(k / 10 / 2)) * 1_000_000_000)
        for k in range(641)
    ]


@query(
    "bh_fdr_control",
    f"""
    WITH cell AS (
        SELECT n.n_name AS nation,
               CAST(count(*) AS BIGINT) AS n_i,
               CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x_i
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    ),
    tot AS (
        SELECT *, CAST(sum(n_i) OVER () AS BIGINT) AS n_all,
               CAST(sum(x_i) OVER () AS BIGINT) AS x_all,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM cell
    ),
    z AS (
        SELECT nation, n_i, x_i, m,
               CAST(CASE WHEN x_all = 0 OR x_all = n_all THEN 0
                    ELSE CAST(floor(
                        (CAST(x_i * n_all - n_i * x_all AS DOUBLE)
                         * (x_i * n_all - n_i * x_all))
                        / (CAST(n_i AS DOUBLE) * x_all * (n_all - x_all))
                        * 1000000) AS BIGINT) END AS BIGINT) AS z2_q
        FROM tot
    ),
    tab AS (SELECT {_bh_pvalue_table()} AS t),
    p AS (
        SELECT nation, n_i, x_i, m,
               z2_q,
               t[b + 1] - ((t[b + 1] - t[b + 2]) * (z2c - b * 100000)) // 100000
                   AS p_q
        FROM (
            SELECT *, least(z2_q, 63999999) AS z2c,
                   CAST(least(z2_q, 63999999) // 100000 AS INT) AS b
            FROM z LEFT JOIN tab ON true
        )
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY p_q, nation) AS bh_rank
        FROM p
    ),
    kstar AS (
        SELECT *,
               COALESCE(max(CASE WHEN p_q * m * 10 <= bh_rank * 1000000000
                            THEN bh_rank END) OVER (), 0) AS bh_kstar
        FROM ranked
    )
    SELECT nation, n_i, x_i, z2_q, CAST(p_q AS BIGINT) / 1e9 AS p_value,
           CAST(bh_rank AS BIGINT) AS bh_rank,
           (p_q <= 50000000) AS naive_rejected,
           (bh_rank <= bh_kstar) AS bh_rejected
    FROM kstar
    ORDER BY nation
    """,
    "BENJAMINI-HOCHBERG FDR CONTROL (Benjamini & Hochberg 1995 — the "
    "MULTIPLE-TESTING member completing the experimentation family: "
    "x73 tests one readout, sprt_ab stops one test early, xed/xek "
    "test one association; a metrics platform fires DOZENS of "
    "hypotheses per day and must control the false-discovery rate "
    "across them): per-nation one-sample binomial z-test of the "
    "URGENT-order rate against the global rate — z^2 = (x*N - n*X)^2 "
    "/ (n*X*(N-X)) as ONE fixed-order double expression over exact "
    "BIGINTs floor-quantized at 1e-6 (the xed idiom: identical "
    "integer inputs -> identical IEEE doubles -> identical floor on "
    "both engines), two-sided p-value via a 641-entry literal "
    "erfc table over z^2 in [0, 64] with integer linear "
    "interpolation (the quality_classifier idiom — no engine calls "
    "erfc), then the BH step-up: rank p ascending under a unique "
    "order, k* = max rank with p_(k) <= k*q/m as a pure integer "
    "cross-multiplication at q = 0.10, reject ranks <= k*. The "
    "fixture's uniform priorities are the HONEST NULL: naive p<0.05 "
    "flags ~2 nations, BH correctly rejects ZERO (replica-asserted "
    "— the correction visibly working); the rejection path is "
    "pinned by a constructed-p unit test on analytics.bh_select. "
    "Degenerate global rates (x_all = 0 or x_all = n_all — no or all "
    "URGENT orders) CASE-guard z^2 to 0 identically on both sides "
    "(the x73 rule: total function on ANY fixture, never an "
    "engine-divergent Inf/NaN). "
    "Scale shape: one orders scan -> nation-bounded lattice; the "
    "unpartitioned windows ride the 25-row hypothesis frame",
    ("orders", "customer", "nation", "analytics"),
)
def bh_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators import analytics as an_ops

    t = _t(spark, sf_dir)
    cell = (
        t["orders"]
        .select("o_custkey", "o_orderpriority")
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            t["nation"].select("n_nationkey", "n_name"),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("x_i"),
        )
    )
    tot = cell.select(
        "*",
        F.sum("n_i").over(W.partitionBy()).cast("long").alias("n_all"),
        F.sum("x_i").over(W.partitionBy()).cast("long").alias("x_all"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("long").alias("m"),
    )
    z = tot.select(
        "nation",
        "n_i",
        "x_i",
        "m",
        F.expr(
            "CAST(CASE WHEN x_all = 0 OR x_all = n_all THEN 0"
            " ELSE CAST(floor("
            " (CAST(x_i * n_all - n_i * x_all AS DOUBLE)"
            "  * (x_i * n_all - n_i * x_all))"
            " / (CAST(n_i AS DOUBLE) * x_all * (n_all - x_all))"
            " * 1000000) AS BIGINT) END AS BIGINT)"
        ).alias("z2_q"),
    )
    tab = _bh_pvalue_table()
    p = z.select(
        "nation",
        "n_i",
        "x_i",
        "m",
        "z2_q",
        F.expr("least(z2_q, 63999999)").alias("z2c"),
        F.lit(tab).alias("__t"),
    ).select(
        "nation",
        "n_i",
        "x_i",
        "m",
        "z2_q",
        F.expr(
            "element_at(__t, CAST(z2c div 100000 AS INT) + 1)"
            " - ((element_at(__t, CAST(z2c div 100000 AS INT) + 1)"
            "     - element_at(__t, CAST(z2c div 100000 AS INT) + 2))"
            "    * (z2c - (z2c div 100000) * 100000)) div 100000"
        ).alias("p_q"),
    )
    out = an_ops.bh_select(p, p_col="p_q", key_cols=("nation",), q_num=1, q_den=10)
    return out.select(
        "nation",
        "n_i",
        "x_i",
        "z2_q",
        (F.col("p_q").cast("long") / 1e9).alias("p_value"),
        F.col("bh_rank").cast("long").alias("bh_rank"),
        (F.col("p_q") <= 50_000_000).alias("naive_rejected"),
        "bh_rejected",
    ).orderBy("nation")


@query(
    "did_readout",
    f"""
    WITH ev AS (
        SELECT user_id, event_type, value,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i
        FROM events
    ),
    days AS (SELECT (min(day_i) + max(day_i)) // 2 AS mid FROM ev),
    u AS (
        SELECT e.user_id,
               CASE WHEN ('0x' || substr(md5('did:' || e.user_id), 1, 15))::BIGINT
                         % 2 = 0
                    THEN 'treat' ELSE 'control' END AS arm,
               CASE WHEN e.day_i > d.mid THEN 'post' ELSE 'pre' END AS period,
               CAST(sum(CASE WHEN e.event_type = 'purchase'
                        THEN CAST(round(e.value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS cents
        FROM ev e LEFT JOIN days d ON true
        GROUP BY 1, 2, 3
    ),
    cells AS (
        SELECT CAST(sum(CASE WHEN arm = 'treat' AND period = 'post' THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
               CAST(sum(CASE WHEN arm = 'treat' AND period = 'post' THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
               CAST(sum(CASE WHEN arm = 'treat' AND period = 'post' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_tp,
               CAST(sum(CASE WHEN arm = 'treat' AND period = 'pre' THEN 1 ELSE 0 END) AS BIGINT) AS n_tq,
               CAST(sum(CASE WHEN arm = 'treat' AND period = 'pre' THEN cents ELSE 0 END) AS BIGINT) AS s_tq,
               CAST(sum(CASE WHEN arm = 'treat' AND period = 'pre' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_tq,
               CAST(sum(CASE WHEN arm = 'control' AND period = 'post' THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
               CAST(sum(CASE WHEN arm = 'control' AND period = 'post' THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
               CAST(sum(CASE WHEN arm = 'control' AND period = 'post' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_cp,
               CAST(sum(CASE WHEN arm = 'control' AND period = 'pre' THEN 1 ELSE 0 END) AS BIGINT) AS n_cq,
               CAST(sum(CASE WHEN arm = 'control' AND period = 'pre' THEN cents ELSE 0 END) AS BIGINT) AS s_cq,
               CAST(sum(CASE WHEN arm = 'control' AND period = 'pre' THEN cents * cents ELSE 0 END) AS BIGINT) AS q_cq
        FROM u
    ),
    est AS (
        SELECT *,
               CAST(CASE WHEN n_tp = 0 OR n_tq = 0 OR n_cp = 0 OR n_cq = 0 THEN 0
                    ELSE CAST(floor(
                   (CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tq AS DOUBLE) / n_tq
                    - CAST(s_cp AS DOUBLE) / n_cp + CAST(s_cq AS DOUBLE) / n_cq)
                   * 1000) AS BIGINT) END AS BIGINT) AS did_mc,
               CAST(CASE WHEN n_tp = 0 OR n_tq = 0 OR n_cp = 0 OR n_cq = 0 THEN 0
                    WHEN ((CAST(q_tp AS DOUBLE) / n_tp - (CAST(s_tp AS DOUBLE) / n_tp) * (CAST(s_tp AS DOUBLE) / n_tp)) / n_tp
                      + (CAST(q_tq AS DOUBLE) / n_tq - (CAST(s_tq AS DOUBLE) / n_tq) * (CAST(s_tq AS DOUBLE) / n_tq)) / n_tq
                      + (CAST(q_cp AS DOUBLE) / n_cp - (CAST(s_cp AS DOUBLE) / n_cp) * (CAST(s_cp AS DOUBLE) / n_cp)) / n_cp
                      + (CAST(q_cq AS DOUBLE) / n_cq - (CAST(s_cq AS DOUBLE) / n_cq) * (CAST(s_cq AS DOUBLE) / n_cq)) / n_cq) <= 0 THEN 0
                    ELSE CAST(floor(
                   ((CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tq AS DOUBLE) / n_tq
                     - CAST(s_cp AS DOUBLE) / n_cp + CAST(s_cq AS DOUBLE) / n_cq)
                    * (CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tq AS DOUBLE) / n_tq
                       - CAST(s_cp AS DOUBLE) / n_cp + CAST(s_cq AS DOUBLE) / n_cq))
                   / ((CAST(q_tp AS DOUBLE) / n_tp - (CAST(s_tp AS DOUBLE) / n_tp) * (CAST(s_tp AS DOUBLE) / n_tp)) / n_tp
                      + (CAST(q_tq AS DOUBLE) / n_tq - (CAST(s_tq AS DOUBLE) / n_tq) * (CAST(s_tq AS DOUBLE) / n_tq)) / n_tq
                      + (CAST(q_cp AS DOUBLE) / n_cp - (CAST(s_cp AS DOUBLE) / n_cp) * (CAST(s_cp AS DOUBLE) / n_cp)) / n_cp
                      + (CAST(q_cq AS DOUBLE) / n_cq - (CAST(s_cq AS DOUBLE) / n_cq) * (CAST(s_cq AS DOUBLE) / n_cq)) / n_cq)
                   * 1000000) AS BIGINT) END AS BIGINT) AS z2_q
        FROM cells
    ),
    tab AS (SELECT {_bh_pvalue_table()} AS t),
    p AS (
        SELECT est.*,
               t[b + 1] - ((t[b + 1] - t[b + 2]) * (z2c - b * 100000)) // 100000
                   AS p_q
        FROM (
            SELECT *, least(z2_q, 63999999) AS z2c,
                   CAST(least(z2_q, 63999999) // 100000 AS INT) AS b
            FROM est LEFT JOIN tab ON true
        ) est
    )
    SELECT n_tp, n_tq, n_cp, n_cq,
           CAST(did_mc AS BIGINT) / 100000.0 AS did_dollars,
           CAST(z2_q AS BIGINT) AS z2_q,
           CASE WHEN did_mc < 0 THEN -1 ELSE 1 END * CAST(p_q AS BIGINT) / 1e9
               AS signed_p,
           (p_q <= 50000000) AS significant
    FROM p
    """,
    "DIFFERENCE-IN-DIFFERENCES READOUT (Card & Krueger 1994 shape — "
    "the OBSERVATIONAL-causal member completing the experimentation "
    "family: x73 randomized A/B, xdd CUPED variance reduction, "
    "xfc multiple-testing; DiD is what ships when assignment is a "
    "rollout, not a coin flip): user-period panel of exact purchase "
    "cents (integer day index, tz-free; period = above/below the "
    "data's own midpoint day via a broadcast one-row fold; arm = "
    "deterministic hash), 2x2 cell moments as exact BIGINTs in ONE "
    "12-counter aggregate, interaction estimate and unpooled z^2 = "
    "did^2 / sum(var_cell/n_cell) each as ONE fixed-order double "
    "expression over the identical integers floor-quantized (x37/xed "
    "idiom), two-sided p via the shared 641-entry literal erfc table "
    "(xfc), significance an integer compare at 0.05. Sign carried "
    "separately from the p magnitude (r6 magnitude+sign rule). "
    "Honest null: random hash arms on organic data -> |z| ~ 1.1, "
    "not significant (replica-asserted); the mechanism's arithmetic "
    "is pinned by the replica re-deriving everything from raw "
    "events. Degenerate panels (any empty 2x2 cell, or zero pooled "
    "variance incl. tiny-negative float cancellation) CASE-guard "
    "did_mc/z2_q to 0 identically on both sides (x73 rule — total "
    "function; an unguarded zero variance could even drive z2_q "
    "NEGATIVE and index the erfc table out of range). "
    "Headroom: cents^2 sums hold BIGINT to ~9e8 user-periods "
    "at $1k spends (pre-scale to dollars beyond). One events scan + "
    "one user-keyed agg + a 12-counter combine — scan-speed at any "
    "corpus size",
    ("events", "analytics"),
)
def did_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        "event_type",
        "value",
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
        .cast("long")
        .alias("day_i"),
    )
    days = ev.agg(
        F.expr("CAST((min(day_i) + max(day_i)) div 2 AS BIGINT)").alias("mid")
    )
    arm = F.when(
        F.pmod(dedup_ops.portable_hash(F.col("user_id"), F.lit("did")), F.lit(2))
        == 0,
        "treat",
    ).otherwise("control")
    u = (
        ev.join(F.broadcast(days), how="left")
        .select(
            "user_id",
            arm.alias("arm"),
            F.when(F.col("day_i") > F.col("mid"), "post").otherwise("pre").alias(
                "period"
            ),
            F.expr(
                "CASE WHEN event_type = 'purchase'"
                " THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END"
            ).alias("__c"),
        )
        .groupBy("user_id", "arm", "period")
        .agg(F.sum("__c").cast("long").alias("cents"))
    )
    cell_aggs = []
    for a, tag in (("treat", "t"), ("control", "c")):
        for per, tag2 in (("post", "p"), ("pre", "q")):
            cond = (F.col("arm") == a) & (F.col("period") == per)
            cell_aggs += [
                F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{tag}{tag2}"),
                F.sum(F.when(cond, F.col("cents")).otherwise(0))
                .cast("long")
                .alias(f"s_{tag}{tag2}"),
                F.sum(F.when(cond, F.col("cents") * F.col("cents")).otherwise(0))
                .cast("long")
                .alias(f"q_{tag}{tag2}"),
            ]
    cells = u.agg(*cell_aggs)
    did_expr = (
        "(CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tq AS DOUBLE) / n_tq"
        " - CAST(s_cp AS DOUBLE) / n_cp + CAST(s_cq AS DOUBLE) / n_cq)"
    )
    var_expr = (
        "((CAST(q_tp AS DOUBLE) / n_tp - (CAST(s_tp AS DOUBLE) / n_tp) * (CAST(s_tp AS DOUBLE) / n_tp)) / n_tp"
        " + (CAST(q_tq AS DOUBLE) / n_tq - (CAST(s_tq AS DOUBLE) / n_tq) * (CAST(s_tq AS DOUBLE) / n_tq)) / n_tq"
        " + (CAST(q_cp AS DOUBLE) / n_cp - (CAST(s_cp AS DOUBLE) / n_cp) * (CAST(s_cp AS DOUBLE) / n_cp)) / n_cp"
        " + (CAST(q_cq AS DOUBLE) / n_cq - (CAST(s_cq AS DOUBLE) / n_cq) * (CAST(s_cq AS DOUBLE) / n_cq)) / n_cq)"
    )
    zero_cell = "(n_tp = 0 OR n_tq = 0 OR n_cp = 0 OR n_cq = 0)"
    est = cells.select(
        "*",
        F.expr(
            f"CAST(CASE WHEN {zero_cell} THEN 0"
            f" ELSE CAST(floor({did_expr} * 1000) AS BIGINT) END AS BIGINT)"
        ).alias("did_mc"),
        F.expr(
            f"CAST(CASE WHEN {zero_cell} THEN 0"
            f" WHEN {var_expr} <= 0 THEN 0"
            f" ELSE CAST(floor(({did_expr} * {did_expr}) / {var_expr} * 1000000)"
            " AS BIGINT) END AS BIGINT)"
        ).alias("z2_q"),
    )
    tab = _bh_pvalue_table()
    p = est.select(
        "*",
        F.expr("least(z2_q, 63999999)").alias("z2c"),
        F.lit(tab).alias("__t"),
    ).select(
        "*",
        F.expr(
            "element_at(__t, CAST(z2c div 100000 AS INT) + 1)"
            " - ((element_at(__t, CAST(z2c div 100000 AS INT) + 1)"
            "     - element_at(__t, CAST(z2c div 100000 AS INT) + 2))"
            "    * (z2c - (z2c div 100000) * 100000)) div 100000"
        ).alias("p_q"),
    )
    return p.select(
        "n_tp",
        "n_tq",
        "n_cp",
        "n_cq",
        (F.col("did_mc").cast("long") / 100000.0).alias("did_dollars"),
        F.col("z2_q").cast("long").alias("z2_q"),
        (
            F.when(F.col("did_mc") < 0, -1).otherwise(1)
            * F.col("p_q").cast("long")
            / 1e9
        ).alias("signed_p"),
        (F.col("p_q") <= 50_000_000).alias("significant"),
    )


@query(
    "jackknife_se",
    """
    WITH d AS (
        SELECT len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS nw,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> list_contains(['the','a','of','and','in','to','is'],
                                      lower(x)))) AS ns
        FROM documents
    ),
    tot AS (
        SELECT CAST(sum(nw) AS BIGINT) AS n_all,
               CAST(sum(ns) AS BIGINT) AS s_all,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM d
    ),
    tq AS (
        SELECT CAST(floor(CAST(t.s_all - d.ns AS DOUBLE)
                          / greatest(t.n_all - d.nw, 1) * 1000000000)
                    AS BIGINT) AS tq
        FROM d LEFT JOIN tot t ON true
    ),
    m AS (
        SELECT CAST(sum(tq) AS BIGINT) // CAST(count(*) AS BIGINT) AS mq
        FROM tq
    ),
    ssd AS (
        SELECT CAST(sum((tq - mq) * (tq - mq)) AS BIGINT) AS ssd
        FROM tq LEFT JOIN m ON true
    )
    SELECT t.n_docs,
           CAST(t.s_all * 1000000 // t.n_all AS BIGINT) / 1e6 AS theta,
           sqrt(CAST((t.n_docs - 1) * s.ssd AS DOUBLE) / t.n_docs)
               / 1000000000 AS jk_se,
           CAST(s.ssd AS BIGINT) AS ssd_q
    FROM tot t LEFT JOIN ssd s ON true
    """,
    "DELETE-ONE JACKKNIFE STANDARD ERROR (Quenouille/Tukey — the "
    "closed-form resampling member next to xds's Poisson bootstrap: "
    "the bootstrap resamples with RNG-derived weights, the jackknife "
    "needs NO randomness because every leave-one-out replicate of a "
    "RATIO statistic is computable from the totals by algebra — "
    "theta_(-i) = (S - s_i)/(N - n_i) — so the all-replicates pass "
    "is ONE corpus scan at any scale, the property that makes "
    "jackknife THE production SE for ratio metrics): statistic = "
    "corpus stopword rate S/N over documents; per-doc replicate "
    "floor-quantized at 1e-9 from ONE double division of exact "
    "BIGINTs (identical inputs -> identical IEEE doubles both "
    "engines, x37 reasoning — no libm in sight, no boundary "
    "contract needed), centered by the integer mean (trunc-div), "
    "SSD as exact integer sum of squared nano-deviations (two-pass "
    "centered form — the one-pass moment form sum(tq^2) would "
    "overflow BIGINT at fixture scale; deviations are self-limiting "
    "~s_i/N so the centered sum SHRINKS as the corpus grows), "
    "SE = sqrt((n-1) ssd / n)/1e9 — sqrt of identical doubles. "
    "theta via the pinned count-ratio quantization. Scale shape: "
    "one text scan + a broadcast one-row totals fold + one centered "
    "aggregate; python replica re-derives everything",
    ("documents", "text", "analytics"),
)
def jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    stop_arr = F.array(*[F.lit(s) for s in text_ops.STOPWORDS])
    d = t["documents"].select(
        F.size(words).cast("long").alias("nw"),
        F.size(
            F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))
        )
        .cast("long")
        .alias("ns"),
    )
    tot = d.agg(
        F.sum("nw").cast("long").alias("n_all"),
        F.sum("ns").cast("long").alias("s_all"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    tq = d.join(F.broadcast(tot), how="left").select(
        F.expr(
            "CAST(floor(CAST(s_all - ns AS DOUBLE)"
            " / greatest(n_all - nw, 1) * 1000000000) AS BIGINT)"
        ).alias("tq")
    )
    m = tq.agg(
        F.expr(
            "CAST(sum(tq) AS BIGINT) div CAST(count(1) AS BIGINT)"
        ).alias("mq")
    )
    ssd = (
        tq.join(F.broadcast(m), how="left")
        .agg(
            F.sum((F.col("tq") - F.col("mq")) * (F.col("tq") - F.col("mq")))
            .cast("long")
            .alias("ssd")
        )
    )
    return tot.join(F.broadcast(ssd), how="left").select(
        "n_docs",
        F.expr("CAST(s_all * 1000000 div n_all AS BIGINT) / 1e6").alias("theta"),
        F.expr(
            "sqrt(CAST((n_docs - 1) * ssd AS DOUBLE) / n_docs) / 1000000000"
        ).alias("jk_se"),
        F.col("ssd").cast("long").alias("ssd_q"),
    )


@query(
    "capture_recapture",
    f"""
    WITH {_SHINGLE_SQL},
    {_minhash_cand_sql()},
    {_JACCARD_CTES},
    pop AS (
        -- mirrors minhash_near_dup's own verify form EXACTLY
        -- (round(ratio, 6) >= 0.8, the engine-pair-safe count-ratio
        -- round — NOT the cross-mult form other queries use: a
        -- different-but-equivalent formulation here would be the xb6
        -- fixture-luck class)
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON sa.doc = i.doc_a
        JOIN sizes sb ON sb.doc = i.doc_b
        WHERE round(i.c / (sa.n + sb.n - i.c), 6) >= 0.8
    ),
    caught AS (
        SELECT doc_a, doc_b,
               ('0x' || substr(md5('cra:' || doc_a || ':' || doc_b), 1, 15))::BIGINT
                   % 2 = 0 AS in_a,
               ('0x' || substr(md5('crb:' || doc_a || ':' || doc_b), 1, 15))::BIGINT
                   % 2 = 0 AS in_b
        FROM pop
    ),
    counts AS (
        SELECT CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_both
        FROM caught
    )
    SELECT n_a, n_b, n_both, n_true,
           ((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1 AS n_hat_chapman,
           CAST(CASE WHEN ((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1 = 0 THEN 0
                ELSE n_a * 1000000
                     // (((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1) END
                AS BIGINT) / 1e6 AS coverage_a,
           CAST(floor(sqrt(
               CAST((n_a + 1) * (n_b + 1) AS DOUBLE)
               * (n_a - n_both) * (n_b - n_both)
               / (CAST(n_both + 1 AS DOUBLE) * (n_both + 1) * (n_both + 2))
           )) AS BIGINT) AS se_chapman,
           abs(((n_a + 1) * (n_b + 1)) // (n_both + 1) - 1 - n_true)
               <= 2 * CAST(floor(sqrt(
                   CAST((n_a + 1) * (n_b + 1) AS DOUBLE)
                   * (n_a - n_both) * (n_b - n_both)
                   / (CAST(n_both + 1 AS DOUBLE) * (n_both + 1) * (n_both + 2))
               )) AS BIGINT) + 1 AS estimate_within_2se
    FROM counts
    """,
    "CAPTURE-RECAPTURE POPULATION ESTIMATE (Lincoln-Petersen via the "
    "Chapman 1951 bias-corrected form — the mark-recapture estimator "
    "as corpus QA: when near-dup VERIFICATION is budgeted, two "
    "independently-sampled verification passes over the same "
    "candidate population estimate the FULL verified-dup count "
    "without ever verifying everything — 'how many dup pairs exist' "
    "from two cheap half-passes, the wildlife-census trick applied "
    "to data curation): population = LSH candidates passing the "
    "exact-Jaccard 0.8 verify (round-6 count-ratio form, mirroring "
    "minhash_near_dup's own filter EXACTLY — a different-but-"
    "equivalent cross-mult here would be the xb6 fixture-luck class), "
    "capture A/B = two INDEPENDENT deterministic hash samples of the "
    "verification budget (portable md5, 50% each — the capture "
    "process is the sampling, stated plainly; classic LP instead "
    "assumes two independent DETECTORS, whose catchability varies "
    "with pair similarity — heterogeneous-catchability bias the "
    "sampled-verification framing avoids), Chapman N-hat = "
    "(n_a+1)(n_b+1) div (n_both+1) - 1 in exact integers, coverage "
    "as the pinned count-ratio quantization. Fixture luxury: n_true "
    "is computable exactly (25 pairs at sf0.01), so the output "
    "carries the Chapman SE (one fixed double expression over the "
    "exact counters, Seber 1982 form) and a within-2-SE sanity flag "
    "that stays honest at every scale (an absolute band would fail "
    "as SE grows ~sqrt(N) — measured: SE 5 at sf0.01, 47 at 10x); "
    "python replica re-derives capture sets and "
    "estimator. Scale: rides the existing LSH candidate machinery, "
    "plus one 4-counter aggregate",
    ("documents", "dedup", "analytics"),
)
def capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    pop = dedup_ops.minhash_near_dup(
        t["documents"], shingle_n=3, num_hashes=16, rows_per_band=2, threshold=0.8
    ).select("doc_a", "doc_b")
    key = F.concat(
        F.col("doc_a").cast("string"), F.lit(":"), F.col("doc_b").cast("string")
    )
    caught = pop.select(
        (F.pmod(dedup_ops.portable_hash(key, F.lit("cra")), F.lit(2)) == 0).alias(
            "in_a"
        ),
        (F.pmod(dedup_ops.portable_hash(key, F.lit("crb")), F.lit(2)) == 0).alias(
            "in_b"
        ),
    )
    counts = caught.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_both"),
    )
    chapman = "((n_a + 1) * (n_b + 1)) div (n_both + 1) - 1"
    return counts.select(
        "n_a",
        "n_b",
        "n_both",
        "n_true",
        F.expr(chapman).cast("long").alias("n_hat_chapman"),
        F.expr(
            f"CAST(CASE WHEN {chapman} = 0 THEN 0"
            f" ELSE n_a * 1000000 div ({chapman}) END AS BIGINT) / 1e6"
        ).alias("coverage_a"),
        F.expr("CAST(floor(sqrt(CAST((n_a + 1) * (n_b + 1) AS DOUBLE) * (n_a - n_both) * (n_b - n_both) / (CAST(n_both + 1 AS DOUBLE) * (n_both + 1) * (n_both + 2)))) AS BIGINT)").alias("se_chapman"),
        F.expr(f"abs({chapman} - n_true) <= 2 * CAST(floor(sqrt(CAST((n_a + 1) * (n_b + 1) AS DOUBLE) * (n_a - n_both) * (n_b - n_both) / (CAST(n_both + 1 AS DOUBLE) * (n_both + 1) * (n_both + 2)))) AS BIGINT) + 1").alias(
            "estimate_within_2se"
        ),
    )


@query(
    "pack_sequences_atomic",
    """
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS nt
        FROM documents
    ),
    hist AS (
        SELECT CAST(nt AS BIGINT) AS L, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY nt
    ),
    branch AS (
        SELECT CAST(COALESCE(sum(CASE WHEN L <= 0 THEN n END), 0) AS BIGINT)
                   AS n_empty,
               CAST(COALESCE(sum(CASE WHEN L > 512 THEN n END), 0) AS BIGINT)
                   AS n_oversize
        FROM hist
    ),
    ord AS (
        SELECT L, n, row_number() OVER (ORDER BY L DESC) AS i
        FROM hist WHERE L BETWEEN 1 AND 512
    ),
    fold AS (
        SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS L,
               CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS fill,
               CAST(0 AS BIGINT) AS first_bin, CAST(0 AS BIGINT) AS new_start,
               CAST(1 AS BIGINT) AS per_bin, CAST(0 AS BIGINT) AS bins,
               CAST(0 AS BIGINT) AS rem
        UNION ALL
        SELECT o.i, o.L, o.n,
               least(o.n, f.rem // o.L),
               CASE WHEN least(o.n, f.rem // o.L) > 0 THEN f.bins ELSE 0 END,
               CASE WHEN o.n - least(o.n, f.rem // o.L) > 0
                    THEN f.bins + 1 ELSE 0 END,
               512 // o.L,
               f.bins + CASE WHEN o.n - least(o.n, f.rem // o.L) > 0
                    THEN (o.n - least(o.n, f.rem // o.L) + (512 // o.L) - 1)
                         // (512 // o.L) ELSE 0 END,
               CASE WHEN o.n - least(o.n, f.rem // o.L) > 0
                    THEN 512 - ((o.n - least(o.n, f.rem // o.L) - 1)
                                % (512 // o.L) + 1) * o.L
                    ELSE f.rem - least(o.n, f.rem // o.L) * o.L END
        FROM fold f JOIN ord o ON o.i = f.i + 1
    ),
    plan AS (
        SELECT L, fill, first_bin, new_start, per_bin FROM fold WHERE i >= 1
    ),
    ranked AS (
        SELECT doc_id, CAST(nt AS BIGINT) AS L,
               row_number() OVER (PARTITION BY nt ORDER BY doc_id) AS r
        FROM toks WHERE nt BETWEEN 1 AND 512
    ),
    assign AS (
        SELECT t.doc_id, t.L,
               CASE WHEN t.r <= p.fill THEN p.first_bin
                    ELSE p.new_start + (t.r - p.fill - 1) // p.per_bin
               END AS bin_id
        FROM ranked t JOIN plan p ON p.L = t.L
    ),
    bins AS (
        SELECT bin_id, CAST(count(*) AS BIGINT) AS depth,
               CAST(sum(L) AS BIGINT) AS tokens,
               CAST(bit_xor(doc_id) AS BIGINT) AS dx
        FROM assign GROUP BY bin_id
    ),
    by_depth AS (
        SELECT depth, CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(tokens) AS BIGINT) AS tokens_at_depth,
               CAST(bit_xor(dx) AS BIGINT) AS docs_xor
        FROM bins GROUP BY depth
    )
    SELECT d.depth, d.n_bins, d.tokens_at_depth, d.docs_xor,
           CAST(sum(d.n_bins) OVER () AS BIGINT) AS n_bins_total,
           CAST(sum(d.depth * d.n_bins) OVER () AS BIGINT) AS n_docs_packed,
           CAST(CASE WHEN sum(d.n_bins) OVER () = 0 THEN 0
                ELSE sum(d.tokens_at_depth) OVER () * 1000000
                     // (sum(d.n_bins) OVER () * 512) END AS BIGINT) / 1e6
               AS efficiency,
           b.n_empty, b.n_oversize
    FROM by_depth d LEFT JOIN branch b ON true
    ORDER BY d.depth
    """,
    "DOCUMENT-ATOMIC SEQUENCE PACKING (the r13 depth flagship — the "
    "production packing shape for instruction-tuning/T5/GPT corpora: "
    "whole documents into fixed 512-token training bins, never split "
    "across sequences, so no cross-sequence attention contamination; "
    "completes the packing family where x25 is concat-and-chunk with "
    "straddling and xa2 bin-packs file METADATA in layout order): "
    "Next-Fit-Decreasing over the (length, count) HISTOGRAM — the "
    "histogram-packing insight (Krell et al. 2021): same-length "
    "documents are interchangeable, so the entire packing DECISION "
    "folds over <= 512 histogram classes with scalar integer state "
    "(open-bin id, remainder), O(cap) work at ANY corpus size. Spark "
    "side collects the bounded histogram and folds driver-side "
    "(operators/packing.nfd_plan — the kmeans collect pattern), then "
    "broadcast-joins the per-class plan so each doc derives its bin "
    "id in closed form from its within-class rank: r <= fill -> the "
    "inherited open bin, else new_start + (r-fill-1) div per_bin. "
    "Oracle mirrors the fold as a LINEAR recursive CTE (one row per "
    "class — scalar state, so no AS MATERIALIZED fan-out of the xcw "
    "class). Closed form == true sequential NFD: pinned by a "
    "hypothesis property test vs a brute per-item simulator AND a "
    "python replica over the real fixture; zero-token and >cap "
    "documents are declared counted branches (honest null on "
    "fixtures: both 0 — lengths 10..100; branch raise pinned by unit "
    "test). Output: per-depth bin census + exact packing efficiency "
    "(count-ratio quantization), docs_xor = xor-of-xors membership "
    "checksum (overflow-free at any scale). All integers end-to-end",
    ("documents", "text", "analytics"),
)
def pack_sequences_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators import packing as pack_ops

    t = _t(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
        )
        .cast("long")
        .alias("n_tokens"),
    )
    assign, n_empty, n_oversize, _n_bins = pack_ops.pack_documents_atomic(
        toks, token_col="n_tokens", id_col="doc_id", cap=512
    )
    bins = assign.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("depth"),
        F.sum("length").cast("long").alias("tokens"),
        F.expr("bit_xor(doc_id)").cast("long").alias("dx"),
    )
    by_depth = bins.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("tokens").cast("long").alias("tokens_at_depth"),
        F.expr("bit_xor(dx)").cast("long").alias("docs_xor"),
    )
    return by_depth.select(
        "depth",
        "n_bins",
        "tokens_at_depth",
        "docs_xor",
        F.sum("n_bins").over(W.partitionBy()).cast("long").alias("n_bins_total"),
        F.sum(F.col("depth") * F.col("n_bins"))
        .over(W.partitionBy())
        .cast("long")
        .alias("n_docs_packed"),
        (
            F.expr(
                "CAST(CASE WHEN sum(n_bins) OVER () = 0 THEN 0"
                " ELSE sum(tokens_at_depth) OVER () * 1000000"
                " div (sum(n_bins) OVER () * 512) END AS BIGINT)"
            )
            / 1e6
        ).alias("efficiency"),
        F.lit(n_empty).cast("long").alias("n_empty"),
        F.lit(n_oversize).cast("long").alias("n_oversize"),
    ).orderBy("depth")


_KNN_D2_SQL = (
    "list_sum(list_transform(range(1, 65),"
    " i -> (ea.v[i]-eb.v[i])*(ea.v[i]-eb.v[i])))"
)


def _knn_round_sql(prev: str, rnd: int, k: int) -> str:
    """One NN-descent round as oracle CTEs (the _bpe_chain_sql idiom:
    ONE generator emits the bounded unrolled chain; each per-round CTE
    is referenced more than once downstream, so AS MATERIALIZED — the
    xcw rule — keeps DuckDB from compiling 2^rounds subtree copies)."""
    return f"""
    und{rnd} AS MATERIALIZED (
        SELECT c, x, min(d2) AS d2 FROM (
            SELECT u AS c, w AS x, d2 FROM {prev}
            UNION ALL SELECT w AS c, u AS x, d2 FROM {prev}
        ) GROUP BY c, x
    ),
    nbhd{rnd} AS MATERIALIZED (
        SELECT c, x FROM (
            SELECT c, x, row_number() OVER (PARTITION BY c ORDER BY d2, x) AS rk
            FROM und{rnd}
        ) WHERE rk <= {2 * k}
    ),
    cand{rnd} AS MATERIALIZED (
        SELECT DISTINCT l.x AS u, r.x AS w
        FROM nbhd{rnd} l JOIN nbhd{rnd} r ON l.c = r.c AND l.x < r.x
    ),
    sc{rnd} AS MATERIALIZED (
        SELECT c.u, c.w, {_KNN_D2_SQL} AS d2
        FROM cand{rnd} c JOIN ev ea ON ea.id = c.u JOIN ev eb ON eb.id = c.w
    ),
    nbr{rnd} AS MATERIALIZED (
        SELECT u, w, d2 FROM (
            SELECT u, w, d2,
                   row_number() OVER (PARTITION BY u ORDER BY d2, w) AS rk
            FROM (
                SELECT u, w, min(d2) AS d2 FROM (
                    SELECT u, w, d2 FROM {prev}
                    UNION ALL SELECT u, w, d2 FROM sc{rnd}
                    UNION ALL SELECT w AS u, u AS w, d2 FROM sc{rnd}
                ) GROUP BY u, w
            )
        ) WHERE rk <= {k}
    )"""


@query(
    "graph_knn_descent",
    f"""
    WITH ev AS MATERIALIZED (
        SELECT vec_id AS id, label AS cell,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings
    ),
    sp AS MATERIALIZED (
        SELECT ea.id AS u, eb.id AS w, {_KNN_D2_SQL} AS d2
        FROM ev ea JOIN ev eb ON ea.cell = eb.cell AND ea.id <> eb.id
    ),
    ring AS MATERIALIZED (
        SELECT id, ('0x' || substr(md5('knn:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM ev
    ),
    rp AS MATERIALIZED (
        SELECT u, w FROM (
            SELECT lag(id) OVER (PARTITION BY h % 64 ORDER BY h, id) AS u,
                   id AS w
            FROM ring
        ) WHERE u IS NOT NULL
    ),
    bsc AS MATERIALIZED (
        SELECT r.u, r.w, {_KNN_D2_SQL} AS d2
        FROM rp r JOIN ev ea ON ea.id = r.u JOIN ev eb ON eb.id = r.w
    ),
    sp0 AS MATERIALIZED (
        SELECT u, w, min(d2) AS d2 FROM (
            SELECT u, w, d2 FROM sp
            UNION ALL SELECT u, w, d2 FROM bsc
            UNION ALL SELECT w AS u, u AS w, d2 FROM bsc
        ) GROUP BY u, w
    ),
    seed AS MATERIALIZED (
        SELECT u, w, d2 FROM (
            SELECT u, w, d2,
                   row_number() OVER (PARTITION BY u ORDER BY d2, w) AS rk
            FROM sp0
        ) WHERE rk <= 6
    ),
    {_knn_round_sql("seed", 1, 6)},
    {_knn_round_sql("nbr1", 2, 6)},
    ex AS MATERIALIZED (
        SELECT u, w FROM (
            SELECT u, w, row_number() OVER (PARTITION BY u ORDER BY d2, w) AS rk
            FROM (
                SELECT ea.id AS u, eb.id AS w, {_KNN_D2_SQL} AS d2
                FROM ev ea JOIN ev eb ON ea.id < 32 AND eb.id <> ea.id
            )
        ) WHERE rk <= 6
    ),
    sh AS (
        SELECT s.u, CAST(count(*) AS BIGINT) AS h
        FROM seed s JOIN ex ON ex.u = s.u AND ex.w = s.w GROUP BY s.u
    ),
    fh AS (
        SELECT f.u, CAST(count(*) AS BIGINT) AS h
        FROM nbr2 f JOIN ex ON ex.u = f.u AND ex.w = f.w GROUP BY f.u
    ),
    probes AS (SELECT DISTINCT u FROM ex)
    SELECT p.u AS probe_id,
           COALESCE(sh.h, 0) AS seed_hits,
           COALESCE(fh.h, 0) AS final_hits,
           CAST(COALESCE(sh.h, 0) * 1000000 // 6 AS BIGINT) / 1e6 AS recall_seed,
           CAST(COALESCE(fh.h, 0) * 1000000 // 6 AS BIGINT) / 1e6 AS recall_final,
           CAST(sum(COALESCE(sh.h, 0)) OVER () * 1000000
                // (count(*) OVER () * 6) AS BIGINT) / 1e6 AS mean_recall_seed,
           CAST(sum(COALESCE(fh.h, 0)) OVER () * 1000000
                // (count(*) OVER () * 6) AS BIGINT) / 1e6 AS mean_recall_final
    FROM probes p
    LEFT JOIN sh ON sh.u = p.u
    LEFT JOIN fh ON fh.u = p.u
    ORDER BY probe_id
    """,
    "NN-DESCENT k-NN GRAPH + RECALL AUDIT (Dong et al. 2011 — the "
    "graph-based ANN member completing the family's RECALL story "
    "beyond IVF cells, and the first ANN-recall query with a FULL "
    "value oracle: x21/x41/x90 are rows-only because their sketches "
    "are nondeterministic, but NN-descent over exact integer "
    "distances with unique (d2, id) tie-breaks is a deterministic "
    "function of the data, so the whole graph hash-matches): seed "
    "each vector's k=6 list from the coarse-cell blocker (label "
    "cells, the x98 declared semantics), then 2 NN-descent rounds — "
    "symmetrize to B(v) = out+in neighbors capped at 2k by distance "
    "rank (the paper's sampling bound), in-array (i<j) wedge "
    "candidates map-side (the x94 kernel), exact integer milli-unit "
    "distances via ONE Arrow numpy kernel (the dbscan BLAS lesson; "
    "int64 end-to-end, kernel emits only integers), union + re-rank "
    "top-k. Audit: recall@6 of seed AND final lists vs exact "
    "brute-force for 32 probe anchors — the output shows what the "
    "descent rounds RECOVER beyond the blocker (cross-cell true "
    "neighbors the cell join structurally misses). Oracle = the same "
    "bounded chain as MATERIALIZED CTEs from one generator (the "
    "_bpe_chain_sql idiom); python replica re-runs the whole descent "
    "in numpy independently. Count-ratio recalls, window means over "
    "the 32-row probe frame. Scale: cell-blocked seeds, <= |V|*(2k "
    "choose 2) wedge rows/round emitted map-side with both endpoint "
    "vectors riding the collected neighborhood (r15: the attach joins "
    "and candidate distinct fused away) — no all-pairs scan anywhere",
    ("embeddings", "similarity", "graph"),
)
def graph_knn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    seed, final = sim_ops.knn_graph_descent(
        emb, k=6, rounds=2, cell_col="label", id_col="vec_id", emb_col="embedding"
    )
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("v"),
    )
    ppairs = (
        F.broadcast(
            vecs.filter(F.col("id") < 32).select(
                F.col("id").alias("u"), F.col("v").alias("va")
            )
        )
        .join(
            vecs.select(F.col("id").alias("w"), F.col("v").alias("vb")),
            F.col("u") != F.col("w"),
        )
        .select("u", "w", "va", "vb")
    )
    wex = W.partitionBy("u").orderBy(F.col("d2").asc(), F.col("w").asc())
    ex = (
        sim_ops._pairs_exact_d2(ppairs)
        .withColumn("__rk", F.row_number().over(wex))
        .filter(F.col("__rk") <= 6)
        .select("u", "w")
    )
    sh = (
        seed.join(ex, ["u", "w"])
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("sh"))
    )
    fh = (
        final.join(ex, ["u", "w"])
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("fh"))
    )
    probes = ex.select("u").distinct()
    out = (
        probes.join(sh, "u", "left")
        .join(fh, "u", "left")
        .select(
            F.col("u").alias("probe_id"),
            F.coalesce(F.col("sh"), F.lit(0)).cast("long").alias("seed_hits"),
            F.coalesce(F.col("fh"), F.lit(0)).cast("long").alias("final_hits"),
        )
    )
    return out.select(
        "probe_id",
        "seed_hits",
        "final_hits",
        (F.expr("CAST(seed_hits * 1000000 div 6 AS BIGINT)") / 1e6).alias(
            "recall_seed"
        ),
        (F.expr("CAST(final_hits * 1000000 div 6 AS BIGINT)") / 1e6).alias(
            "recall_final"
        ),
        (
            F.expr(
                "CAST(sum(seed_hits) OVER () * 1000000"
                " div (count(1) OVER () * 6) AS BIGINT)"
            )
            / 1e6
        ).alias("mean_recall_seed"),
        (
            F.expr(
                "CAST(sum(final_hits) OVER () * 1000000"
                " div (count(1) OVER () * 6) AS BIGINT)"
            )
            / 1e6
        ).alias("mean_recall_final"),
    ).orderBy("probe_id")


def _pass_at_k_expr(k: int) -> str:
    """The unbiased pass@k estimator (Chen et al. 2021 appendix):
    pass@k = 1 - C(n-c, k)/C(n, k), with the combinatorial ratio
    computed as the k-term product of exact-BIGINT quotients in ONE
    fixed expression order — each factor is a correctly-rounded IEEE
    division of identical integers, so the k-double product is
    engine-identical (the x63 fixed-order float idiom; the direct
    C(n,k) BIGINT product overflows at n ~ 80 for k = 10, the product-
    of-quotients form never does). Identical text on both sides."""
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / (n - {i}))" for i in range(k)
    )
    return (
        f"CASE WHEN c = 0 THEN 0 WHEN n - c < {k} THEN 1000000"
        f" ELSE 1000000 - CAST(floor(({prod}) * 1000000) AS BIGINT) END"
    )


@query(
    "pass_at_k",
    f"""
    WITH per_task AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM events
        GROUP BY user_id
    ),
    scored AS (
        SELECT user_id, n, c,
               {_pass_at_k_expr(1)} AS p1_ppm,
               {_pass_at_k_expr(5)} AS p5_ppm,
               {_pass_at_k_expr(10)} AS p10_ppm
        FROM per_task
    )
    SELECT user_id, n, c,
           CAST(p1_ppm AS BIGINT) / 1e6 AS pass_at_1,
           CAST(p5_ppm AS BIGINT) / 1e6 AS pass_at_5,
           CAST(p10_ppm AS BIGINT) / 1e6 AS pass_at_10,
           CAST(sum(p1_ppm) OVER () // count(*) OVER () AS BIGINT) / 1e6
               AS mean_pass_at_1,
           CAST(sum(p5_ppm) OVER () // count(*) OVER () AS BIGINT) / 1e6
               AS mean_pass_at_5,
           CAST(sum(p10_ppm) OVER () // count(*) OVER () AS BIGINT) / 1e6
               AS mean_pass_at_10
    FROM scored
    ORDER BY user_id
    """,
    "UNBIASED PASS@K (Chen et al. 2021, HumanEval appendix — the "
    "LLM-eval staple completing the eval family next to xe3 AP / "
    "roc_auc_eval / calibration_ece / xdz kappa: given n sampled "
    "attempts per task with c successes, the unbiased probability "
    "that at least one of k random draws succeeds is 1 - C(n-c,k)/"
    "C(n,k); read here over the events fixture as tasks = users, "
    "attempts = events, success = purchase — the estimator is "
    "domain-agnostic): the combinatorial ratio as a k-term product "
    "of exact-BIGINT quotients in ONE fixed expression order "
    "(identical integers -> identical IEEE doubles -> identical "
    "floor both engines, the x63/xed idiom; the naive C(n,k) BIGINT "
    "product overflows at n ~ 80 for k = 10 — the quotient-product "
    "form never overflows at ANY n), c = 0 and n - c < k guarded to "
    "exact 0 / 1e6 BEFORE the product (the ELSE branch then has all "
    "factors positive — no x/0, total function), ppm quantization, "
    "corpus means by integer window division. One events scan + one "
    "user-keyed agg; the unpartitioned windows ride the task frame. "
    "Python replica re-derives from raw events via "
    "math.comb exact rationals (a genuinely independent formula)",
    ("events", "analytics"),
)
def pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    per_task = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("c"),
        )
    )
    scored = per_task.select(
        "user_id",
        "n",
        "c",
        F.expr(_pass_at_k_expr(1)).alias("p1_ppm"),
        F.expr(_pass_at_k_expr(5)).alias("p5_ppm"),
        F.expr(_pass_at_k_expr(10)).alias("p10_ppm"),
    )
    return scored.select(
        "user_id",
        "n",
        "c",
        (F.col("p1_ppm").cast("long") / 1e6).alias("pass_at_1"),
        (F.col("p5_ppm").cast("long") / 1e6).alias("pass_at_5"),
        (F.col("p10_ppm").cast("long") / 1e6).alias("pass_at_10"),
        (
            F.expr("CAST(sum(p1_ppm) OVER () div count(1) OVER () AS BIGINT)")
            / 1e6
        ).alias("mean_pass_at_1"),
        (
            F.expr("CAST(sum(p5_ppm) OVER () div count(1) OVER () AS BIGINT)")
            / 1e6
        ).alias("mean_pass_at_5"),
        (
            F.expr("CAST(sum(p10_ppm) OVER () div count(1) OVER () AS BIGINT)")
            / 1e6
        ).alias("mean_pass_at_10"),
    ).orderBy("user_id")


@query(
    "hdr_quantile_sketch",
    """
    WITH cents AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
    ),
    b AS (
        SELECT CASE WHEN c < 32 THEN c
               ELSE ((length(bin(c)) - 1) - 5) * 32
                    + ((c >> ((length(bin(c)) - 1) - 5)) & 31) + 32 END AS bucket
        FROM cents
    ),
    sk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY bucket),
    cum AS (
        SELECT bucket, cnt,
               CAST(sum(cnt) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n
        FROM sk
    ),
    qs AS (SELECT CAST(q0 AS BIGINT) AS q FROM (VALUES (50), (90), (99)) t(q0)),
    pick AS (
        SELECT q, CAST(min(bucket) AS BIGINT) AS bucket, CAST(min(n) AS BIGINT) AS n
        FROM cum JOIN qs ON cum * 100 >= n * q
        GROUP BY q
    ),
    dec AS (
        SELECT q, bucket, n,
               CASE WHEN bucket < 32 THEN bucket
                    ELSE (32 + (bucket - 32) % 32) << ((bucket - 32) // 32)
               END AS lo,
               CASE WHEN bucket < 32 THEN bucket
                    ELSE ((32 + (bucket - 32) % 32) << ((bucket - 32) // 32))
                         + (CAST(1 AS BIGINT) << ((bucket - 32) // 32)) - 1
               END AS hi
        FROM pick
    ),
    exh AS (
        SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM cents GROUP BY c
    ),
    excum AS (
        SELECT c, CAST(sum(cnt) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n
        FROM exh
    ),
    expick AS (
        SELECT q, CAST(min(c) AS BIGINT) AS exact_cents
        FROM excum JOIN qs ON cum * 100 >= n * q
        GROUP BY q
    )
    SELECT d.q, d.n AS n_rows, d.bucket, d.lo AS est_lo_cents,
           d.hi AS est_hi_cents, e.exact_cents,
           (d.lo <= e.exact_cents AND e.exact_cents <= d.hi) AS contained,
           CAST((d.hi - d.lo) * 1000000 // greatest(d.lo, 1) AS BIGINT) / 1e6
               AS bucket_rel_width
    FROM dec d JOIN expick e ON e.q = d.q
    ORDER BY d.q
    """,
    "MERGEABLE HDR QUANTILE SKETCH + EXACT AUDIT (HdrHistogram / "
    "DDSketch family, Masson et al. 2019 — the QUANTILE axis of the "
    "mergeable-sketch family: xfp cms = counts, bloom = membership, "
    "x44 HLL = cardinality, x45 = heavy hitters; production latency/"
    "size percentiles at 100 TB are served by a merge of per-shard "
    "constant-size histograms, not an exact selection per probe): "
    "bucket = pure-INTEGER msb form length(bin(v))-1 with 5 mantissa "
    "bits (<= 3.125% relative width; values < 32 exact) — no float "
    "log anywhere, unlike quantiles._log_bucket where the float "
    "bucket is only an exactness-agnostic PRUNING device; here the "
    "bucket layout IS the driver-facing contract, so it must be "
    "integer-exact (variable-amount >>/<< pinned engine-pair). "
    "Sketch = one map-side-combinable groupBy (<= ~1200 rows at any "
    "corpus size); merge law = bucket-wise count sum (unit-pinned); "
    "quantile probe = integer cross-mult rank walk (cum*100 >= n*q) "
    "over the bounded bucket frame. The audit: the EXACT quantile at "
    "the same integer rank rule (xcr value-histogram cumsum; fixture-"
    "scale distinct-cents frame — production audits sample or use "
    "operators/quantiles' bounded-state selection) must fall inside "
    "[lo, hi] — structurally guaranteed by bucket monotonicity, "
    "emitted as the sketch's validity readout with the bucket's "
    "relative width. All integers end-to-end",
    ("lineitem", "analytics"),
)
def hdr_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    cents = t["lineitem"].select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c")
    )
    bucket = F.expr(
        "CASE WHEN c < 32 THEN c"
        " ELSE ((length(bin(c)) - 1) - 5) * 32"
        "      + ((c >> ((length(bin(c)) - 1) - 5)) & 31) + 32 END"
    )
    sk = (
        cents.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wcum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = sk.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(wcum).cast("long").alias("cum"),
        F.sum("cnt").over(W.partitionBy()).cast("long").alias("n"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q long")
    # carry the cumulative count BELOW the picked bucket so the exact
    # audit can run two-phase selection (sort only inside the picked
    # bucket) instead of a corpus-sized single-partition value cumsum
    pick = (
        cum.join(F.broadcast(qs), F.col("cum") * 100 >= F.col("n") * F.col("q"))
        .groupBy("q")
        .agg(
            F.min("bucket").cast("long").alias("bucket"),
            F.min("n").cast("long").alias("n"),
            F.min(F.struct("bucket", "cum", "cnt")).alias("__pb"),
        )
        .select(
            "q",
            "bucket",
            "n",
            (F.col("__pb.cum") - F.col("__pb.cnt")).cast("long").alias("below"),
        )
    )
    dec = pick.select(
        "q",
        "bucket",
        "n",
        "below",
        F.expr(
            "CASE WHEN bucket < 32 THEN bucket"
            " ELSE (32 + (bucket - 32) % 32) << ((bucket - 32) div 32) END"
        ).alias("lo"),
        F.expr(
            "CASE WHEN bucket < 32 THEN bucket"
            " ELSE ((32 + (bucket - 32) % 32) << ((bucket - 32) div 32))"
            "      + (CAST(1 AS BIGINT) << ((bucket - 32) div 32)) - 1 END"
        ).alias("hi"),
    )
    # Two-phase exact selection (the operators/quantiles shape): the
    # exact quantile at rank rule cum*100 >= n*q provably lies in the
    # picked bucket (monotone bucketing, same rank rule), so only the
    # picked buckets' rows are aggregated and the rank walk runs over
    # a bucket-width-bounded per-q frame — never a corpus-sized
    # single-partition value cumsum.
    inb = cents.join(
        F.broadcast(dec.select("q", "n", "below", "lo", "hi")),
        (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi")),
    )
    exh = inb.groupBy("q", "n", "below", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wex = (
        W.partitionBy("q")
        .orderBy("c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    excum = exh.select(
        "q",
        "n",
        "below",
        "c",
        F.sum("cnt").over(wex).cast("long").alias("cum_in"),
    )
    expick = (
        excum.filter(
            (F.col("below") + F.col("cum_in")) * 100 >= F.col("n") * F.col("q")
        )
        .groupBy("q")
        .agg(F.min("c").cast("long").alias("exact_cents"))
    )
    return (
        dec.join(expick, "q")
        .select(
            "q",
            F.col("n").alias("n_rows"),
            "bucket",
            F.col("lo").alias("est_lo_cents"),
            F.col("hi").alias("est_hi_cents"),
            "exact_cents",
            (
                (F.col("lo") <= F.col("exact_cents"))
                & (F.col("exact_cents") <= F.col("hi"))
            ).alias("contained"),
            (
                F.expr("CAST((hi - lo) * 1000000 div greatest(lo, 1) AS BIGINT)")
                / 1e6
            ).alias("bucket_rel_width"),
        )
        .orderBy("q")
    )


@query(
    "bloom_join_prune",
    """
    WITH dim AS (
        SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
        FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    cells AS (
        SELECT (('0x' || substr(md5('jp:' || k), r.r * 6 + 1, 6))::BIGINT
                % 1984) AS pos
        FROM dim, (SELECT unnest([0, 1, 2, 3]) AS r) r
    ),
    bloom AS (
        SELECT pos // 62 AS word_idx,
               CAST(bit_or(1::BIGINT << CAST(pos % 62 AS INT)) AS BIGINT) AS bits
        FROM cells GROUP BY pos // 62
    ),
    probes AS (
        SELECT CAST(o_custkey AS VARCHAR) AS k, o_custkey,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY o_custkey
    ),
    pcells AS (
        SELECT k, (('0x' || substr(md5('jp:' || k), r.r * 6 + 1, 6))::BIGINT
                % 1984) AS pos
        FROM probes, (SELECT unnest([0, 1, 2, 3]) AS r) r
    ),
    hits AS (
        SELECT p.k,
               CASE WHEN (COALESCE(b.bits, 0)
                          & (1::BIGINT << CAST(p.pos % 62 AS INT))) != 0
                    THEN 1 ELSE 0 END AS hit
        FROM pcells p LEFT JOIN bloom b ON b.word_idx = p.pos // 62
    ),
    verdicts AS (
        SELECT k, sum(hit) = 4 AS bloom_says FROM hits GROUP BY k
    ),
    classified AS (
        SELECT p.o_custkey, p.n_rows, v.bloom_says,
               (d.k IS NOT NULL) AS actually_member
        FROM probes p
        JOIN verdicts v ON v.k = p.k
        LEFT JOIN dim d ON d.k = p.k
    ),
    grouped AS (
        SELECT bloom_says, actually_member,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n_rows) AS BIGINT) AS n_order_rows,
               CAST(sum(CASE WHEN bloom_says AND NOT actually_member
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN NOT actually_member THEN 1 ELSE 0 END)
                    AS BIGINT) AS neg,
               CAST(sum(CASE WHEN NOT bloom_says AND actually_member
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN bloom_says THEN n_rows ELSE 0 END)
                    AS BIGINT) AS pass_rows
        FROM classified
        GROUP BY bloom_says, actually_member
    )
    SELECT bloom_says, actually_member, n_keys, n_order_rows,
           CAST(sum(fp) OVER () * 1000000
                // greatest(sum(neg) OVER (), 1) AS BIGINT) / 1e6
               AS fp_rate_nonmembers,
           CAST(sum(fn) OVER () AS BIGINT) AS n_false_negatives,
           CAST(sum(pass_rows) OVER () * 1000000
                // greatest(sum(n_order_rows) OVER (), 1) AS BIGINT) / 1e6
               AS rows_passed_frac
    FROM grouped
    ORDER BY bloom_says, actually_member
    """,
    "BLOOM-PRUNED JOIN AUDIT (the runtime-row-filtering pattern Spark "
    "implements internally with its non-public bloom_filter_agg — a "
    "fact-side scan probes a tiny membership index built from the "
    "filtered dim side and skips rows that PROVABLY cannot join, "
    "trading a bounded false-positive pass-through rate for never "
    "shuffling non-matching rows; this query exercises the hardened "
    "decontam.bloom_build/probe pair end-to-end in its production "
    "role): dim = BUILDING customers (302 keys at sf0.01) into a "
    "DELIBERATELY small 32-word index (1984 bits, ~61% fill) so the "
    "false-positive path carries REAL traffic — the r12 bloom row's "
    "honest null was zero FPs at 0.8% fill, leaving the FP path "
    "pinned only by a constructed unit test; here ~14% of "
    "non-members pass and the driver hashes the exact count "
    "(deterministic given md5). Output: the 2x2 (bloom_says x "
    "actually_member) census over distinct probe keys with order-row "
    "mass, the FP rate among non-members, the row-pass fraction, and "
    "n_false_negatives — exactly 0 by the any-clear-bit-proves-"
    "absence law (replica-asserted; the structurally-empty "
    "(says=false, member=true) cell never appears). Spark side goes "
    "through bloom_probe's fingerprint guard (the ADVICE r12 "
    "hardening) — this is the first registry consumer to exercise it "
    "driver-shaped. Production sizing note: n_words scales with "
    "|dim| for a target FP rate (~10 bits/key for 1%); the 32-word "
    "choice here is the declared adversarial-fill constant",
    ("customer", "orders", "dedup"),
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .operators import decontam as decontam_ops

    t = _t(spark, sf_dir)
    dim = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("k"))
        .distinct()
    )
    bloom = decontam_ops.bloom_build(dim, key_col="k", n_words=32, seed="jp")
    probes = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            "o_custkey",
            F.col("o_custkey").cast("string").alias("k"),
            "n_rows",
        )
    )
    verdicts = decontam_ops.bloom_probe(
        bloom, probes, key_col="k", n_words=32, seed="jp"
    ).select(F.col("probe_key").alias("k"), "bloom_says")
    classified = (
        probes.join(verdicts, "k")
        .join(
            F.broadcast(dim.withColumn("__m", F.lit(1))), "k", "left"
        )
        .select(
            "o_custkey",
            "n_rows",
            "bloom_says",
            F.col("__m").isNotNull().alias("actually_member"),
        )
    )
    grouped = classified.groupBy("bloom_says", "actually_member").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n_rows").cast("long").alias("n_order_rows"),
        F.sum(
            F.when(F.col("bloom_says") & ~F.col("actually_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("__fp"),
        F.sum(F.when(~F.col("actually_member"), 1).otherwise(0))
        .cast("long")
        .alias("__neg"),
        F.sum(
            F.when(~F.col("bloom_says") & F.col("actually_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("__fn"),
        F.sum(F.when(F.col("bloom_says"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("__pass_rows"),
    )
    w = W.partitionBy()
    return (
        grouped.select(
            "bloom_says",
            "actually_member",
            "n_keys",
            "n_order_rows",
            (
                F.expr(
                    "CAST(sum(__fp) OVER () * 1000000"
                    " div greatest(sum(__neg) OVER (), 1) AS BIGINT)"
                )
                / 1e6
            ).alias("fp_rate_nonmembers"),
            F.sum("__fn").over(w).cast("long").alias("n_false_negatives"),
            (
                F.expr(
                    "CAST(sum(__pass_rows) OVER () * 1000000"
                    " div greatest(sum(n_order_rows) OVER (), 1) AS BIGINT)"
                )
                / 1e6
            ).alias("rows_passed_frac"),
        )
        .orderBy("bloom_says", "actually_member")
    )


@query(
    "frequent_itemsets_apriori",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ),
    tri AS (
        SELECT a.it AS i1, b.it AS i2, c.it AS i3,
               CAST(count(*) AS BIGINT) AS support
        FROM items a
        JOIN items b ON a.bk = b.bk AND a.it < b.it
        JOIN items c ON b.bk = c.bk AND b.it < c.it
        GROUP BY 1, 2, 3
        HAVING count(*) >= 2
    ),
    ctx AS (
        SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets,
               CAST((SELECT count(*) FROM (
                   SELECT a.it, b.it
                   FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
                   GROUP BY a.it, b.it HAVING count(*) >= 2
               )) AS BIGINT) AS n_frequent_pairs
        FROM items
    )
    SELECT t.i1, t.i2, t.i3, t.support, c.n_baskets, c.n_frequent_pairs
    FROM tri t LEFT JOIN ctx c ON true
    ORDER BY t.i1, t.i2, t.i3
    """,
    "FREQUENT ITEMSETS VIA APRIORI (Agrawal & Srikant 1994 — the "
    "market-basket mining classic completing the family above xch's "
    "pair-affinity: frequent TRIPLES with the candidate-pruning "
    "machinery that makes k >= 3 tractable at 100 TB): the ENGINE "
    "runs true Apriori — frequent items L1 prune the basket stream, "
    "frequent pairs L2 (support >= 2) generate candidate triples by "
    "the L2-join-L2 prefix rule (shared i1, i2 < i3) FURTHER pruned "
    "by the (i2, i3) in L2 subset check, and only basket-instances "
    "of surviving candidates are counted — while the ORACLE counts "
    "triples NAIVELY from the definition; the two agree by the "
    "Apriori theorem itself (every sub-itemset of a frequent triple "
    "is frequent, so pruning never drops one — the oracle-vs-engine "
    "pair literally checks the theorem on real data every round). "
    "Candidate volume at scale is bounded by L2 joins (pair-frequent "
    "prefixes), never the item-catalog cross product; basket triple "
    "instances come from the L2-restricted per-basket pair frame "
    "joined on (basket, shared-first-item) — the wedge shape. "
    "All exact integer counts; unique (i1, i2, i3) order",
    ("lineitem", "analytics"),
)
def frequent_itemsets_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    items = (
        t["lineitem"]
        .select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it"))
        .distinct()
    )
    l1 = (
        items.groupBy("it")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("it")
    )
    items1 = items.join(l1, "it", "left_semi")
    # Per-basket sorted item arrays (r8 wedge idiom): basket size is
    # BOUNDED (max distinct parts per order = 17 at fixture; lineitems
    # per order is a schema constant, not corpus-scaled), so pair AND
    # triple instances enumerate in-array map-side — the former two
    # corpus-sized merge self-joins (basket-pair build + pair-pair
    # triple build, each a full sort+shuffle of ~1.2M rows, plus the
    # 22<->24 AQE wobble that forced hint("merge")) are deleted
    # outright. Eager checkpoint: the arrays feed the l2 action AND
    # the final triple action (separate jobs; recompute would redo the
    # distinct + semi + collect shuffles — the r12 rule).
    baskets = (
        items1.groupBy("bk")
        .agg(F.sort_array(F.collect_list("it")).alias("its"))
        .localCheckpoint(eager=True)
    )
    its = F.col("its")
    pair_arr = F.flatten(
        F.transform(
            its,
            lambda a, i: F.transform(
                F.slice(its, i + F.lit(2), F.size(its)),
                lambda b: F.array(a, b),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p")[0].alias("i1"), F.col("p")[1].alias("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # l2 is consumed at THREE different join keys (c3 prefix join, the
    # apriori subset check, the tri semi) plus the context count —
    # ReuseExchange does NOT dedupe differently-keyed consumers (the r9
    # datapoint); the eager checkpoint keeps every consumer on one
    # in-memory RDD and the job count deterministic (plan_stable).
    l2 = (
        pair_counts.filter(F.col("n") >= 2)
        .select("i1", "i2")
        .localCheckpoint(eager=True)
    )
    # candidate triples: L2 join L2 on the shared prefix, then the
    # apriori subset check (i2, i3) in L2
    c3 = (
        l2.select("i1", "i2")
        .join(
            l2.select(F.col("i1").alias("i1b"), F.col("i2").alias("i3")),
            F.col("i1") == F.col("i1b"),
        )
        .filter(F.col("i2") < F.col("i3"))
        .select("i1", "i2", "i3")
        .join(
            l2.select(F.col("i1").alias("i2"), F.col("i2").alias("i3")),
            ["i2", "i3"],
            "left_semi",
        )
    )
    # triple instances in-array (i<j<k over the sorted basket array,
    # ~1.6M rows map-side at sf0.1), then the c3 semi applies the full
    # Apriori subset condition — identical support counts to the former
    # pair-instance self-join (c3 already requires all three pairs
    # frequent, and a basket holding the (i1,i2),(i1,i3) pair
    # instances holds all three items).
    triple_arr = F.flatten(
        F.flatten(
            F.transform(
                its,
                lambda a, i: F.transform(
                    F.slice(its, i + F.lit(2), F.size(its)),
                    lambda b, j: F.transform(
                        F.slice(its, i + j + F.lit(3), F.size(its)),
                        lambda c: F.array(a, b, c),
                    ),
                ),
            )
        )
    )
    tri_inst = (
        baskets.select(F.explode(triple_arr).alias("p"))
        .select(
            F.col("p")[0].alias("i1"),
            F.col("p")[1].alias("i2"),
            F.col("p")[2].alias("i3"),
        )
        .join(c3, ["i1", "i2", "i3"], "left_semi")
    )
    tri = (
        tri_inst.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    ctx = items.agg(
        F.countDistinct("bk").cast("long").alias("n_baskets")
    ).crossJoin(
        F.broadcast(
            l2.agg(F.count(F.lit(1)).cast("long").alias("n_frequent_pairs"))
        )
    )
    return (
        tri.join(F.broadcast(ctx), F.lit(True), how="left")
        .select("i1", "i2", "i3", "support", "n_baskets", "n_frequent_pairs")
        .orderBy("i1", "i2", "i3")
    )


def _hll_oracle_sql() -> str:
    from .operators.cardinality import (
        HLL_ALPHA_NUM,
        HLL_LC_THRESHOLD,
        HLL_M,
        hll_lc_table,
    )

    return f"""
    WITH keys AS (
        SELECT event_type AS shard, CAST(event_id AS VARCHAR) AS k FROM events
        UNION ALL
        SELECT '__all__' AS shard, CAST(event_id AS VARCHAR) AS k FROM events
        UNION ALL
        SELECT '__users__' AS shard, CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells AS (
        SELECT shard,
               ('0x' || substr(md5('hll:' || k), 1, 2))::BIGINT AS bucket,
               ('0x' || substr(md5('hll:' || k), 3, 12))::BIGINT AS v
        FROM keys
    ),
    regs AS (
        SELECT shard, bucket,
               max(CASE WHEN v = 0 THEN 49
                   ELSE 49 - length(bin(v)) END) AS reg
        FROM cells GROUP BY shard, bucket
    ),
    agg AS (
        SELECT shard,
               CAST(sum(1::BIGINT << (49 - reg)) AS BIGINT) AS sum_pow,
               CAST(count(*) AS BIGINT) AS cnt
        FROM regs GROUP BY shard
    ),
    est1 AS (
        SELECT shard,
               {HLL_M} - cnt AS v_empty,
               ({HLL_ALPHA_NUM} // s) * 16 + (({HLL_ALPHA_NUM} % s) * 16) // s
                   AS raw
        FROM (SELECT shard, cnt,
                     sum_pow + ({HLL_M} - cnt) * (1::BIGINT << 49) AS s
              FROM agg)
    ),
    tab AS (SELECT {hll_lc_table()} AS t),
    est AS (
        SELECT shard, v_empty,
               CASE WHEN v_empty > 0 AND raw <= {HLL_LC_THRESHOLD}
                    THEN 'linear' ELSE 'hll' END AS branch,
               CASE WHEN v_empty > 0 AND raw <= {HLL_LC_THRESHOLD}
                    THEN t[greatest(v_empty, 1)] ELSE raw END AS est
        FROM est1 LEFT JOIN tab ON true
    ),
    exact AS (
        SELECT shard, CAST(count(DISTINCT k) AS BIGINT) AS exact_n
        FROM keys GROUP BY shard
    )
    SELECT e.shard,
           x.exact_n,
           CAST(e.est AS BIGINT) AS est,
           CAST(e.v_empty AS BIGINT) AS v_empty,
           e.branch,
           (abs(e.est - x.exact_n) * 1000 <= 195 * x.exact_n) AS within_3se
    FROM est e JOIN exact x ON x.shard = e.shard
    ORDER BY e.shard
    """


@query(
    "hll_cardinality",
    _hll_oracle_sql(),
    "PORTABLE INTEGER HYPERLOGLOG (Flajolet et al. 2007) -- the "
    "CARDINALITY axis completing the mergeable-sketch family "
    "(membership = bloom_membership_index, frequency = xfp count-min, "
    "quantile = hdr_quantile_sketch; cardinality was the r13 verdict's "
    "named gap): per-event_type register sketches over event ids, "
    "bucket-wise-MAX merged into a corpus sketch, plus a low-"
    "cardinality user-id sketch so BOTH estimator branches (raw HLL "
    "and small-range linear counting) are live in-query. One md5 per "
    "key sliced into an 8-bit bucket and a 48-bit rank field (rank = "
    "49 - length(bin(v)), the pure-integer msb idiom); estimate = "
    "floor(alpha_256 * 2^65 / S) via two exact BIGINT divisions "
    "(alpha scaled to 2^61, formula-pinned) -- no doubles anywhere, so "
    "the estimate hash-matches cross-engine, unlike engine-private "
    "approx_count_distinct (x04). Small-range branch reads a 256-entry "
    "literal round(m*ln(m/V)) table (the transcendental-free "
    "literal-table idiom). THEOREM-CHECKING oracle (the Apriori "
    "precedent): the engine MERGES per-shard sketches into '__all__' "
    "while the oracle builds the global sketch directly from all keys "
    "-- equality holds by the merge law max(max(A), max(B)) = "
    "max(A u B) itself, so the oracle is structurally independent of "
    "the merge path. Estimator sanity is SCALE-AWARE (the xff rule): "
    "within_3se compares against 3 * 1.04/sqrt(256) = 19.5% relative "
    "SE by integer cross-multiplication -- valid at any corpus size. "
    "Scale shape: registers are map-side-combinable max aggregates, "
    "<= 258 rows per shard at ANY corpus size; merge is one tiny "
    "groupBy; nothing data-sized ever leaves the executors. Duplicate "
    "keys need no pre-distinct (max is idempotent), so the build is "
    "one scan, no distinct shuffle. The operator's parameter-"
    "fingerprint guard (bucket -1/-2 carry +-fp; mismatched merges "
    "break the cancellation) is exercised by unit pin, not here -- "
    "the oracle has no meta rows and the guard contributes 0",
    ("events", "sketch", "analytics"),
)
def hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.cardinality import HLL_M, hll_build, hll_estimate, hll_merge

    t = _t(spark, sf_dir)
    ev = t["events"]
    shard_sk = hll_build(
        ev.select("event_type", "event_id"),
        key_col="event_id",
        shard_col="event_type",
    )
    merged_sk = hll_merge(shard_sk).withColumn("shard", F.lit("__all__"))
    users_sk = hll_build(ev.select("user_id"), key_col="user_id").withColumn(
        "shard", F.lit("__users__")
    )
    all_sk = (
        shard_sk.withColumnRenamed("event_type", "shard")
        .unionByName(merged_sk.select("shard", "bucket", "reg"))
        .unionByName(users_sk.select("shard", "bucket", "reg"))
    )
    ests = hll_estimate(all_sk, by=["shard"])
    exact = (
        ev.select(F.col("event_type").alias("shard"), F.col("event_id").cast("string").alias("k"))
        .unionByName(
            ev.select(F.lit("__all__").alias("shard"), F.col("event_id").cast("string").alias("k"))
        )
        .unionByName(
            ev.select(F.lit("__users__").alias("shard"), F.col("user_id").cast("string").alias("k"))
        )
        .groupBy("shard")
        .agg(F.countDistinct("k").cast("long").alias("exact_n"))
    )
    return (
        ests.join(exact, "shard")
        .select(
            "shard",
            "exact_n",
            F.col("est").cast("long").alias("est"),
            F.col("v_empty").cast("long").alias("v_empty"),
            "branch",
            (F.abs(F.col("est") - F.col("exact_n")) * 1000 <= F.col("exact_n") * 195).alias(
                "within_3se"
            ),
        )
        .orderBy("shard")
    )


@query(
    "xg3_kruskal_wallis",
    """
    WITH lv AS (
        SELECT lang, CAST(length(text) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY lang, length(text)
    ),
    hv AS (
        SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM lv GROUP BY v
    ),
    hr AS (
        SELECT v, cv,
               2 * CAST(sum(cv) OVER (ORDER BY v) AS BIGINT) - cv + 1 AS r2
        FROM hv
    ),
    g AS (
        SELECT lv.lang,
               CAST(sum(lv.c) AS BIGINT) AS n_j,
               CAST(sum(lv.c * hr.r2) AS BIGINT) AS r2_j
        FROM lv JOIN hr ON hr.v = lv.v
        GROUP BY lv.lang
    ),
    tot AS (
        SELECT CAST(sum(n_j) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k,
               CAST(sum((r2_j * r2_j) // (4 * n_j)) AS BIGINT) AS a
        FROM g
    ),
    ties AS (
        SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tsum FROM hv
    ),
    h AS (
        SELECT n, k, a, tsum,
               n * n * n - n AS d,
               greatest(a // 700000000000, 1) AS gg,
               ((12 * (a // greatest(a // 700000000000, 1)) * 1000000)
                // ((n * (n + 1)) // greatest(a // 700000000000, 1)
                    + CASE WHEN (n * (n + 1))
                           % greatest(a // 700000000000, 1) > 0
                      THEN 1 ELSE 0 END))
                   // 1 - 3 * (n + 1) * 1000000 AS h_q
        FROM tot CROSS JOIN ties
    ),
    hh AS (
        SELECT n, k, tsum, d, h_q,
               greatest(d // 1000000, 1) AS dd
        FROM h
    ),
    hc AS (
        SELECT n, k, h_q,
               CASE WHEN tsum = 0 THEN h_q
                    ELSE h_q * (d // dd) // greatest((d - tsum) // dd, 1)
               END AS h_tie_q
        FROM hh
    )
    SELECT g.lang,
           g.n_j AS n_docs,
           g.r2_j AS doubled_rank_sum,
           CAST(g.r2_j * 1000 // (2 * g.n_j) AS BIGINT) AS mean_rank_milli,
           CAST(hc.h_q AS BIGINT) / 1e6 AS h_stat,
           CAST(hc.h_tie_q AS BIGINT) / 1e6 AS h_tie_corrected,
           CAST(CASE WHEN hc.n > hc.k
                THEN greatest(hc.h_tie_q - (hc.k - 1) * 1000000, 0)
                     // (hc.n - hc.k)
                ELSE 0 END AS BIGINT) / 1e6 AS epsilon_sq
    FROM g CROSS JOIN hc
    ORDER BY g.lang
    """,
    "KRUSKAL-WALLIS RANK TEST + EPSILON-SQUARED (Kruskal & Wallis "
    "1952 -- the NONPARAMETRIC twin of xek's one-way ANOVA in the "
    "bivariate-association matrix; rank-based, so heavy tails and "
    "outliers cannot dominate the way they can a variance "
    "decomposition): does document length differ by language, by "
    "ranks. NO global per-row sort: lengths collapse to a "
    "(value, count) histogram (the xcr Gini run-collapse idiom) and "
    "tie-aware DOUBLED average ranks are exact integers from ONE "
    "histogram cumsum window -- r2(v) = 2*cum(v) - cnt(v) + 1 (the "
    "spearman doubled-rank idiom) -- so per-language rank sums are "
    "exact BIGINTs at any corpus size. H = 12*sum(R_j^2/n_j)/(N(N+1)) "
    "- 3(N+1) with the group term quantized per group (error < 1 per "
    "group, bounded group count -- the xek T-idiom), G-shrink-guarded "
    "against the ~10x-decade overflow of A*1e6 (the xek gg idiom; the "
    "shrink divides numerator AND denominator, ceiling the divisor so "
    "the quotient cannot inflate); tie correction H/(1 - sum(t^3-t)/"
    "(N^3-N)) as one further guarded integer division. NO significance "
    "verdict: chi2(k-1) critical values depend on the data-driven "
    "group count (the xek/xe4 rule) -- the statistic and epsilon^2 "
    "effect size are the deliverable. EXPECTED HONEST NULL on these "
    "fixtures: generator doc lengths are lang-independent (xek "
    "measured F < 1). SCALE NOTE: the tie term needs N^3 - N, which "
    "overflows BIGINT loudly (ANSI) past ~2e6 rows -- bin lengths "
    "into coarser classes first at that scale (histogram semantics "
    "unchanged). H should sit near its null mean ~ k-1 and "
    "epsilon^2 near 0 -- the replica asserts that truthful null, not "
    "fake liveness (the r11 honest-null rule)",
    ("documents", "analytics", "text"),
)
def xg3_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    # ONE linear plan: the r14 before-bench caught the hv/g
    # double-consume shape racing its broadcast builds (per-pass jobs
    # wobbled 9<->13; eager checkpoints "fixed" determinism at 15 jobs
    # and ~2x wall). Instead every scalar rides the histogram rows:
    # per-v totals and the global rank cumsum as windows ON lv (RANGE
    # frame over ORDER BY v sums all ties -> identical cum(v)), the tie
    # term as a once-per-v guarded sum over the same unpartitioned
    # window, and the former tot/ties/h broadcast fan as `over ()`
    # windows on the 5-row per-language aggregate (the r7 xb9->xce
    # window-over-grouped-output idiom). No subtree is consumed twice,
    # so job counts cannot race. Integer expressions are byte-identical
    # to the oracle's.
    lv = (
        t["documents"]
        .select("lang", F.length("text").cast("long").alias("v"))
        .groupBy("lang", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wv = W.partitionBy("v")
    w_cum = W.orderBy("v")  # default RANGE frame: all rows with v' <= v
    w_all = W.partitionBy()
    lvx = lv.select(
        "lang",
        "v",
        "c",
        F.sum("c").over(wv).cast("long").alias("cv"),
        F.row_number().over(wv.orderBy("lang")).alias("rn_v"),
        F.sum("c").over(w_cum).cast("long").alias("cum"),
    ).select(
        "lang",
        "c",
        (2 * F.col("cum") - F.col("cv") + 1).cast("long").alias("r2"),
        F.sum(
            F.when(F.col("rn_v") == 1, F.expr("cv * cv * cv - cv"))
        )
        .over(w_all)
        .cast("long")
        .alias("tsum"),
    )
    g = lvx.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_j"),
        F.sum(F.col("c") * F.col("r2")).cast("long").alias("r2_j"),
        F.min("tsum").cast("long").alias("tsum"),
    )
    gx = (
        g.select(
            "lang",
            "n_j",
            "r2_j",
            "tsum",
            F.sum("n_j").over(w_all).cast("long").alias("n"),
            F.count(F.lit(1)).over(w_all).cast("long").alias("k"),
            F.sum(F.expr("(r2_j * r2_j) div (4 * n_j)"))
            .over(w_all)
            .cast("long")
            .alias("a"),
        )
        .withColumn("d", F.expr("n * n * n - n"))
        .withColumn(
            "h_q",
            F.expr(
                "((12 * (a div greatest(a div 700000000000, 1)) * 1000000)"
                " div ((n * (n + 1)) div greatest(a div 700000000000, 1)"
                "      + CASE WHEN (n * (n + 1))"
                "             % greatest(a div 700000000000, 1) > 0"
                "        THEN 1 ELSE 0 END))"
                " - 3 * (n + 1) * 1000000"
            ),
        )
        .withColumn("dd", F.expr("greatest(d div 1000000, 1)"))
        .withColumn(
            "h_tie_q",
            F.expr(
                "CASE WHEN tsum = 0 THEN h_q"
                " ELSE h_q * (d div dd) div greatest((d - tsum) div dd, 1) END"
            ),
        )
    )
    return gx.select(
        "lang",
        F.col("n_j").alias("n_docs"),
        F.col("r2_j").alias("doubled_rank_sum"),
        F.expr("r2_j * 1000 div (2 * n_j)").cast("long").alias("mean_rank_milli"),
        (F.col("h_q").cast("long") / 1e6).alias("h_stat"),
        (F.col("h_tie_q").cast("long") / 1e6).alias("h_tie_corrected"),
        (
            F.expr(
                "CAST(CASE WHEN n > k"
                " THEN greatest(h_tie_q - (k - 1) * 1000000, 0) div (n - k)"
                " ELSE 0 END AS BIGINT)"
            )
            / 1e6
        ).alias("epsilon_sq"),
    ).orderBy("lang")


_IPF_ROW_TARGETS = (("de", 150000), ("en", 400000), ("es", 100000),
                    ("fr", 150000), ("zh", 200000))
_IPF_COL_TARGETS = ((0, 300000), (1, 400000), (2, 300000))
_IPF_ROUNDS = 5


def _ipf_round_sql(r: int) -> str:
    """One IPF round as oracle CTEs (the kcore/bpe unrolled-chain
    idiom): the u-step reads v{r-1}, the v-step reads u{r} — each CTE
    is bounded (5 + 3 rows) and MATERIALIZED."""
    return f"""u{r} AS MATERIALIZED (
        SELECT t.lang,
               CASE WHEN COALESCE(s.s, 0) = 0 THEN 0
                    ELSE (n.n * t.t * 1000000) // s.s END AS u
        FROM rt t
        LEFT JOIN (
            SELECT c.lang, CAST(sum(c.c * v.v) AS BIGINT) AS s
            FROM cells c JOIN v{r - 1} v ON v.b = c.b GROUP BY c.lang
        ) s ON s.lang = t.lang
        CROSS JOIN n
    ),
    v{r} AS MATERIALIZED (
        SELECT t.b,
               CASE WHEN COALESCE(s.s, 0) = 0 THEN 0
                    ELSE (n.n * t.t * 1000000) // s.s END AS v
        FROM ct t
        LEFT JOIN (
            SELECT c.b, CAST(sum(c.c * u.u) AS BIGINT) AS s
            FROM cells c JOIN u{r} u ON u.lang = c.lang GROUP BY c.b
        ) s ON s.b = t.b
        CROSS JOIN n
    )"""


def _ipf_oracle_sql() -> str:
    rows = ", ".join(f"('{l}', {t})" for l, t in _IPF_ROW_TARGETS)
    cols = ", ".join(f"({b}, {t})" for b, t in _IPF_COL_TARGETS)
    rounds = ",\n    ".join(_ipf_round_sql(r) for r in range(1, _IPF_ROUNDS + 1))
    R = _IPF_ROUNDS
    return f"""
    WITH cells AS MATERIALIZED (
        SELECT lang, least(length(text) // 200, 2) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY lang, least(length(text) // 200, 2)
    ),
    n AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    rt AS (SELECT * FROM (VALUES {rows}) AS t(lang, t)),
    ct AS (SELECT * FROM (VALUES {cols}) AS t(b, t)),
    v0 AS (SELECT b, CAST(1000000 AS BIGINT) AS v FROM ct),
    {rounds},
    w AS MATERIALIZED (
        SELECT c.lang, c.b, c.c,
               (u.u * v.v) // 1000000 AS w_micro,
               c.c * ((u.u * v.v) // 1000000) AS kept_micro
        FROM cells c
        JOIN u{R} u ON u.lang = c.lang
        JOIN v{R} v ON v.b = c.b
    ),
    m AS (
        SELECT w.lang, w.b, w.c, w.w_micro, w.kept_micro,
               n.n * rt.t AS row_target_micro,
               CAST(sum(w.kept_micro) OVER (PARTITION BY w.lang) AS BIGINT)
                   AS row_achieved_micro,
               n.n * ct.t AS col_target_micro,
               CAST(sum(w.kept_micro) OVER (PARTITION BY w.b) AS BIGINT)
                   AS col_achieved_micro
        FROM w
        JOIN rt ON rt.lang = w.lang
        JOIN ct ON ct.b = w.b
        CROSS JOIN n
    )
    SELECT lang, b AS bucket, c AS n_docs, w_micro, kept_micro,
           row_target_micro, row_achieved_micro,
           col_target_micro, col_achieved_micro,
           CAST(max(greatest(abs(row_achieved_micro - row_target_micro),
                             abs(col_achieved_micro - col_target_micro)))
                OVER () AS BIGINT) AS max_gap_micro
    FROM m ORDER BY lang, b
    """


@query(
    "xg4_raking_ipf",
    _ipf_oracle_sql(),
    "SURVEY RAKING / ITERATIVE PROPORTIONAL FITTING (Deming & Stephan "
    "1940 -- corpus reweighting to TWO marginal targets at once, the "
    "two-axis generalization of the mixing family's single-marginal "
    "members xdt/temperature_mixture: a training-data pipeline that "
    "must hit a (language x length-bucket) target mix cannot get "
    "there with independent per-axis rates; IPF finds the rank-1 cell "
    "weights w_ij = u_i * v_j whose weighted marginals match both "
    "axes): 5 bounded rounds alternating u_i = row-target / "
    "sum_j(c_ij v_j) and v_j = col-target / sum_i(c_ij u_i), every "
    "half-step ONE exact integer division quantized to micro-units "
    "(the x66 quantize-at-source idiom -- both engines floor the same "
    "single quotient, so the whole trajectory is BIGINT-identical); "
    "degenerate zero denominators CASE-guarded on both sides (x73 "
    "rule; cannot fire while every lang/bucket is populated -- the "
    "contingency liveness is fixture-checked tri-SF). State is "
    "BOUNDED (5 u + 3 v values), so the engine collects the "
    "contingency table once (the kmeans/NFD bounded-collect pattern) "
    "and folds the rounds driver-side in integers (non-negative "
    "throughout, so python // == the engines' truncating division), "
    "then all emission arithmetic -- w_ij, kept mass, achieved vs "
    "target marginals, max gap -- runs IN-PLAN from two broadcast "
    "literal frames, mirroring the oracle's unrolled MATERIALIZED CTE "
    "chain (the kcore recipe). Scale shape: one corpus scan to the "
    "(lang, bucket) aggregate; everything after is O(cells). "
    "Liveness: achieved marginals land within max_gap_micro of "
    "targets (replica asserts gap < 1% of corpus mass -- raking "
    "converges geometrically on positive tables)",
    ("documents", "analytics", "sampling"),
)
def xg4_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    cells = (
        t["documents"]
        .select("lang", F.expr("least(length(text) div 200, 2)").alias("b"))
        .groupBy("lang", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cell_rows = [(r.lang, r.b, r.c) for r in cells.collect()]
    n = sum(c for _, _, c in cell_rows)
    row_t = dict(_IPF_ROW_TARGETS)
    col_t = dict(_IPF_COL_TARGETS)
    # integer IPF driver-side: all quantities non-negative, so python
    # // coincides with the engines' truncating division (the r8 pin
    # only bites on negatives)
    v = {b: 1_000_000 for b in col_t}
    u = {l: 0 for l in row_t}
    for _ in range(_IPF_ROUNDS):
        denom_l = {l: 0 for l in row_t}
        for l, b, c in cell_rows:
            denom_l[l] += c * v[b]
        u = {
            l: 0 if denom_l[l] == 0 else (n * row_t[l] * 1_000_000) // denom_l[l]
            for l in row_t
        }
        denom_b = {b: 0 for b in col_t}
        for l, b, c in cell_rows:
            denom_b[b] += c * u[l]
        v = {
            b: 0 if denom_b[b] == 0 else (n * col_t[b] * 1_000_000) // denom_b[b]
            for b in col_t
        }
    u_df = cells.sparkSession.createDataFrame(
        sorted(u.items()), "lang string, u long"
    )
    v_df = cells.sparkSession.createDataFrame(
        sorted(v.items()), "b long, v long"
    )
    rt_df = cells.sparkSession.createDataFrame(
        list(_IPF_ROW_TARGETS), "lang string, t long"
    )
    ct_df = cells.sparkSession.createDataFrame(
        list(_IPF_COL_TARGETS), "b long, t long"
    )
    w = (
        cells.join(F.broadcast(u_df), "lang")
        .join(F.broadcast(v_df), "b")
        .select(
            "lang",
            "b",
            "c",
            F.expr("(u * v) div 1000000").cast("long").alias("w_micro"),
            F.expr("c * ((u * v) div 1000000)").cast("long").alias("kept_micro"),
        )
    )
    m = (
        w.join(F.broadcast(rt_df), "lang")
        .join(F.broadcast(ct_df.withColumnRenamed("t", "tc")), "b")
        .select(
            "lang",
            "b",
            "c",
            "w_micro",
            "kept_micro",
            (F.lit(n) * F.col("t")).cast("long").alias("row_target_micro"),
            F.sum("kept_micro")
            .over(W.partitionBy("lang"))
            .cast("long")
            .alias("row_achieved_micro"),
            (F.lit(n) * F.col("tc")).cast("long").alias("col_target_micro"),
            F.sum("kept_micro")
            .over(W.partitionBy("b"))
            .cast("long")
            .alias("col_achieved_micro"),
        )
    )
    return m.select(
        "lang",
        F.col("b").alias("bucket"),
        F.col("c").alias("n_docs"),
        "w_micro",
        "kept_micro",
        "row_target_micro",
        "row_achieved_micro",
        "col_target_micro",
        "col_achieved_micro",
        F.max(
            F.greatest(
                F.abs(F.col("row_achieved_micro") - F.col("row_target_micro")),
                F.abs(F.col("col_achieved_micro") - F.col("col_target_micro")),
            )
        )
        .over(W.partitionBy())
        .cast("long")
        .alias("max_gap_micro"),
    ).orderBy("lang", "bucket")


_GMC_ROUNDS = 8


def _gmc_oracle_sql() -> str:
    """Greedy max-coverage oracle: 8 unrolled rounds (the kcore/bpe
    bounded-chain idiom). Every per-round CTE is MATERIALIZED — p{r}
    is consumed by BOTH cov{r} and the final union (the r8 rule:
    multiply-consumed CTEs otherwise inline into subtree copies)."""
    parts = []
    for r in range(1, _GMC_ROUNDS + 1):
        parts.append(f"""g{r} AS MATERIALIZED (
        SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS c
        FROM dw
        WHERE NOT EXISTS (SELECT 1 FROM cov{r - 1} cv WHERE cv.b = dw.b)
        GROUP BY dw.doc_id
    ),
    p{r} AS MATERIALIZED (
        SELECT doc_id, c FROM g{r} ORDER BY c DESC, doc_id LIMIT 1
    ),
    cov{r} AS MATERIALIZED (
        SELECT b FROM cov{r - 1}
        UNION
        SELECT dw.b FROM dw JOIN p{r} p ON dw.doc_id = p.doc_id
    )""")
    rounds = ",\n    ".join(parts)
    picks = "\n        UNION ALL ".join(
        f"SELECT {r} AS rnd, doc_id, c AS gain FROM p{r}"
        for r in range(1, _GMC_ROUNDS + 1)
    )
    return f"""
    WITH docs AS MATERIALIZED (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS ws
        FROM documents
    ),
    dw AS MATERIALIZED (
        SELECT DISTINCT doc_id, b FROM (
            SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS b
            FROM docs, unnest(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2
        )
    ),
    cov0 AS (SELECT CAST(NULL AS VARCHAR) AS b WHERE false),
    {rounds},
    picks AS ({picks}),
    tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS total FROM dw)
    SELECT p.rnd AS round,
           p.doc_id AS picked_doc,
           p.gain,
           CAST(sum(p.gain) OVER (ORDER BY p.rnd) AS BIGINT) AS covered,
           t.total AS universe,
           CAST(CAST(sum(p.gain) OVER (ORDER BY p.rnd) AS BIGINT) * 1000
                // t.total AS BIGINT) AS coverage_milli
    FROM picks p CROSS JOIN tot t
    ORDER BY p.rnd
    """


@query(
    "xg5_greedy_max_coverage",
    _gmc_oracle_sql(),
    "GREEDY MAX-COVERAGE DATA SELECTION (Nemhauser-Wolsey-Fisher 1978 "
    "-- the submodular-selection staple behind diverse few-shot / "
    "coreset / dedup-aware sampling: pick k documents maximizing "
    "covered BIGRAM vocabulary; the greedy pick carries the classic "
    "1 - 1/e approximation guarantee, and coverage over the fixture's "
    "CLOSED bigram class (916 bigrams, max 98 per doc -- probed "
    "tri-SF before building, the r11 unit-of-analysis rule) has real "
    "submodular structure where unigrams are degenerate: one doc "
    "holds all 31 words): 8 rounds, each = anti-filter the corpus "
    "bigram set against the covered set (a BOUNDED python InSet -- "
    "covered <= 8 * 98 strings, codegen'd membership, never a "
    "corpus-sized join), per-doc gain aggregation, argmax by "
    "(gain DESC, doc_id) via orderBy().limit(1) "
    "(TakeOrderedAndProject, the xco rule), then ONE bounded collect "
    "of the picked doc's bigrams (the kmeans bounded-collect "
    "pattern). Oracle = the same greedy as 8 unrolled MATERIALIZED "
    "CTE rounds (kcore recipe; p{r} is multiply-consumed). All "
    "integers; unique tie-breaks everywhere. The replica pins the "
    "SUBMODULARITY THEOREM on real data: greedy marginal gains are "
    "monotone non-increasing -- a strictly increasing gain would "
    "prove the implementation wrong, fixture-independent",
    ("documents", "text", "sampling"),
)
def xg5_greedy_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    ).filter(F.size("ws") >= 2)
    dw = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
                )
            ).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered: set = set()
    picks = []
    for r in range(1, _GMC_ROUNDS + 1):
        gains = dw
        if covered:
            gains = gains.filter(~F.col("b").isin(sorted(covered)))
        # ONE job per round: the argmax row carries its own (uncovered)
        # bigram list — collect_list is bounded (<= 98 bigrams/doc, the
        # probed fixture bound) and TakeOrderedAndProject ships only the
        # top-1 row, so this fuses the former second per-pick collect
        # (dw.filter(doc_id).collect()) into the argmax job. The union
        # with `covered` is identical: the doc's already-covered bigrams
        # are in `covered` by definition.
        top = (
            gains.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("c"),
                F.collect_list("b").alias("bs"),
            )
            .orderBy(F.col("c").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc, gain = top[0].doc_id, top[0].c
        picks.append((r, doc, gain))
        covered |= set(top[0].bs)
    picks_df = spark.createDataFrame(picks, "round long, picked_doc long, gain long")
    tot = dw.agg(F.countDistinct("b").cast("long").alias("universe"))
    from pyspark.sql.window import Window as W

    w_cum = W.orderBy("round").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        picks_df.crossJoin(F.broadcast(tot))
        .select(
            "round",
            "picked_doc",
            "gain",
            F.sum("gain").over(w_cum).cast("long").alias("covered"),
            "universe",
        )
        .select(
            "round",
            "picked_doc",
            "gain",
            "covered",
            "universe",
            F.expr("covered * 1000 div universe").cast("long").alias("coverage_milli"),
        )
        .orderBy("round")
    )


@query(
    "xg6_randomization_inference",
    """
    WITH arms AS MATERIALIZED (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5('ab:' || user_id), 1, 15))::BIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               max(CASE WHEN event_type = 'purchase' AND value > 250 THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    obs AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(converted) AS BIGINT) AS c_tot,
               CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT)
                   AS s_obs
        FROM arms
    ),
    spine AS (SELECT unnest(range(1, 200)) AS b),
    perm AS MATERIALIZED (
        SELECT s.b, a.converted,
               row_number() OVER (PARTITION BY s.b
                   ORDER BY md5('perm:' || s.b || ':' || a.user_id), a.user_id)
                   AS rk
        FROM arms a CROSS JOIN spine s
    ),
    stats AS MATERIALIZED (
        SELECT p.b,
               CAST(sum(CASE WHEN p.rk <= o.n_a THEN p.converted ELSE 0 END)
                    AS BIGINT) AS s_b
        FROM perm p CROSS JOIN obs o GROUP BY p.b
    ),
    ex AS (
        SELECT o.n, o.n_a, o.c_tot, o.s_obs,
               CAST(sum(CASE WHEN abs(s.s_b * o.n - o.n_a * o.c_tot)
                              >= abs(o.s_obs * o.n - o.n_a * o.c_tot)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM stats s CROSS JOIN obs o
        GROUP BY o.n, o.n_a, o.c_tot, o.s_obs
    )
    SELECT n AS n_users, n_a, c_tot AS conv_total, s_obs,
           CAST(n_a * c_tot * 1000 // n AS BIGINT) AS expected_milli,
           CAST(199 AS BIGINT) AS n_perms,
           n_extreme,
           ((1 + n_extreme) * 1000000 // 200) / 1e6 AS p_value
    FROM ex
    """,
    "RANDOMIZATION INFERENCE / PERMUTATION TEST (Fisher 1935 -- the "
    "experimentation family's FOURTH inference paradigm next to the "
    "parametric z (x73), the Poisson bootstrap (xds) and the "
    "sequential SPRT: exact finite-sample inference with NO "
    "distributional assumption, valid for any statistic): 199 "
    "DETERMINISTIC pseudo-permutations of the x73 arm assignment "
    "(rank users by md5('perm:' || b || ':' || user_id) per replicate "
    "-- the hash-ring determinism idiom; fixed margins, so pseudo-A "
    "is always exactly n_a users), statistic = conversions captured "
    "by pseudo-A, two-sided extremeness by the INTEGER "
    "cross-multiplication |s_b * N - n_a * C| >= |s_obs * N - n_a * "
    "C| (the hypergeometric mean n_a*C/N cleared of its denominator "
    "-- no float anywhere), p = (1 + n_extreme) / 200 via the "
    "round-6 integer count-ratio quantization. The arm and "
    "conversion definitions COPY x73's exact text (the r12 rule: a "
    "population defined by another operator's filter copies that "
    "filter verbatim). Honest null expected and asserted: arms are "
    "hash-random w.r.t. conversion, so p is non-extreme (0.535 at "
    "sf0.01). SCALE NOTE: fixed-margin permutation ranks B x N rows "
    "(one window per replicate) -- fine to millions of users x "
    "hundreds of replicates; at billions of users relax to binomial "
    "(per-(b,user) hash-bit) assignment, which drops the rank window "
    "and stays a valid randomization test with random margins",
    ("events", "analytics"),
)
def xg6_randomization_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = _t(spark, sf_dir)
    arms = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN event_type = 'purchase' AND value > 250"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("converted")
        )
        .select(
            "user_id",
            "converted",
            F.expr(
                "CASE WHEN cast(conv(substring(md5(concat('ab:', user_id)), 1, 15),"
                " 16, 10) as bigint) % 2 = 0 THEN 'A' ELSE 'B' END"
            ).alias("arm"),
        )
    )
    obs = arms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN arm = 'A' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_a"),
        F.sum("converted").cast("long").alias("c_tot"),
        F.sum(F.expr("CASE WHEN arm = 'A' THEN converted ELSE 0 END"))
        .cast("long")
        .alias("s_obs"),
    )
    spine = spark.range(1, 200).select(F.col("id").alias("b"))
    perm = arms.crossJoin(F.broadcast(spine)).select(
        "b",
        "converted",
        F.md5(
            F.concat(
                F.lit("perm:"), F.col("b").cast("string"), F.lit(":"),
                F.col("user_id").cast("string"),
            )
        ).alias("h"),
        "user_id",
    )
    w_b = W.partitionBy("b").orderBy("h", "user_id")
    stats = (
        perm.withColumn("rk", F.row_number().over(w_b))
        .crossJoin(F.broadcast(obs))
        .groupBy("b")
        .agg(
            F.sum(F.expr("CASE WHEN rk <= n_a THEN converted ELSE 0 END"))
            .cast("long")
            .alias("s_b"),
            F.first("n").alias("n"),
            F.first("n_a").alias("n_a"),
            F.first("c_tot").alias("c_tot"),
            F.first("s_obs").alias("s_obs"),
        )
    )
    ex = stats.groupBy("n", "n_a", "c_tot", "s_obs").agg(
        F.sum(
            F.expr(
                "CASE WHEN abs(s_b * n - n_a * c_tot)"
                " >= abs(s_obs * n - n_a * c_tot) THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_extreme")
    )
    return ex.select(
        F.col("n").alias("n_users"),
        "n_a",
        F.col("c_tot").alias("conv_total"),
        "s_obs",
        F.expr("n_a * c_tot * 1000 div n").cast("long").alias("expected_milli"),
        F.lit(199).cast("long").alias("n_perms"),
        "n_extreme",
        (F.expr("(1 + n_extreme) * 1000000 div 200").cast("long") / 1e6).alias(
            "p_value"
        ),
    )
