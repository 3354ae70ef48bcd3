"""Unit tests for the r3 training-pipeline operators: decontamination,
PII redaction, repetition stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_snowflake_spark.operators.decontam import ngram_overlap
from dask_snowflake_spark.operators.pii import PII_PATTERNS, redact
from dask_snowflake_spark.operators.text import repetition_stats


def test_ngram_overlap_basic(spark) -> None:
    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # contains eval 3-gram "b c d"
            (2, "x y z w q r"),     # no overlap
        ],
        ["doc_id", "text"],
    )
    evalset = spark.createDataFrame([(100, "b c d z z z")], ["doc_id", "text"])
    rows = {r.doc: r for r in ngram_overlap(train, evalset, n=3).collect()}
    assert rows[1].n_overlap == 1 and rows[1].n_shingles == 4
    assert rows[1].overlap_frac == 0.25
    assert rows[2].n_overlap == 0 and rows[2].overlap_frac == 0.0


def test_ngram_overlap_plan_broadcasts_eval(spark) -> None:
    train = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    evalset = spark.createDataFrame([(2, "a b c")], ["doc_id", "text"])
    plan = (
        ngram_overlap(train, evalset, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one broadcast LEFT join against the marked eval set feeds ONE
    # doc-keyed aggregation computing both counts (the old
    # semi-join + second agg + doc-join paid an extra corpus shuffle)
    import re

    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "LeftSemi" not in plan
    doc_exchanges = re.findall(r"hashpartitioning\(doc#\d+L, \d+\)", plan)
    assert len(doc_exchanges) == 1, plan


def test_redact_counts_and_placeholders(spark) -> None:
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.example.org or call 555-1234"),
            (2, "server at 10.0.3.1 and 192.168.0.255"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in redact(df, "text").collect()}
    assert rows[1].n_email == 1 and rows[1].n_phone == 1 and rows[1].n_ipv4 == 0
    assert "[EMAIL]" in rows[1].redacted and "[PHONE]" in rows[1].redacted
    assert "@" not in rows[1].redacted
    assert rows[2].n_ipv4 == 2 and rows[2].redacted.count("[IP]") == 2
    assert rows[3].redacted == "nothing sensitive here"
    assert rows[3].n_email == rows[3].n_phone == rows[3].n_ipv4 == 0


def test_pii_patterns_no_python_udf(spark) -> None:
    df = spark.createDataFrame([(1, "a@b.co")], ["doc_id", "text"])
    plan = redact(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats(spark) -> None:
    df = spark.createDataFrame(
        [
            (1, "the the the the cat"),   # 5 words, 2 distinct, top=4
            (2, "a b c d"),               # no repetition
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc: r for r in repetition_stats(df).collect()}
    assert rows[1].n_words == 5 and rows[1].n_distinct == 2
    assert rows[1].dup_word_frac == 0.6      # (5-2)*1e6 div 5 / 1e6
    assert rows[1].top_word_frac == 0.8      # 4*1e6 div 5 / 1e6
    assert rows[1].mean_word_len == 3.0      # (4*3 + 3)*1e6 div 5 = 3.0
    assert rows[2].dup_word_frac == 0.0 and rows[2].top_word_frac == 0.25


def test_patterns_are_re2_safe() -> None:
    # no backrefs / lookaround — the portability contract
    for _name, (pat, _repl) in PII_PATTERNS.items():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat


def test_gopher_rules_edges(spark) -> None:
    """Rule-based quality filter: empty text, punctuation blobs, digit
    dumps, and repeated-word spam all fail with named reasons; normal
    prose passes every rule."""
    from dask_snowflake_spark.operators.text import GOPHER_RULES, gopher_rules

    rows = [
        (0, "the cat sat on the mat and it is a fine day in town"),
        (1, ""),
        (2, "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( )))"),
        (3, "12345 67890 11111 22222 33333 44444 55555 66666"),
        (4, "spam spam spam spam spam spam spam spam spam spam the of"),
    ]
    out = {r.doc_id: r for r in gopher_rules(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}
    assert out[0].passes and out[0].reasons == ""
    assert not out[1].passes and "word_count" in out[1].reasons
    assert not out[2].passes and "symbol_ratio" in out[2].reasons
    assert not out[3].passes and "digit_ratio" in out[3].reasons
    assert not out[4].passes and "repetition" in out[4].reasons
    # reasons order is the registry order
    for r in out.values():
        names = [x for x in r.reasons.split(",") if x]
        assert names == [n for n in GOPHER_RULES if n in names]
    # no internal feature columns leak
    assert not [c for c in out[0].__fields__ if c.startswith("__gr_")]


def test_xa3_binaryfile_tree_memoization_is_content_fingerprinted(spark, sf_smoke):
    """The memoized binaryFile tree must be invalidated by CONTENT, not
    existence: fixtures regenerate between rounds while .tmp persists
    (the r4/r8 staleness lesson), so a tree written for older text must
    be rewritten, and a matching fingerprint must skip the write."""
    import os

    from dask_snowflake_spark.ext_queries import xa3_binaryfile_ingest
    from dask_snowflake_spark.queries import _scratch_dir

    # r10: scratch dirs are namespaced by source fixture (concurrent
    # sessions at different SFs raced on shared dirs), so the marker
    # lives in the per-fixture dir
    path = _scratch_dir("xa3_binfiles", sf_smoke)
    marker = path + ".fingerprint"

    first = xa3_binaryfile_ingest(spark, sf_smoke).collect()
    assert os.path.isfile(marker) and os.path.isdir(path)
    fp = open(marker).read()
    assert fp.startswith(sf_smoke + "|")

    # matching fingerprint: the tree is reused (mtime untouched by a
    # second run — the write would bump it)
    stamp = os.path.getmtime(marker)
    again = xa3_binaryfile_ingest(spark, sf_smoke).collect()
    assert again == first
    assert os.path.getmtime(marker) == stamp

    # corrupted fingerprint (stands in for regenerated fixtures): the
    # run must rewrite and restore a correct tree + marker
    with open(marker, "w") as fh:
        fh.write("stale|0")
    rebuilt = xa3_binaryfile_ingest(spark, sf_smoke).collect()
    assert rebuilt == first
    assert open(marker).read() == fp

    # missing tree with intact marker: must also rewrite
    import shutil

    shutil.rmtree(path)
    rebuilt2 = xa3_binaryfile_ingest(spark, sf_smoke).collect()
    assert rebuilt2 == first and os.path.isdir(path)


def test_bpe_learn_matches_reference_python(spark, sf_smoke):
    """text.bpe_learn == a reference-faithful python BPE (Sennrich et
    al.: position-overlapping pair counts, lexicographic-smallest
    argmax tie-break, greedy left-to-right non-overlapping merge) on
    the fixture corpus — merges, counts and symbol totals all equal."""
    from collections import Counter

    from dask_snowflake_spark.operators.text import bpe_learn
    from dask_snowflake_spark.queries import _t

    docs = _t(spark, sf_smoke)["documents"]
    word_counts = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split():
            if len(w) >= 2:
                word_counts[w] += 1

    def naive(rounds):
        state = {w: list(w) for w in word_counts}
        out = []
        for rnd in range(1, rounds + 1):
            stats: Counter = Counter()
            for w, syms in state.items():
                f = word_counts[w]
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += f
            if not stats:
                break
            top = max(stats.values())
            a, b = min(p for p, c in stats.items() if c == top)
            for w, syms in state.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                state[w] = merged
            out.append(
                (rnd, a, b, a + b, top, sum(len(s) for s in state.values()))
            )
        return out

    got = sorted(map(tuple, bpe_learn(docs, rounds=4).collect()))
    assert got == naive(4)


def test_bpe_learn_greedy_run_semantics(spark):
    """The window-only greedy must match reference non-overlapping
    left-to-right semantics on symbol RUNS: 'aaaa' + merge (a,a) ->
    [aa, aa]; 'aaa' -> [aa, a] (one merge, not two overlapping)."""
    from dask_snowflake_spark.operators.text import bpe_learn

    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaa ba")], "doc_id long, text string"
    )
    rows = {r.round: r for r in bpe_learn(df, rounds=2).collect()}
    # round 1: (a,a) = 3 positions x cnt 2 ("aaaa") + 2 x 1 ("aaa") = 8
    # (overlapping positions, corpus-weighted over the DISTINCT vocab);
    # after greedy: aaaa->[aa,aa], aaa->[aa,a], ba->[b,a] — state is one
    # row per (distinct word, symbol): 6
    r1 = rows[1]
    assert (r1.left_sym, r1.right_sym, r1.n_occurrences) == ("a", "a", 8)
    assert r1.symbols_after == 6
    # round 2: pairs now (aa,aa)=2, (aa,a)=1, (b,a)=1 -> winner (aa,aa)
    r2 = rows[2]
    assert (r2.left_sym, r2.right_sym, r2.merged, r2.n_occurrences) == (
        "aa", "aa", "aaaa", 2
    )
    assert r2.symbols_after == 5


def test_bpe_learn_fused_sizes_tiebreak_and_exhaustion(spark):
    """The r14 fused argmax+size collect (need_sizes path): the
    min-over-(-n, sym, nxt)-structs argmax must break an exact count
    TIE by lexicographically smallest (left, right), and a corpus that
    runs OUT of pairs before ``rounds`` must still fill the last
    merge's symbols_after (patched by the empty next round's collect,
    not a dedicated count)."""
    from dask_snowflake_spark.operators.text import bpe_learn

    # 'zx' and 'ab' both contribute exactly one pair occurrence:
    # (z,x) and (a,b) tie at n=1 -> (a,b) must win the tie.
    tie = spark.createDataFrame(
        [(1, "zx ab")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in bpe_learn(tie, rounds=1).collect()]
    assert rows == [(1, "a", "b", "ab", 1, 3)]  # state: [ab], [z, x]

    # rounds=3 over a corpus exhausted after round 2: both executed
    # rounds must come back with exact symbols_after, the missing
    # third round with no row at all (bounded-cap posture).
    short = spark.createDataFrame(
        [(1, "abc abc")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in bpe_learn(short, rounds=3).collect()]
    # vocab = {abc: 2}; r1 merges (a,b) n=2 -> [ab, c] (2 symbols),
    # r2 merges (ab,c) n=2 -> [abc] (1 symbol), r3 finds no pairs.
    assert rows == [
        (1, "a", "b", "ab", 2, 2),
        (2, "ab", "c", "abc", 2, 1),
    ]


def test_bpe_segment_merge_identity_and_totals(spark, sf_smoke):
    """xd9's min_word_len=1 learning claim: length-1 words carry no
    adjacent pairs, so the learned merges equal the length>=2
    vocabulary's exactly; and the per-doc token counts equal a python
    re-segmentation of each document under those merges."""
    from dask_snowflake_spark.operators.text import bpe_learn, bpe_segment
    from dask_snowflake_spark.queries import _t

    docs = _t(spark, sf_smoke)["documents"]
    m1 = [tuple(r) for r in bpe_learn(docs, rounds=3, min_word_len=1).collect()]
    m2 = [tuple(r) for r in bpe_learn(docs, rounds=3, min_word_len=2).collect()]
    # merges identical; symbols_after differs by exactly the number of
    # length-1 vocab entries (present in the min_len=1 state, absent
    # from the min_len=2 one)
    assert [m[:5] for m in m1] == [m[:5] for m in m2]

    merges = [(m[1], m[2]) for m in m1]

    def segment(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = {r.doc_id: r for r in bpe_segment(docs, rounds=3).collect()}
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in r.text.split() if w]
        assert got[r.doc_id].n_words == len(words)
        assert got[r.doc_id].n_chars == sum(len(w) for w in words)
        assert got[r.doc_id].n_bpe_tokens == sum(segment(w) for w in words), r.doc_id


def _min_rank_apply(word: str, rank: dict) -> list:
    """Reference frozen-table BPE apply (Sennrich apply_bpe / HF BPE):
    loop 'merge ALL occurrences of the lowest-rank pair present,
    greedy left-to-right; repeat until no pair is in the table'."""
    syms = list(word)
    while len(syms) >= 2:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [p for p in pairs if p in rank]
        if not ranked:
            break
        a, b = min(ranked, key=lambda p: rank[p])
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def test_bpe_encode_matches_min_rank_loop_replica(spark):
    """text.bpe_encode applies the frozen table ONCE PER RANK IN RANK
    ORDER; the production algorithm loops on the MIN-RANK pair present.
    They are equal for formation-ordered tables (a merge only creates
    adjacencies through its merged symbol, whose containing pairs rank
    later) — pin that equivalence on a corpus where a LOWER rank's
    output feeds a HIGHER rank ((a,a) then (aa,a)), on symbol runs, on
    unseen characters, and on an empty-ish doc."""
    from dask_snowflake_spark.operators.text import _bpe_iterate, bpe_encode

    train = spark.createDataFrame(
        [(1, "aaa aaa aa a"), (2, "aaa bc")], "doc_id long, text string"
    )
    merges, _ = _bpe_iterate(train, "text", rounds=5, min_word_len=1)
    pairs = [(m[1], m[2]) for m in merges]
    # the table must exercise the chained-rank case for the pin to
    # mean anything
    assert ("a", "a") in pairs and any(a == "aa" or b == "aa" for a, b in pairs)
    rank = {p: i for i, p in enumerate(pairs)}

    held = spark.createDataFrame(
        [
            (10, "aaaaa aaaa zzz"),   # run longer than any train word + unseen char
            (11, "bca aab"),          # unseen words from seen chars
            (12, "q"),                # single unseen char
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bpe_encode(held, pairs).collect()}

    for doc_id, text in [(10, "aaaaa aaaa zzz"), (11, "bca aab"), (12, "q")]:
        words = [w for w in text.split() if w]
        toks = [t for w in words for t in _min_rank_apply(w, rank)]
        n_merged = sum(1 for t in toks if len(t) >= 2)
        r = got[doc_id]
        assert (r.n_words, r.n_bpe_tokens, r.n_merged_tokens) == (
            len(words), len(toks), n_merged
        ), f"doc {doc_id}: {list(r)} vs replica {len(words)},{len(toks)},{n_merged}"
        assert r.tokens_per_word == (len(toks) * 1_000_000 // max(len(words), 1)) / 1e6

    # zero-merge table == character tokenizer (total-function contract)
    char_rows = {r.doc_id: r for r in bpe_encode(held, []).collect()}
    assert char_rows[12].n_bpe_tokens == 1
    assert char_rows[10].n_bpe_tokens == len("aaaaa") + len("aaaa") + len("zzz")
    assert all(r.n_merged_tokens == 0 for r in char_rows.values())


def test_bloom_false_positive_path_and_merge(spark):
    """xf7's honest null (zero FPs at 0.8% fill) needs its own pin: a
    TINY 1-word (62-bit) index over 20 keys (~72% fill) must produce a
    false positive for some absent probe — found by replaying the
    identical md5 bit math in python — and the bloom must MERGE: two
    shard indexes bit_or'd word-wise equal the union index (the
    property that makes it the cross-shard membership structure)."""
    import hashlib

    from pyspark.sql import functions as F

    from dask_snowflake_spark.operators.decontam import (
        BLOOM_BITS_PER_WORD,
        BLOOM_K,
        bloom_build,
        bloom_probe,
    )

    members = [f"key{i}" for i in range(20)]
    m_bits = 1 * BLOOM_BITS_PER_WORD

    def positions(k):
        h = hashlib.md5(f"bl:{k}".encode()).hexdigest()
        return {int(h[r * 6 : r * 6 + 6], 16) % m_bits for r in range(BLOOM_K)}

    covered = set()
    for k in members:
        covered |= positions(k)
    fp = next(
        c
        for c in (f"absent{i}" for i in range(100_000))
        if positions(c) <= covered
    )
    tn = next(
        c
        for c in (f"clean{i}" for i in range(100_000))
        if not (positions(c) <= covered)
    )

    mdf = spark.createDataFrame([(k,) for k in members], "key string")
    bloom = bloom_build(mdf, n_words=1)
    probes = spark.createDataFrame([(fp,), (tn,)], "key string")
    got = {
        r.probe_key: (r.n_bits_set, r.bloom_says)
        for r in bloom_probe(bloom, probes, key_col="key", n_words=1).collect()
    }
    assert got[fp][1] is True  # false positive fires
    assert got[tn][1] is False  # a clear bit proves absence

    # mergeability: shard blooms bit_or'd == union bloom
    a = bloom_build(
        spark.createDataFrame([(k,) for k in members[:10]], "key string"), n_words=1
    )
    b = bloom_build(
        spark.createDataFrame([(k,) for k in members[10:]], "key string"), n_words=1
    )
    merged = (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in bloom.collect()
    )
    # the merge law preserves the parameter-fingerprint metadata row
    # (same-parameter shards OR identical fingerprints), so the merged
    # index stays probeable
    got_merged = {
        r.probe_key: r.bloom_says
        for r in bloom_probe(merged, probes, key_col="key", n_words=1).collect()
    }
    assert got_merged[tn] is False


def test_bloom_probe_rejects_mismatched_build_params(spark):
    """bloom_probe must raise loudly (not silently return false
    negatives) when probed with a different n_words or seed than the
    index was built with — positions shift and missing word_idx rows
    would read as all-zero bits otherwise (ADVICE r12). The guard is
    the word_idx=-1 fingerprint metadata row, validated in a consumed
    expression so Catalyst cannot prune it."""
    import pytest

    from dask_snowflake_spark.operators.decontam import bloom_build, bloom_probe

    mdf = spark.createDataFrame([(f"key{i}",) for i in range(20)], "key string")
    probes = spark.createDataFrame([("key0",), ("nope",)], "key string")

    bloom2 = bloom_build(mdf, n_words=2, seed="bl")
    # wrong n_words
    with pytest.raises(Exception, match="bloom_probe: index metadata"):
        bloom_probe(bloom2, probes, key_col="key", n_words=1, seed="bl").collect()
    # wrong seed
    with pytest.raises(Exception, match="bloom_probe: index metadata"):
        bloom_probe(bloom2, probes, key_col="key", n_words=2, seed="other").collect()
    # matching parameters pass and probe a present key as maybe-present
    ok = {
        r.probe_key: r.bloom_says
        for r in bloom_probe(
            bloom2, probes, key_col="key", n_words=2, seed="bl"
        ).collect()
    }
    assert ok["key0"] is True
    # a metadata-free (hand-built) frame is rejected too
    data_only = bloom2.filter("word_idx >= 0")
    with pytest.raises(Exception, match="bloom_probe: index metadata"):
        bloom_probe(data_only, probes, key_col="key", n_words=2, seed="bl").collect()


def test_bloom_join_prune_census_replica(spark, sf_oracle):
    """bloom_join_prune == a python replica replaying the identical
    md5 bit math over the real fixture; pins the operator laws in the
    production join-pruning role: zero false negatives (any clear bit
    proves absence), the structurally-impossible (says=false,
    member=true) cell never appears, and the FP path carries REAL
    traffic (the r12 bloom row's zero-FP honest null, closed by the
    deliberately small 32-word index)."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from dask_snowflake_spark.queries import registry

    M = 32 * 62
    con = duckdb.connect()
    dim = {
        str(r[0])
        for r in con.execute(
            f"SELECT DISTINCT c_custkey FROM '{sf_oracle}/customer.parquet'"
            " WHERE c_mktsegment = 'BUILDING'"
        ).fetchall()
    }
    probes = con.execute(
        f"SELECT o_custkey, count(*) FROM '{sf_oracle}/orders.parquet'"
        " GROUP BY o_custkey"
    ).fetchall()

    def positions(k):
        h = hashlib.md5(f"jp:{k}".encode()).hexdigest()
        return {int(h[r * 6 : r * 6 + 6], 16) % M for r in range(4)}

    bits = set()
    for k in dim:
        bits |= positions(k)
    cells = defaultdict(lambda: [0, 0, 0, 0, 0])  # keys, rows, fp, neg, pass
    fp_tot = neg_tot = pass_rows = all_rows = 0
    for ck, n_rows in probes:
        k = str(ck)
        says = positions(k) <= bits
        member = k in dim
        assert not (member and not says)  # no false negatives, ever
        c = cells[(says, member)]
        c[0] += 1
        c[1] += n_rows
        fp_tot += 1 if says and not member else 0
        neg_tot += 0 if member else 1
        pass_rows += n_rows if says else 0
        all_rows += n_rows
    fp_rate = (fp_tot * 1_000_000 // max(neg_tot, 1)) / 1e6
    passed = (pass_rows * 1_000_000 // max(all_rows, 1)) / 1e6
    want = sorted(
        (says, member, c[0], c[1], fp_rate, 0, passed)
        for (says, member), c in cells.items()
    )
    got = sorted(
        tuple(r)
        for r in registry()["bloom_join_prune"]
        .spark_fn(spark, sf_oracle)
        .collect()
    )
    assert got == want
    assert (False, True) not in cells  # impossible cell absent
    assert fp_tot > 0  # the FP path carries real traffic here
