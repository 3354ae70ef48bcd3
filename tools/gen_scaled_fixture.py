#!/usr/bin/env python
"""Generate a scaled-up fixture for SCALING PROBES (never correctness:
the oracle gate stays on the driver's own /root/testdata fixtures).

Construction: tile the source SF k times with DISJOINT KEY SPACES
(every key column offset by copy * (max_key + 1); region/nation are
fixed dimension constants and stay untouched), plus a per-copy Caesar
cipher on document text — a length-preserving word bijection, so every
copy's INTRA-copy similarity structure (exact dups, shingle Jaccard,
MinHash collision probabilities) is exactly the source's, while
CROSS-copy similarity collapses to ~0. That is what "10x more data"
looks like to the dedup/graph family: 10x the clusters at the same
cluster diameter, never 10x denser clusters. Embeddings are tiled with
fresh vec_ids and unchanged vectors: 10x points in the same space =
denser IVF cells, which is the honest 10x for ANN.

Usage: python tools/gen_scaled_fixture.py [COPIES] [SRC_SF_DIR] [OUT_DIR]
Defaults: 10 /root/testdata/sf0.1 <repo>/.tmp/sf1
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key columns to offset, per table (max+1 of the source becomes the
# per-copy stride so copies never collide)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ("region", "nation")


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".tmp", "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied (fixed dimension)")

    lower = string.ascii_lowercase
    for t, keys in KEYED.items():
        strides = {
            k: con.execute(
                f"SELECT max({k}) + 1 FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            for k in keys
        }
        legs = []
        for c in range(copies):
            cols = ["*"]
            replaces = [f"{k} + {c * strides[k]} AS {k}" for k in keys]
            if t == "documents" and c > 0:
                # affine-cipher the text per copy (x -> a*x + b mod 26,
                # a coprime to 26): a length-preserving word bijection —
                # intra-copy dup/Jaccard structure exact, cross-copy
                # similarity ~0 (text is lowercase+space). Affine (312
                # distinct maps), not Caesar (26): at 100+ copies Caesar
                # would repeat and re-create cross-copy near-dups.
                a = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25][c % 12]
                b = (c // 12 + (1 if c % 12 == 0 else 0)) % 26
                mapped = "".join(
                    lower[(a * i + b) % 26] for i in range(26)
                )
                replaces.append(f"translate(text, '{lower}', '{mapped}') AS text")
            legs.append(
                f"SELECT * REPLACE ({', '.join(replaces)}) "
                f"FROM read_parquet('{src}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(legs)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({copies} copies)")


if __name__ == "__main__":
    main()
