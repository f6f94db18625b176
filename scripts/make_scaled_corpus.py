#!/usr/bin/env python
"""Generate a scaled-up copy of a test corpus by key-remapped
replication (default: 10x sf0.1 -> sf1 under .scratch/sf1).

Usage:
    python scripts/make_scaled_corpus.py [REPLICAS] [SRC_DIR] [OUT_DIR]

The driver ships sf{0.001,0.01,0.1}; BASELINE.md's scaling table needs
one order of magnitude above the bench scale to turn "the plans
survive 100x" from argument into extrapolation. Replication rules keep
referential integrity and avoid degenerate artifacts:

  * fact/dim keys (orderkey, custkey, partkey, suppkey, event_id,
    user_id, doc_id, vec_id) are offset by replica * stride so joins
    land on the matching replica — fk fan-outs scale linearly, no
    cross-replica key collisions;
  * region/nation are fixed dimensions (as in TPC-H: they do not
    scale with SF) and are copied as-is;
  * document text in replicas > 0 gets a replica-unique token spliced
    in every 4 words: cross-replica shingle Jaccard collapses to ~0
    (no artificial 10-way near-dup cliques that would inflate the
    dedup verifier tier quadratically), while WITHIN-replica dup
    structure is preserved (both sides of a near-dup pair get the
    same splice pattern);
  * embeddings in replica i are cyclically rotated by i dims: norms
    are preserved, directions change, so ANN queries see 10x distinct
    vectors instead of 10 exact copies of each (which would make
    top-k a tie-breaking exercise);
  * timestamps are kept as-is: event/window density scales 10x per
    window, the realistic shape of a bigger corpus over the same
    wall-clock span.
"""

from __future__ import annotations

import os
import sys

import duckdb

FIXED = ["region", "nation"]
KEYED = {
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 100_000_000  # far above any key in the shipped corpora


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scratch", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")

    for t, keys in KEYED.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"({c} + r.i * {STRIDE})::BIGINT AS {c}")
            elif t == "documents" and c == "text":
                # splice a replica token every 4 words (replica 0 is
                # untouched so the original dup structure survives)
                sel.append(
                    "CASE WHEN r.i = 0 THEN text ELSE regexp_replace("
                    "text, '((\\S+\\s+){4})', "
                    "'\\1zrep' || r.i || 'z ', 'g') END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN r.i = 0 THEN embedding ELSE "
                    "list_concat(embedding[r.i + 1:], "
                    "embedding[1:r.i]) END AS embedding"
                )
            else:
                sel.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM '{src}/{t}.parquet', "
            f"(SELECT unnest(range({replicas})) AS i) r "
            f"ORDER BY r.i) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows")

    print(f"wrote {out}")


if __name__ == "__main__":
    main()
