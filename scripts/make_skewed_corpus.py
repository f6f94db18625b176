#!/usr/bin/env python
"""Generate a zipfian-key variant of a corpus's orders table.

Usage:
    python scripts/make_skewed_corpus.py [SRC_DIR] [OUT_DIR] [S]

Defaults: SRC=.scratch/sf1, OUT=.scratch/sf1zipf, S=1.0 (the Zipf
exponent; raise it to concentrate — s=2 puts ~50% of all orders on
the single hottest customer, the "null-key / default-value" shape
that actually kills shuffles in production).

The salted-join / skew tooling (operators/skew.py, catalog k1/k2) was
validated only on the shipped corpora, whose foreign keys are
near-uniform — the one key distribution where skew tools are pure
overhead. This script rewrites ``orders.o_custkey`` to follow a
Zipf(s) law over the EXISTING customer keys so the skew claims get a
measured datapoint (scripts/bench_skew.py) instead of an argument:

  * rank sampling is inverse-CDF on the continuous truncated-Zipf
    density r^-s over [1, N+1): for s=1,
    ``rank = floor(exp(u * ln(N)))`` gives P(rank=r) ∝ ln(1+1/r) ≈
    1/r (hottest key ~1/ln(N) ≈ 6% of orders at N=150k); for s≠1,
    ``rank = floor((1 + u*(N^(1-s) - 1))^(1/(1-s)))`` — at s=2 the
    hottest key absorbs ~half of ALL orders, so one sort-merge task
    owns half the fact table, the shape AQE-less plans die on;
  * u is a deterministic per-order uniform from xxhash-style integer
    mixing of o_orderkey — reruns are bit-identical, no RNG state;
  * ranks map to real customer keys via a dense row_number over
    customer, so referential integrity holds and the aggregate
    results stay oracle-checkable (the join output changes, but
    plain-join == salted-join must STILL hold — that invariant is the
    bench's correctness gate);
  * every other column of orders, and every other table, is copied
    through unchanged (same schema, same row count).

Only ``orders`` and ``customer`` are written — the skew bench joins
exactly these two; keeping the output minimal makes the corpus cheap
to regenerate.
"""

from __future__ import annotations

import os
import sys

import duckdb

# Knuth multiplicative hash constant (public domain, TAOCP §6.4) —
# spreads sequential orderkeys uniformly over 31 bits.
MIX = 2654435761
MOD = 2**31


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, ".scratch", "sf1")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, ".scratch", "sf1zipf")
    s = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    n_cust = con.sql(
        f"SELECT count(*) FROM '{src}/customer.parquet'").fetchone()[0]

    con.sql(
        f"COPY (SELECT * FROM '{src}/customer.parquet') "
        f"TO '{out}/customer.parquet' (FORMAT PARQUET)"
    )

    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{src}/orders.parquet'").fetchall()]
    passthrough = ", ".join(f"o.{c}" for c in cols if c != "o_custkey")

    # HUGEINT: replica-offset orderkeys reach ~1e10; ×MIX overflows INT64
    u = f"(((o.o_orderkey::HUGEINT * {MIX}) % {MOD}) / {MOD}.0)"
    if abs(s - 1.0) < 1e-9:
        rank = f"exp({u} * ln({n_cust}))"
    else:
        rank = (
            f"pow(1.0 + {u} * (pow({n_cust}, {1.0 - s}) - 1.0), "
            f"{1.0 / (1.0 - s)})"
        )
    con.sql(
        f"""
COPY (
  WITH ranked AS (
    SELECT c_custkey,
           row_number() OVER (ORDER BY c_custkey) AS rk
    FROM '{src}/customer.parquet'
  ),
  skewed AS (
    SELECT {passthrough},
      LEAST({n_cust}, GREATEST(1,
        CAST(floor({rank}) AS BIGINT))) AS rk
    FROM '{src}/orders.parquet' o
  )
  SELECT {passthrough.replace('o.', 's.')},
         r.c_custkey AS o_custkey
  FROM skewed s JOIN ranked r USING (rk)
) TO '{out}/orders.parquet' (FORMAT PARQUET)
"""
    )

    top = con.sql(
        f"""
SELECT o_custkey, count(*) AS n,
       round(100.0 * count(*) / (SELECT count(*)
           FROM '{out}/orders.parquet'), 2) AS pct
FROM '{out}/orders.parquet' GROUP BY 1 ORDER BY n DESC LIMIT 5
"""
    ).fetchall()
    n = con.sql(
        f"SELECT count(*) FROM '{out}/orders.parquet'").fetchone()[0]
    print(f"wrote {out}: {n} orders over {n_cust} customers")
    for k, c, p in top:
        print(f"  hot key {k}: {c} rows ({p}%)")


if __name__ == "__main__":
    main()
