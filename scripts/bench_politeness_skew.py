#!/usr/bin/env python
"""Mega-host skew datapoint for the politeness scheduler.

Usage:
    python scripts/bench_politeness_skew.py [--rows N] [--passes K]

The x57 politeness plan is one window per host. Real frontiers are
zipfian — one mega-host can own half the URLs — and a single window
partition then serializes half the corpus through one task (the
classic straggler). The documented composition (x57 docstring,
llm/politeness.py) shards known-big hosts by first path segment so
the window key becomes (host, shard). This script MEASURES that
claim at sf10-ish scale instead of arguing it:

  * ``flat_uniform``   — 15M URLs over 50k hosts, one window per
    host: the baseline the catalog entry models.
  * ``flat_skew``      — same rows, but host0 owns 50% of them,
    same plan: the straggler row.
  * ``sharded_skew``   — same skewed rows, ``big_hosts=[0]`` with 16
    path-prefix shards: the row that must recover.
  * ``sharded_uniform``— the overhead-honesty row: sharding a
    uniform corpus must cost ~nothing.

Correctness gates EVERY pass (not sampled):
  * all variants see the same row count;
  * non-mega hosts produce BIT-IDENTICAL (slot, eta) under sharding
    (checked via an order-independent hash aggregate);
  * within every (host0, shard): max(slot) == count AND
    sum(eta) == delay * n(n-1)/2 — the schedule arithmetic itself.

Output: one JSON line with per-variant medians and the skew
penalties; the round record lands in BENCH_SKEW_r{N}.json and the
measured table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_HOSTS = 50_000
N_SHARDS = 16


def build(spark, rows: int, skew: bool):
    from pyspark.sql import functions as F

    ids = spark.range(rows)
    i = F.col("id")
    h = (i % N_HOSTS).cast("long")
    if skew:
        # host 0 owns every even row: 50% of the corpus — the
        # null-key/default-value shape that kills single-partition
        # windows, same hot-share as bench_skew.py's zipf s=2
        h = F.when(i % 2 == 0, F.lit(0)).otherwise(h)
    canon = F.concat(
        F.lit("https://host"), h.cast("string"),
        F.lit(".example.com/p"),
        F.pmod(F.xxhash64(i), F.lit(64)).cast("string"),
        F.lit("/u"), i.cast("string"),
    )
    # every 7th host publishes NO delay: the coalesce-default path
    # stays on the measured plan
    delay = F.when(h % 7 == 0, F.lit(None).cast("double")).otherwise(
        (h % 3).cast("double") + F.lit(1.0)
    )
    return ids.select(
        h.alias("h"), canon.alias("canon"), delay.alias("crawl_delay")
    )


def run_variant(spark, frontier, big_hosts):
    from pyspark.sql import functions as F

    from trisk_datawrangle_spark.llm.politeness import (
        politeness_schedule,
    )

    sched = politeness_schedule(
        frontier, big_hosts=big_hosts, n_shards=N_SHARDS
    )
    t0 = time.perf_counter()
    # force the whole schedule; the hash makes the check
    # order-independent and value-complete (a wrong slot anywhere
    # flips it)
    agg = sched.select(
        F.count(F.lit(1)).alias("n"),
        F.sum("slot").alias("slot_sum"),
        F.sum(
            F.xxhash64("h", "canon", "slot", "eta_sec")
        ).alias("h_all"),
        F.sum(
            F.when(
                F.col("h") != 0,
                F.xxhash64("h", "canon", "slot", "eta_sec"),
            ).otherwise(F.lit(0))
        ).alias("h_small"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 3)
    return wall, agg, sched


def check_mega_shards(sched):
    """Schedule arithmetic inside every (host0, shard): max slot ==
    count and sum(eta) == delay*n(n-1)/2 (host0 is a no-delay host,
    so delay == the 1.0 default — the coalesce path is load-bearing
    here)."""
    from pyspark.sql import functions as F

    rows = (
        sched.where(F.col("h") == 0)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("slot").alias("mx"),
            F.sum("eta_sec").alias("eta"),
        )
        .collect()
    )
    assert rows, "mega host produced no rows"
    for r in rows:
        assert r["mx"] == r["n"], ("slot gap", r)
        want = 1.0 * r["n"] * (r["n"] - 1) / 2
        assert abs(r["eta"] - want) < 1e-6, ("eta arithmetic", r)
    return len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=15_000_000)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from trisk_datawrangle_spark import get_spark

    spark = get_spark(
        app_name="politeness-skew",
        master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    uniform = build(spark, args.rows, skew=False)
    skewed = build(spark, args.rows, skew=True)
    variants = {
        "flat_uniform": (uniform, None),
        "sharded_uniform": (uniform, [0]),
        "flat_skew": (skewed, None),
        "sharded_skew": (skewed, [0]),
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    n_mega_shards = None
    for p in range(args.passes):
        aggs = {}
        for name, (frontier, big) in variants.items():
            wall, agg, sched = run_variant(spark, frontier, big)
            walls[name].append(wall)
            aggs[name] = agg
            print(f"  pass {p} {name}: {wall}s n={agg['n']}",
                  file=sys.stderr)
            if name == "sharded_skew" and p == 0:
                n_mega_shards = check_mega_shards(sched)
        # gates: same row count everywhere; small hosts bit-identical
        ns = {a["n"] for a in aggs.values()}
        assert len(ns) == 1, f"row counts diverge: {ns}"
        assert (
            aggs["flat_skew"]["h_small"]
            == aggs["sharded_skew"]["h_small"]
        ), "sharding changed a small host's schedule"
        # (host 0 exists in the uniform corpus too — with 1/50000 of
        # the rows — so its schedule legitimately re-shards; the
        # invariance claim is about every OTHER host)
        assert (
            aggs["flat_uniform"]["h_small"]
            == aggs["sharded_uniform"]["h_small"]
        ), "sharding a uniform corpus changed a small host's schedule"
    med = {k: round(statistics.median(v), 3) for k, v in walls.items()}
    out = {
        "metric": "politeness_skew",
        "rows": args.rows,
        "n_hosts": N_HOSTS,
        "hot_share": 0.5,
        "n_shards": N_SHARDS,
        "mega_shards_used": n_mega_shards,
        "passes": args.passes,
        "median_sec": med,
        "all_sec": walls,
        "skew_penalty_flat": round(
            med["flat_skew"] / med["flat_uniform"], 2
        ),
        "skew_penalty_sharded": round(
            med["sharded_skew"] / med["flat_uniform"], 2
        ),
        "shard_overhead_uniform": round(
            med["sharded_uniform"] / med["flat_uniform"], 2
        ),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
