#!/usr/bin/env python
"""Skew-stress datapoint for the salted-join tooling.

Usage:
    python scripts/bench_skew.py [--passes N] [--out FILE]

Runs the k2 join-aggregate shape (orders ⋈ customer → per-segment
count + exact-cents revenue) on two corpora — the uniform-key
``.scratch/sf1`` and the zipfian-key ``.scratch/sf1zipf`` (built by
make_scaled_corpus.py / make_skewed_corpus.py; this script builds
them if missing) — under three plans:

  * ``plain_default``   — stock conf (AQE + auto-broadcast on): what a
    tuned Spark does when the dim side FITS in a broadcast. Baseline
    honesty row — at this scale the optimizer already wins.
  * ``plain_smj``       — auto-broadcast OFF and AQE skew-join OFF:
    the sort-merge shape a 100 TB join takes when the dim side is too
    big to broadcast and the deployment lacks (or the plan shape
    defeats) AQE's skew splitter. This is the row that degrades under
    a hot key.
  * ``salted``          — same no-broadcast scenario, but through
    operators/skew.py ``salted_join`` (8 buckets): the hot key
    spreads over 8 tasks while the dim side replicates ×8.

The claim under test (VERDICT r6 #5): ``salted`` on the zipf corpus
stays ≤ ~1.5× its uniform-corpus time, while ``plain_smj`` degrades.
Correctness gate: all three plans must produce IDENTICAL aggregates
per corpus (salting and conf must be output-invariant) — checked
every pass, not sampled.

Output: one JSON line with per-variant medians and the skew ratios;
the round record lands in BENCH_SKEW_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

UNIFORM = os.path.join(HERE, ".scratch", "sf1")
ZIPF = os.path.join(HERE, ".scratch", "sf1zipf")


def _ensure_corpora() -> None:
    if not os.path.exists(os.path.join(UNIFORM, "orders.parquet")):
        subprocess.run(
            [sys.executable,
             os.path.join(HERE, "scripts", "make_scaled_corpus.py")],
            check=True,
        )
    if not os.path.exists(os.path.join(ZIPF, "orders.parquet")):
        subprocess.run(
            [sys.executable,
             os.path.join(HERE, "scripts", "make_skewed_corpus.py")],
            check=True,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    _ensure_corpora()

    from pyspark.sql import functions as F

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.functions.aggregates import exact_cents_sum
    from trisk_datawrangle_spark.operators.skew import salted_join

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_skew",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def load(sf_dir):
        o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        return o, c

    def agg(joined):
        return joined.groupBy(
            F.col("c_mktsegment").alias("segment")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            exact_cents_sum("o_totalprice").alias("revenue"),
        )

    # conf knobs are runtime-settable; save/restore around each run
    def set_conf(broadcast: bool, skew_opt: bool) -> None:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            "10485760" if broadcast else "-1",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if skew_opt else "false",
        )

    def run(sf_dir, variant):
        o, c = load(sf_dir)
        cc = c.withColumnRenamed("c_custkey", "o_custkey")
        if variant == "plain_default":
            set_conf(broadcast=True, skew_opt=True)
            j = o.join(cc, ["o_custkey"])
        elif variant == "plain_smj":
            set_conf(broadcast=False, skew_opt=False)
            j = o.join(cc, ["o_custkey"])
        elif variant == "salted":
            set_conf(broadcast=False, skew_opt=False)
            j = salted_join(o, cc, ["o_custkey"], salt_buckets=8)
        else:
            raise ValueError(variant)
        t0 = time.monotonic()
        rows = agg(j).collect()
        dt = time.monotonic() - t0
        set_conf(broadcast=True, skew_opt=True)
        key = tuple(sorted(
            (r["segment"], r["n"], f"{r['revenue']:.2f}") for r in rows
        ))
        return dt, key

    variants = ["plain_default", "plain_smj", "salted"]
    corpora = {"uniform": UNIFORM, "zipf": ZIPF}
    times: dict[str, dict[str, float]] = {v: {} for v in variants}
    for cname, cdir in corpora.items():
        answers = set()
        for v in variants:
            run(cdir, v)  # warm (JIT + page cache), unrecorded
            samples = []
            for _ in range(args.passes):
                dt, key = run(cdir, v)
                samples.append(dt)
                answers.add(key)
            times[v][cname] = round(statistics.median(samples), 3)
        if len(answers) != 1:
            raise SystemExit(
                f"CORRECTNESS FAILURE on {cname}: variants disagree "
                f"({len(answers)} distinct aggregates)"
            )

    ratios = {
        v: round(times[v]["zipf"] / times[v]["uniform"], 2)
        for v in variants
    }
    out = {
        "metric": "skew_join_seconds",
        "unit": "sec",
        "passes": args.passes,
        "corpus_uniform": UNIFORM,
        "corpus_zipf": ZIPF,
        "times": times,
        "zipf_over_uniform": ratios,
        "salted_earns_keep": (
            ratios["salted"] <= 1.5 and ratios["plain_smj"] > ratios["salted"]
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
