#!/usr/bin/env python
"""Skew-stress datapoint for the salted-join tooling.

Usage:
    python scripts/bench_skew.py [--passes N] [--out FILE]

Runs the k2 join-aggregate shape (orders ⋈ customer → per-segment
count + exact-cents revenue) on two corpora — the uniform-key
``.scratch/sf10`` (15M orders) and the heavy-skew ``.scratch/sf10zipf``
(same rows, o_custkey ~ Zipf(s=2): the hottest customer owns ~50% of
all orders — the null-key/default-value shape that actually kills
production shuffles; built by make_scaled_corpus.py /
make_skewed_corpus.py, and this script builds both if missing) —
under three plans:

  * ``plain_default``   — stock conf (AQE + auto-broadcast on): what a
    tuned Spark does when the dim side FITS in a broadcast. Baseline
    honesty row — at this scale the optimizer already wins.
  * ``plain_smj``       — auto-broadcast OFF and AQE skew-join OFF:
    the sort-merge shape a 100 TB join takes when the dim side is too
    big to broadcast and the deployment lacks (or the plan shape
    defeats) AQE's skew splitter. This is the row that degrades under
    a hot key.
  * ``salted_8`` / ``salted_16`` — same no-broadcast scenario, but
    through operators/skew.py ``salted_join``: the hot key spreads
    over N tasks while the dim side replicates ×N. Two bucket counts
    because they trade differently: 8 wins on ABSOLUTE time (less dim
    replication), 16 wins on skew-invariance (hot-key share per task
    approaches the uniform share) — the knob a deployment tunes to
    its own hot-key mass.

The claim under test (VERDICT r6 #5): salting keeps the zipf corpus
within ~1.5× of its uniform-corpus time, while ``plain_smj`` degrades.
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

UNIFORM = os.path.join(HERE, ".scratch", "sf10")
#: Two skew exponents (r7 verdict #8): s=2 concentrates ~50% of all
#: orders on the single hottest customer (the null-key/default-value
#: disaster shape) but its tail is thin, which flatters salting;
#: s=1.3 has a smaller hot key AND a fat tail of warm keys — the
#: harder, more production-like distribution where per-task balance
#: must come from spreading MANY moderately hot keys, not one.
ZIPFS = {
    "zipf_s2.0": (os.path.join(HERE, ".scratch", "sf10zipf"), "2.0"),
    "zipf_s1.3": (os.path.join(HERE, ".scratch", "sf10zipf13"), "1.3"),
}


def _ensure_corpora() -> None:
    if not os.path.exists(os.path.join(UNIFORM, "orders.parquet")):
        subprocess.run(
            [sys.executable,
             os.path.join(HERE, "scripts", "make_scaled_corpus.py"),
             "100", "/root/testdata/sf0.1", UNIFORM],
            check=True,
        )
    for zdir, exponent in ZIPFS.values():
        if not os.path.exists(os.path.join(zdir, "orders.parquet")):
            subprocess.run(
                [sys.executable,
                 os.path.join(HERE, "scripts", "make_skewed_corpus.py"),
                 UNIFORM, zdir, exponent],
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
    from trisk_datawrangle_spark.functions.scalars import exact_cents_sum
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
        elif variant.startswith("salted_"):
            set_conf(broadcast=False, skew_opt=False)
            j = salted_join(
                o, cc, ["o_custkey"],
                salt_buckets=int(variant.split("_")[1]),
            )
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

    variants = ["plain_default", "plain_smj", "salted_8", "salted_16"]
    corpora = {"uniform": UNIFORM}
    corpora.update({name: zdir for name, (zdir, _) in ZIPFS.items()})
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

    zipf_names = list(ZIPFS)
    ratios = {
        v: {
            z: round(times[v][z] / times[v]["uniform"], 2)
            for z in zipf_names
        }
        for v in variants
    }
    # earns its keep when, at EVERY tested exponent, (a) some salting
    # keeps the skewed run within the ~1.5x band plain plans blow
    # through, and (b) the best salted ABSOLUTE time on the skewed
    # corpus beats the plain sort-merge join there
    earns = all(
        min(ratios["salted_8"][z], ratios["salted_16"][z]) <= 1.5
        and min(times["salted_8"][z], times["salted_16"][z])
        < times["plain_smj"][z]
        for z in zipf_names
    )
    out = {
        "metric": "skew_join_seconds",
        "unit": "sec",
        "passes": args.passes,
        "corpus_uniform": UNIFORM,
        "corpora_zipf": {z: ZIPFS[z][0] for z in zipf_names},
        "times": times,
        "zipf_over_uniform": ratios,
        "salted_earns_keep": earns,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
