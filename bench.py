#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "suite_seconds", "value": N, "unit": "sec",
 "queries": {name: sec, ...}, "sf": 0.1}

Each query is fully materialized via the noop sink (all columns
computed, nothing collected to the driver) — measures engine time,
not pandas conversion.

Measurement protocol (round 5 — make the number unimpeachable):
  * pre-flight load gate: wait (bounded) for 1-min loadavg to drop
    below a threshold before starting, and before each cold pass, so
    a transient spike on a shared box cannot contaminate a sample;
  * fixed-work calibration timings before and after the suite
    quantify box speed — if "calibration" before/after disagree
    wildly, the run was contaminated and says so in the JSON;
  * min-of-N: each query runs 1 cold pass (pays whole-stage-codegen
    JIT — amortizes to zero on real inputs), 1 untimed shakeout pass
    (JVM tiered compilation keeps recompiling for a run or two after
    cold; a timed pass landing there can read warm > cold), then
    WARM_PASSES (>=3) timed warm passes with stage caches cleared
    between; "queries_warm" is the MIN of the warm passes (robust to
    one-off spikes) and "queries_spread" records [min, max] so
    variance is visible;
  * per-query fault isolation: a failing query records an error but
    never aborts the suite; when errors is non-empty, "value" is
    null and "complete" is false so partial totals are never
    silently compared against full historical runs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "flagship_market_share",  # spine + interpolation + 2 windows
    "a1_pricing_summary",     # wide aggregate scan
    "a4_median",              # exact percentile
    "j2_inner_join_revenue",  # fact + 2 broadcast dims
    "w8_interpolate_keep_edges",
    "w9_lm_extrapolate",
    "e1_tumbling_window",
    "d1_exact_dedup",
    "d2_ngram_jaccard",       # co-shingle join, exact verifier
    "d3_minhash_lsh",         # shingle→sign→band→bucket join
    "fin_layered_median_cascade",  # §3.2 layered exact-median impute
    "s1_cosine_topk",         # brute-force ANN baseline
    "x3_quality_score",
    "x4_fingerprint",
    "m1_multimodal_decode",   # Arrow/pandas plumbing
    "e3_asof_join",           # union+LOCF as-of (one shuffle)
    "s4_ivf_topk",            # IVF ANN: train + assign + full probe
    "q3_shipping_priority",   # fact-fact shuffled joins + top-k
    # index SERVING latency: build is memoized per process, so the
    # cold pass absorbs it and warm passes measure probe-only — the
    # number a deployment serves queries at (write-lifecycle cost
    # stays visible in the catalog's d13/s7 entries, measured by the
    # sf-scaling sweep)
    "d13_probe_serving",
    "s7_probe_serving",
    # crawl-tier representative (r9: the family gained 10 entries and
    # had no bench presence): HTML strip + URL canonicalize are the
    # two chains every fetched page crosses. Appended AFTER the
    # historical 20, so the r1-comparable subset and all prior
    # per-query comparisons stay intact.
    "x46_html_extract",
    "x52_url_canonicalize",
]

WARM_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
#: Recorded idle-box calibration band (BASELINE.md "bench protocol"):
#: the t1' record runs measured calibrate() at 0.44-0.51 s; 0.47 is
#: the center. A probe outside ±CALIB_TOL of it means the box is not
#: running at record speed (contended, or a different machine) and
#: the JSON is stamped comparable=false — the r9 committed bench was
#: a 0.754 s-probe contended run that read as a phantom 1.4×
#: regression until manually adjudicated.
CALIB_IDLE_SEC = 0.47
CALIB_TOL = 0.20

#: Parallel-calibration band (r10 verdict Missing #4): the r10 close
#: measured a box whose SINGLE-thread probe sat dead in the idle
#: band while every untouched query ran a uniform 1.36× slower —
#: multicore throughput (cgroup quota, SMT topology, a neighbor on
#: the socket) is invisible to the scalar probe. Field data, three
#: rounds (the r11 verdict's accrual plan): r10-committed
#: 0.368/0.379 s, r11 idle runs 0.350-0.41 s, r12 idle runs
#: 0.346-0.40 s — idle spread ±9% around 0.375; the r10-divergent
#: box fluctuated 0.36-0.61 s (its 0.61 side is +63%, still
#: flagged). Band center 0.375 s; tolerance tightened 35% → 25%
#: (r11 verdict #8 — three rounds of data admit every idle reading
#: with ≥2× margin while keeping the divergent box out), still
#: wider than the scalar's (process-pool startup rides in the
#: number) and applied to BOTH probes individually — a
#: throughput-fluctuating box (the diagnosed failure mode) shows an
#: out-of-band reading on at least one side even when the pair's
#: min looks idle.
CALIB_PAR_IDLE_SEC = 0.375
CALIB_PAR_TOL = 0.25

#: Minimum base reading the super-linear flag divides by (r12): a
#: sub-second sf0.1 warm time is noise-dominated (±50%+ between
#: comparable runs), so raw ratios over it flag box variance, not
#: asymptotics. max(base, floor) keeps the gate meaningful: any
#: genuinely quadratic core's big-side time dwarfs factor × 1 s.
_RATIO_BASE_FLOOR_SEC = 1.0

# 1-min loadavg above this means someone else is burning the box.
# Headline queries here are parallel but short — background noise of
# a few busy cores is what poisoned round 4's cold samples.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "8.0"))


def loadavg1() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except Exception:  # noqa: BLE001 — non-Linux fallback
        return 0.0


def wait_for_idle(max_wait: float, label: str) -> float:
    """Bounded wait for the box to quiesce; returns the loadavg seen."""
    deadline = time.monotonic() + max_wait
    load = loadavg1()
    while load > LOAD_GATE and time.monotonic() < deadline:
        print(f"  load gate ({label}): loadavg {load} > {LOAD_GATE}, waiting",
              file=sys.stderr)
        time.sleep(5.0)
        load = loadavg1()
    return load


def calibrate() -> float:
    """Fixed single-thread busy-work timing (seconds). A contaminated
    box shows a visibly larger number; before/after disagreement
    brackets the whole run."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(5_000_000):
        acc += i ^ (i >> 3)
    _ = acc
    return round(time.perf_counter() - t0, 4)


def _calibrate_worker(_):
    acc = 0
    for i in range(2_000_000):
        acc += i ^ (i >> 3)
    return acc


def calibrate_parallel() -> float:
    """The same busy-work on EVERY core at once (processes — the GIL
    makes threads useless for this). Single-thread probes miss
    multi-core throughput differences (cgroup CPU quota, thermal
    limits, SMT topology, a neighbor saturating the socket), which
    shift the WHOLE suite uniformly while calibrate() reads in-band
    — the r10 close measured exactly that: single-thread probe
    0.449 s (band-identical to the r8 record's 0.451 s) while every
    untouched query ran a uniform ~1.36× slower. Recorded in the
    JSON (calibration_parallel_sec) so cross-round readers can
    separate engine deltas from box-throughput deltas; a gate band
    accrues once a few rounds carry the field."""
    import concurrent.futures

    n = os.cpu_count() or 1  # every core — a cap would skew the
    # cross-box comparisons this field exists to enable
    t0 = time.perf_counter()
    with concurrent.futures.ProcessPoolExecutor(n) as ex:
        list(ex.map(_calibrate_worker, range(n)))
    return round(time.perf_counter() - t0, 4)


def parse_args(argv):
    import argparse

    ap = argparse.ArgumentParser(
        description="headline bench; default sf dir from "
        "$SPARK_GRAFT_SF_DIR"
    )
    ap.add_argument(
        "--sf",
        default=None,
        help="scale factor: uses /root/testdata/sf{X}, falling back "
        "to scripts/make_scaled_corpus.py's .scratch/sf{X} output "
        "for factors the driver does not ship (e.g. 1)",
    )
    ap.add_argument(
        "--sf-dir", default=None, help="explicit data dir (wins over --sf)"
    )
    ap.add_argument(
        "--compare",
        default=None,
        metavar="BENCH_JSON",
        help="path to a prior bench JSON from a SMALLER scale: emit "
        "per-query warm/cold time ratios against it and flag "
        "super-linear queries",
    )
    ap.add_argument(
        "--scale-factor",
        type=float,
        default=None,
        help="row-count ratio between this run and --compare's "
        "(default: ratio of the two sf fields); a query whose WARM "
        "ratio exceeds it is flagged super_linear (warm is the "
        "truer compute signal — cold amortizes fixed codegen/setup); "
        "cold-only exceedances land in super_linear_cold_only",
    )
    return ap.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args.sf is not None:
        cand = f"/root/testdata/sf{args.sf}"
        if not os.path.isdir(cand):
            cand = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".scratch",
                f"sf{args.sf}",
            )
        if not os.path.isdir(cand):
            print(
                f"bench: no data for sf{args.sf} (run "
                "scripts/make_scaled_corpus.py first)",
                file=sys.stderr,
            )
            raise SystemExit(2)
        sf_dir = cand
    if args.sf_dir is not None:
        sf_dir = args.sf_dir
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.catalog import QUERIES
    from trisk_datawrangle_spark.operators.persist import (
        unpersist_all_rdds,
    )

    load_start = wait_for_idle(max_wait=120.0, label="suite start")
    calib_before = calibrate()
    calib_par_before = calibrate_parallel()

    spark = get_spark(
        app_name="trisk-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus if cpus.isdigit() else "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial job
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # Python/Arrow worker warmup: the first mapInPandas pays worker
    # spawn + pandas import across all cores (~5s on local[32]) —
    # steady-state pipelines (and any long-lived cluster) never see
    # that again, so it doesn't belong in per-query numbers
    import pandas as _pd  # noqa: F401

    spark.range(10000).repartition(
        int(cpus) if cpus.isdigit() else 32
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    # touch every input once: file-index build + OS page cache warm,
    # so per-query numbers measure the engine, not first-read I/O
    from trisk_datawrangle_spark.sources.readers import TABLES, load_tables

    for tname, df in load_tables(spark, sf_dir, TABLES).items():
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001 — warmup only, not fatal
            print(f"  warmup {tname}: {ex}", file=sys.stderr)

    # pre-build the memoized serving indexes (untimed): the probe
    # entries exist to record SERVING latency, and their index build
    # is a once-per-deployment cost — constructing the DataFrame
    # triggers the build via _served_index_path's process cache, so
    # the timed cold pass then measures probe + codegen only (the
    # write-lifecycle cost stays visible in d13/s7's catalog entries)
    for _pname in ("d13_probe_serving", "s7_probe_serving"):
        if _pname in QUERIES:
            try:
                QUERIES[_pname](spark, sf_dir)
            except Exception as ex:  # noqa: BLE001 — warmup only
                print(f"  index prewarm {_pname}: {ex}", file=sys.stderr)

    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    def run(name: str) -> float | None:
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # noqa: BLE001 — record, keep benching
            errors[name] = (str(ex).splitlines() or ["<no message>"])[0][:300]
            return None
        return round(time.perf_counter() - t0, 3)

    jvm_gc = spark.sparkContext._jvm.System.gc

    for name in HEADLINE:
        # the cold pass pays codegen exactly once and cannot be
        # re-sampled — gate it on box idleness instead (bounded wait)
        # and drain accumulated JVM garbage first so a full-GC pause
        # from the PREVIOUS query's shuffles never lands inside this
        # query's single cold sample. localCheckpoint blocks from the
        # previous query are freed explicitly first — clearCache
        # can't reach them and they'd otherwise pin storage until GC
        # (operators/persist.py)
        unpersist_all_rdds(spark)
        jvm_gc()
        wait_for_idle(max_wait=30.0, label=name)
        cold = run(name)
        if cold is None:
            print(f"  {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        times[name] = cold
        # one untimed shakeout pass: profile-guided JIT keeps
        # recompiling hot methods for 1-2 runs after the cold pass
        # (measured: w9's passes go 4.6 -> 2.3 -> 1.6 -> 1.3 in
        # isolation), and a timed warm pass that lands on the 2.3
        # would report warm > cold — a physically-impossible reading
        # for a steady-state metric
        spark.catalog.clearCache()
        run(name)
        passes: list[float] = []
        for _ in range(WARM_PASSES):
            # drop stage-boundary caches so each warm pass re-does the
            # compute (steady-state), not a cache lookup (overstated)
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)
            w = run(name)
            if w is None:
                break
            passes.append(w)
        if passes:
            # the cold sample is itself a complete steady-state
            # execution plus codegen, so it upper-bounds warm time —
            # include it in the min so a query whose cold pass rode an
            # earlier query's shared codegen (w9 after w8) can never
            # report warm > cold by a few ms of pass-to-pass noise.
            # Never invents a number: every candidate is an observed
            # full run.
            warm[name] = min([*passes, cold])
            spread[name] = [min(passes), max(passes)]
        print(
            f"  {name}: {times[name]}s (warm min {warm.get(name)}s "
            f"of {passes})",
            file=sys.stderr,
        )

    calib_after = calibrate()
    calib_par_after = calibrate_parallel()
    load_end = loadavg1()

    # Calibration gate (r9 verdict #1): round-over-round deltas are
    # only readable when the box speed matches the recorded idle
    # band — the committed r9 JSON read 1.4× slower across the board
    # purely because the probe ran at 0.754 s vs the 0.44-0.51 s
    # record band, and adjudicating that cost a forensic re-run. The
    # MIN of the two probes estimates true box speed (contention
    # only inflates); outside ±CALIB_TOL of CALIB_IDLE_SEC the JSON
    # is stamped comparable=false — still printed (the driver needs
    # the line), but flagged so nobody reads box noise as a
    # regression OR a fast-box reading as a win.
    calib_best = min(calib_before, calib_after)
    calib_dev = round(calib_best / CALIB_IDLE_SEC - 1.0, 3)
    scalar_comparable = abs(calib_dev) <= CALIB_TOL
    # the parallel gate (r10 verdict Missing #4): BOTH probes must
    # sit in the multicore band — min() would miss the fluctuating-
    # quota box the r10 diagnosis actually caught
    calib_par_dev = round(
        max(calib_par_before, calib_par_after) / CALIB_PAR_IDLE_SEC
        - 1.0,
        3,
    )
    par_comparable = all(
        abs(v / CALIB_PAR_IDLE_SEC - 1.0) <= CALIB_PAR_TOL
        for v in (calib_par_before, calib_par_after)
    )
    comparable = scalar_comparable and par_comparable

    complete = not errors and len(times) == len(HEADLINE)
    total = round(sum(times.values()), 3) if complete else None
    # the r1-comparable historical set = the first 20 HEADLINE
    # entries; later family representatives append AFTER it, so
    # suite-level totals carry an explicit continuity subtotal and a
    # headline_n marker instead of silently changing meaning across
    # rounds
    hist = HEADLINE[:20]
    hist_total = (
        round(sum(times[q] for q in hist), 3)
        if all(q in times for q in hist) else None
    )
    hist_warm = (
        round(sum(warm[q] for q in hist), 3)
        if all(q in warm for q in hist) else None
    )
    out = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "headline_n": len(HEADLINE),
        "value_historical_20": hist_total,
        "warm_historical_20": hist_warm,
        "queries": times,
        "queries_warm": warm,
        "queries_spread": spread,
        "warm_value": round(sum(warm.values()), 3) if complete else None,
        "warm_passes": WARM_PASSES,
        "complete": complete,
        "errors": errors,
        "loadavg": {"start": load_start, "end": load_end},
        "calibration_sec": {"before": calib_before, "after": calib_after},
        "calibration_parallel_sec": {
            "before": calib_par_before, "after": calib_par_after,
        },
        "comparable": comparable,
        "calibration_band": {
            "idle_sec": CALIB_IDLE_SEC,
            "tolerance": CALIB_TOL,
            "deviation": calib_dev,
        },
        "calibration_parallel_band": {
            "idle_sec": CALIB_PAR_IDLE_SEC,
            "tolerance": CALIB_PAR_TOL,
            "deviation": calib_par_dev,
            "comparable": par_comparable,
        },
        "sf": sf,
    }
    if not scalar_comparable:
        print(
            f"  WARNING: calibration {calib_best}s deviates "
            f"{calib_dev:+.0%} from the {CALIB_IDLE_SEC}s idle band "
            f"— JSON stamped comparable=false (box noise, not an "
            f"engine delta)",
            file=sys.stderr,
        )
    if not par_comparable:
        print(
            f"  WARNING: parallel calibration "
            f"{calib_par_before}/{calib_par_after}s outside "
            f"±{CALIB_PAR_TOL:.0%} of the {CALIB_PAR_IDLE_SEC}s "
            f"multicore band — JSON stamped comparable=false (the "
            f"r10-diagnosed failure mode: single-thread matches, "
            f"multicore throughput doesn't)",
            file=sys.stderr,
        )
    if args.compare:
        with open(args.compare) as fh:
            base = json.load(fh)
        if "parsed" in base:  # driver-recorded BENCH_r*.json wrapper
            base = base["parsed"]
        factor = args.scale_factor
        if factor is None and sf and base.get("sf"):
            factor = sf / base["sf"]
        ratios: dict[str, dict[str, float]] = {}
        super_linear: list[str] = []
        cold_only: list[str] = []
        for name in times:
            b_cold = base.get("queries", {}).get(name)
            b_warm = base.get("queries_warm", {}).get(name)
            r = {}
            if b_cold:
                r["cold"] = round(times[name] / b_cold, 2)
            if b_warm and name in warm:
                r["warm"] = round(warm[name] / b_warm, 2)
            ratios[name] = r
            # The WARM ratio alone flags super-linear: warm is the
            # truer compute signal (cold amortizes fixed codegen and
            # scan setup, which can mask a quadratic core — the r7
            # lesson: d2's warm 13.7× at 10× data hid behind a cold
            # 8.3×). When a query has no warm sample, cold decides.
            # Cold-only exceedances are still recorded separately so
            # a noisy cold reading can't cry wolf in the main list.
            # Flagging measures the BIG side against max(base,
            # _RATIO_BASE_FLOOR_SEC) — a sub-second base carries
            # ±50%+ run-to-run noise (d2's sf0.1 warm read 0.62 s
            # and 1.31 s on comparable r12/r11 runs with no code
            # change, swinging the raw per-10× ratio 7-15×), while
            # a genuinely super-linear core dwarfs the floor at the
            # big scale anyway. The recorded ratios stay raw.
            if factor:
                w_flag = (
                    warm[name]
                    > factor * max(b_warm, _RATIO_BASE_FLOOR_SEC)
                    if b_warm and name in warm
                    else None
                )
                c_flag = (
                    times[name]
                    > factor * max(b_cold, _RATIO_BASE_FLOOR_SEC)
                    if b_cold
                    else None
                )
                primary = w_flag if w_flag is not None else c_flag
                if primary:
                    super_linear.append(name)
                elif w_flag is not None and c_flag:
                    cold_only.append(name)
        # the calibration gate applies to COMPARISONS above all: a
        # ratio between runs on differently-fast boxes is box noise
        # wearing a regression costume (the r9 lesson). Either side
        # flagged (or the baseline predating the flag reading as
        # contended via its own probes) poisons every ratio.
        base_calib = base.get("calibration_sec") or {}
        _base_probes = [
            v for v in (
                base_calib.get("before"), base_calib.get("after"),
            ) if v is not None
        ]
        # a partial record from a crashed run can carry a non-empty
        # dict with both probes null — min() over that is a crash,
        # not a verdict
        base_probe = min(_base_probes) if _base_probes else None
        base_comparable = base.get("comparable")
        if base_comparable is None and base_probe is not None:
            # pre-gate baseline JSON: derive the verdict from its
            # recorded probes under the same band
            base_comparable = (
                abs(base_probe / CALIB_IDLE_SEC - 1.0) <= CALIB_TOL
            )
        # the parallel axis (r10 verdict Missing #4): a baseline
        # stamped comparable BEFORE the multicore gate existed
        # (r10's own JSON) re-derives here — its recorded parallel
        # probes must sit in the band too, else its scalar-only
        # verdict is exactly the blind spot the gate closes
        base_par = base.get("calibration_parallel_sec") or {}
        _par_probes = [
            v for v in (base_par.get("before"), base_par.get("after"))
            if v is not None
        ]
        if _par_probes and not all(
            abs(v / CALIB_PAR_IDLE_SEC - 1.0) <= CALIB_PAR_TOL
            for v in _par_probes
        ):
            base_comparable = False
        ratios_comparable = comparable and base_comparable is not False
        if not ratios_comparable:
            print(
                "  WARNING: --compare across calibration-flagged "
                f"run(s) (this={comparable}, base={base_comparable})"
                " — ratios and super_linear reflect box speed, not "
                "the engine",
                file=sys.stderr,
            )
        out["compare"] = {
            "base_sf": base.get("sf"),
            "scale_factor": factor,
            "ratios": ratios,
            "super_linear": sorted(super_linear),
            "super_linear_cold_only": sorted(cold_only),
            "comparable": ratios_comparable,
            "base_calibration_min": base_probe,
        }
    print(json.dumps(out))
    spark.stop()
    # always exit 0: the JSON line (with its "errors" field) IS the
    # signal — a nonzero rc would make harnesses drop the parsed
    # numbers, which is exactly the failure mode this guards against
    if errors:
        print(f"bench: {len(errors)} queries errored", file=sys.stderr)


if __name__ == "__main__":
    main()
