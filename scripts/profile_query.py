#!/usr/bin/env python
"""Time one (or more) catalog queries in isolation — the per-query
measurement loop of the optimization rounds (guide §1: measure
first, noop sink, labeled jobs).

Usage:
    python scripts/profile_query.py [--passes N] name [name ...]

Prints per-query cold + warm-pass timings (same protocol as
bench.py: cold, one untimed shakeout, N timed warm passes with
caches cleared between) without the other 21 queries' noise, so a
single optimization's effect is measurable in ~30 s instead of a
full suite run.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.catalog import QUERIES
    from trisk_datawrangle_spark.operators.persist import (
        unpersist_all_rdds,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py so cold numbers mean the same thing
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd  # noqa: F401

    spark.range(10000).repartition(
        int(cpus) if cpus.isdigit() else 32
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    from trisk_datawrangle_spark.sources.readers import TABLES, load_tables

    for _t, df in load_tables(spark, sf_dir, TABLES).items():
        df.write.format("noop").mode("overwrite").save()

    def run(name: str) -> tuple[float, float]:
        """(total_sec, build_sec): build = the catalog callable
        (driver-side plan construction + any eager probe work),
        save = the noop action."""
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        return round(t2 - t0, 3), round(t1 - t0, 3)

    for name in args:
        spark.sparkContext.setJobDescription(name)
        # serving-probe entries: pre-build the memoized index like
        # bench.py does, so cold is probe+codegen, not build
        if name.endswith("_probe_serving"):
            QUERIES[name](spark, sf_dir)
        unpersist_all_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        cold, cold_b = run(name)
        spark.catalog.clearCache()
        run(name)  # untimed shakeout
        warm, builds = [], []
        for _ in range(passes):
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)
            t, b = run(name)
            warm.append(t)
            builds.append(b)
        print(
            f"{name}: cold={cold} warm_min={min(warm)} warm={warm} "
            f"build={builds}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
