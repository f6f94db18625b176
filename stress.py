#!/usr/bin/env python
"""Full-catalog stress run: execute EVERY `queries()` entry at
$SPARK_GRAFT_SF_DIR (default sf0.1 — 10× the driver's correctness
scale) and report failures and the slowest entries.

The driver's t2 protocol proves correctness at sf0.01; this proves
every entry still *executes sanely* one order of magnitude up — the
check that caught d5's 33s interpreted-HOF pair join. Run it after
adding operators:

    python stress.py            # sf0.1, full catalog
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python stress.py
    python stress.py c1 c3 d7   # only the named entries (prefix ok) —
                                # for targeted high-SF probes of one
                                # family without paying the whole sweep
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.catalog import QUERIES
    from trisk_datawrangle_spark.operators.persist import (
        unpersist_all_rdds,
    )

    # shuffle partitions must scale with the DATA, not the core count
    # (session.py's 128-256MB/partition rule): at sf10 a fixed 32
    # leaves each partition 10x oversized and the sort/join tiers
    # exhaust the heap before they can spill — seen, not hypothesized
    # (BASELINE.md round-7 sf10 section)
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE", cpus if cpus.isdigit() else "32"
    )
    spark = get_spark(
        app_name="trisk-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(shuffle),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    wanted = sys.argv[1:]
    names = sorted(
        n for n in QUERIES
        if not wanted or any(n == w or n.startswith(w + "_") or
                             n.startswith(w) for w in wanted)
    )
    times: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 2)
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            failed[name] = (str(ex).splitlines() or ["<no message>"])[0][:200]
        # full storage reset between entries: clearCache drops cached
        # plans but NOT localCheckpoint blocks — those pinned the heap
        # across entries until the sf10 probe OOMed on storage owned
        # by already-finished entries (operators/persist.py)
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)
        spark.sparkContext._jvm.System.gc()
        print(f"  {name}: {times.get(name, 'FAILED')}", file=sys.stderr)

    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    print(
        json.dumps(
            {
                "metric": "stress_catalog",
                "sf_dir": sf_dir,
                "n_queries": len(names),
                "n_failed": len(failed),
                "failed": failed,
                "total_sec": round(sum(times.values()), 1),
                "slowest": dict(slowest),
            }
        )
    )
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
