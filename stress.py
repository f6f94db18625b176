#!/usr/bin/env python
"""Full-catalog stress run: execute EVERY `queries()` entry at
$SPARK_GRAFT_SF_DIR (default sf0.1 — 10× the driver's correctness
scale) and report failures and the slowest entries.

The driver's t2 protocol proves correctness at sf0.01; this proves
every entry still *executes sanely* one order of magnitude up — the
check that caught d5's 33s interpreted-HOF pair join. Run it after
adding operators:

    python stress.py            # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python stress.py
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

    spark = get_spark(
        app_name="trisk-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 2)
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            failed[name] = (str(ex).splitlines() or ["<no message>"])[0][:200]
        spark.catalog.clearCache()
        print(f"  {name}: {times.get(name, 'FAILED')}", file=sys.stderr)

    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    print(
        json.dumps(
            {
                "metric": "stress_catalog",
                "sf_dir": sf_dir,
                "n_queries": len(QUERIES),
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
