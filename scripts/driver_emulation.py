#!/usr/bin/env python
"""Emulate the correctness driver's t2 protocol under ITS Spark
configuration (Spark 4 defaults: ANSI on, NTZ parquet inference),
not the engine's (`session.py` pins ANSI off by default).

The last two rounds' only driver-side failures (d3's ANSI overflow,
the TIMESTAMP_NTZ casts) were invisible to the builder harness
because it ran engine conf. This script is the repeatable guard:

    python scripts/driver_emulation.py            # first 50 (window)
    python scripts/driver_emulation.py --all      # full catalog
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python scripts/driver_emulation.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        # driver-like: Spark 4 defaults, ANSI ON, no engine conf
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tests.oracle_harness as oh
    from __spark_entry__ import oracle_sql, queries

    q, o = queries(), oracle_sql()
    picked = [a for a in sys.argv[1:] if not a.startswith("--")]
    if picked:  # targeted re-verify: entry names or prefixes
        names = [
            n for n in q
            if any(n == p or n.startswith(p) for p in picked)
        ]
    else:
        names = list(q) if "--all" in sys.argv else list(q)[:50]
    con = oh.duck_connection(sf_dir)
    bad = 0
    t00 = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            ok, msg = oh.run_one(name, spark, con, sf_dir, q, o)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            ok, msg = False, str(ex).splitlines()[0][:200]
        tag = "OK " if ok else "FAIL"
        if not ok:
            bad += 1
        print(f"{tag} {name}: {msg} ({time.perf_counter() - t0:.1f}s)")
    print(f"{len(names) - bad}/{len(names)} green in "
          f"{time.perf_counter() - t00:.0f}s at {sf_dir}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
