#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries to text files.

Usage:
    python scripts/explain_dump.py OUTDIR SUFFIX [name ...]

With no names, dumps the bench HEADLINE set. Writes
OUTDIR/<name>_<SUFFIX>.txt per query (the optimization-round
evidence files: plans/r12/<query>_before.txt / _after.txt).
Building the DataFrame does not execute it, so this is cheap; the
plan is the AQE initial plan (isFinalPlan=false), which is the
comparable artifact across code changes.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.catalog import QUERIES

    if not names:
        import bench

        names = bench.HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="explain-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001 — record per-query
            text = f"ERROR building {name}: {ex}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
