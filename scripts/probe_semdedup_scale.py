#!/usr/bin/env python
"""High-SF probe of the SemDeDup scale contract: k grows with the
corpus so per-cluster pair volume stays flat.

The catalog entry (x31) pins k=8 for its sf0.01 oracle; at sf1 that
config's within-cluster quadratic already costs ~90 s (20k vectors /
8 clusters = 2.5k per cluster). This probe runs the SAME operator at
sf10 (200k vectors) with k scaled to keep ~E[cluster] ≈ corpus/k
vectors per cluster — the knob the semdedup docstring prescribes —
and exercises the large-k vectorized argmin path (k·dim > 4096).

    SPARK_GRAFT_SF_DIR=.scratch/sf10 python scripts/probe_semdedup_scale.py [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".scratch/sf10")
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.llm.clustering import semdedup
    from trisk_datawrangle_spark.sources.readers import load_tables

    spark = get_spark(
        app_name="semdedup-scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "128")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    embs = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    n = embs.count()
    t0 = time.perf_counter()
    out = semdedup(embs, "embedding", "vec_id", k=k, n_iter=2,
                   threshold=0.45)
    n_dup = out.filter("is_dup").count()
    elapsed = round(time.perf_counter() - t0, 2)
    print(json.dumps({
        "metric": "semdedup_scale_probe",
        "sf_dir": sf_dir,
        "n_vectors": n,
        "k": k,
        "argmin_path": "pandas" if k * 64 > 4096 else "literal",
        "n_dup": n_dup,
        "sec": elapsed,
    }))


if __name__ == "__main__":
    main()
