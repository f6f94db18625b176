#!/usr/bin/env python
"""High-SF probe of the r8 DEFAULT pair tiers (r7 verdict #2): the
named composites d7/c3/d14 now default to candidate-bounded pair
generation — this script proves the default configurations COMPLETE
at sf10 (the scale where their former exhaustive defaults spilled
>60 GB and died, BASELINE.md r7) and records wall times for the
scaling narrative.

d7/c3 run exactly the catalog configuration (LSH 64x16 @ 0.8 — the
banding is corpus-size-independent). d14's k-means k scales with the
corpus (k ~ n/2000, the semantic_dedup docstring knob; the catalog
pins k=8 only for its fixture-scale oracle).

    SPARK_GRAFT_SF_DIR=.scratch/sf10 SPARK_GRAFT_SHUFFLE=256 \
        python scripts/probe_default_tiers.py
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

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.llm.clustering import semantic_dedup
    from trisk_datawrangle_spark.llm.components import (
        dedup_clusters_pipeline,
    )
    from trisk_datawrangle_spark.llm.curate import cluster_canonical
    from trisk_datawrangle_spark.sources.readers import load_tables

    spark = get_spark(
        app_name="default-tier-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", "128")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    docs, embs = t["documents"], t["embeddings"]
    n_docs, n_vecs = docs.count(), embs.count()
    k = (
        int(sys.argv[1]) if len(sys.argv) > 1
        else max(8, n_vecs // 2000)
    )

    out: dict = {
        "metric": "default_tier_probe",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_vectors": n_vecs,
        "d14_k": k,
        "sec": {},
        "rows": {},
    }

    def timed(name, fn):
        t0 = time.perf_counter()
        rows = fn()
        out["sec"][name] = round(time.perf_counter() - t0, 2)
        out["rows"][name] = rows
        print(
            json.dumps({name: out["sec"][name], "rows": rows}),
            flush=True,
        )
        spark.catalog.clearCache()

    timed(
        "d7_default_lsh",
        lambda: dedup_clusters_pipeline(
            docs, "text", "doc_id", threshold=0.8
        ).count(),
    )
    timed(
        "c3_default_lsh",
        lambda: cluster_canonical(
            docs, "text", "doc_id", threshold=0.8
        ).count(),
    )
    timed(
        "d14_default_clustered",
        lambda: semantic_dedup(
            embs, "embedding", "vec_id", threshold=0.45,
            pair_tier="clustered", k=k, n_iter=2,
        ).filter("keep").count(),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
