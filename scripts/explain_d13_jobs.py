#!/usr/bin/env python
"""Per-job formatted explains for the d13 probe path (r13, verdict
item 7: the post-checkpoint stub in plans/r12 evidenced nothing).
Replays minhash_lsh_index_pairs exactly as written and dumps the
plan of each frame an eager action consumes, labeled by barrier.

Usage: python scripts/explain_d13_jobs.py <out_file>
"""

from __future__ import annotations

import io
import os
import sys


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out_path = sys.argv[1]
    from pyspark.sql import functions as F

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.catalog import QUERIES
    from trisk_datawrangle_spark.catalog.llm import _docs, _served_index_path
    from trisk_datawrangle_spark.llm import lsh_index as L
    from trisk_datawrangle_spark.llm.dedup import (
        _banded_table,
        _shingle_profile,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="explain-d13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["d13_probe_serving"](spark, sf_dir)  # publish the index

    def fmt(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    buf = io.StringIO()
    path = L.resolve_index_path(
        spark, _served_index_path(spark, "lsh", sf_dir, None)
    )
    meta = L.read_index_meta(spark, path)
    n_shards = meta["n_shards"]
    docs = _docs(spark, sf_dir)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)

    prof = _shingle_profile(
        incoming, "text", "doc_id", meta["ngram"], meta["num_hashes"]
    ).cache()
    banded_in = _banded_table(
        prof.select("id", "sig"), meta["num_hashes"], meta["bands"]
    ).withColumn("bshard", F.pmod(F.col("bucket"), F.lit(n_shards)))

    if not getattr(L, "_PROBE_FUSED", False):
        # pre-r13 shape: job A collects the delta's (band, bshard)
        # set to build the bands-read pruning predicate
        buf.write(
            "== BARRIER: delta (band, bshard) distinct collect "
            "(job A) ==\n"
        )
        buf.write(fmt(banded_in.select("band", "bshard").distinct()))
        buf.write("\n\n")
    index_bands = L._pruned_bands_read(spark, path, banded_in).join(
        F.broadcast(prof.select("id")), "id", "left_anti"
    )
    cand = (
        index_bands.select(F.col("id").alias("id_a"), "band", "bucket")
        .join(
            banded_in.select(F.col("id").alias("id_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .cache()
    )
    shard_frame = cand.select(
        F.pmod(F.xxhash64(F.col("id_a")), F.lit(n_shards)).alias("ishard")
    ).distinct()
    buf.write(
        "== BARRIER: candidate ishard collect (materializes the delta "
        "profile cache, the DPP/pruned index-bands read, the band "
        "join and the cand cache) ==\n"
    )
    buf.write(fmt(shard_frame))
    buf.write("\n\n")
    shard_rows = shard_frame.collect()
    shards = sorted(int(r["ishard"]) for r in shard_rows)
    sh_ex = (
        L._read_index_table(spark, path, "shingles")
        .filter(F.col("ishard").isin(*shards))
        .join(
            cand.select(F.col("id_a").alias("id")).distinct(),
            "id",
            "left_semi",
        )
        .select("id", "h")
    )
    arrays_ex = sh_ex.groupBy("id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    arrays_b = prof.join(
        cand.select(F.col("id_b").alias("id")).distinct(),
        "id",
        "left_semi",
    ).select("id", "hs", "n_grams")
    if hasattr(L, "_verify_pairs_two_sided"):
        verify = L._verify_pairs_two_sided(arrays_ex, arrays_b, cand, 0.5)
    else:
        from trisk_datawrangle_spark.llm.dedup import (
            _verify_pairs_from_arrays,
        )

        verify = _verify_pairs_from_arrays(
            arrays_ex.union(arrays_b), cand, 0.5
        )
    buf.write(
        "== BARRIER: verify + localCheckpoint (pruned shingles read, "
        "candidate arrays, exact jaccard) ==\n"
    )
    buf.write(fmt(verify))
    buf.write("\n")
    prof.unpersist()
    cand.unpersist()
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
