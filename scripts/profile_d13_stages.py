#!/usr/bin/env python
"""Stage-level timing of the d13 probe path (guide §1: find WHERE
the time goes before changing anything). Replays
minhash_lsh_index_pairs step by step with a timer around each eager
action, against the same published serving index the catalog entry
uses. Mirrors the r12 probe shape (_shingle_profile + memoized
relation reads + array-side verify). Run on an idle box.
"""

from __future__ import annotations

import os
import sys
import time


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:34s} {time.perf_counter() - t0:6.3f}s", flush=True)
    return out


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from trisk_datawrangle_spark import get_spark
    from trisk_datawrangle_spark.catalog import QUERIES
    from trisk_datawrangle_spark.catalog.llm import _docs, _served_index_path
    from trisk_datawrangle_spark.llm.dedup import (
        _banded_table,
        _shingle_profile,
        _verify_pairs_two_sided,
    )
    from trisk_datawrangle_spark.llm.lsh_index import (
        _pruned_bands_read,
        _read_index_table,
        read_index_meta,
        resolve_index_path,
    )
    from trisk_datawrangle_spark.operators.persist import (
        unpersist_all_rdds,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile-d13",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # make sure the index exists (same builder the entry uses)
    QUERIES["d13_probe_serving"](spark, sf_dir)

    docs = _docs(spark, sf_dir)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)

    for rep in range(3):
        print(f"pass {rep}:", flush=True)
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)
        t0 = time.perf_counter()
        path = t(
            "resolve+meta",
            lambda: resolve_index_path(
                spark, _served_index_path(spark, "lsh", sf_dir, None)
            ),
        )
        meta = read_index_meta(spark, path)
        n_shards = meta["n_shards"]
        prof = _shingle_profile(
            incoming, "text", "doc_id", meta["ngram"], meta["num_hashes"]
        ).cache()
        banded_in = _banded_table(
            prof.select("id", "sig"), meta["num_hashes"], meta["bands"]
        ).withColumn("bshard", F.pmod(F.col("bucket"), F.lit(n_shards)))
        index_bands = _pruned_bands_read(spark, path, banded_in).join(
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
        shard_rows = t(
            "profile+bands+cand+shard collect (fused barrier, r13)",
            lambda: cand.select(
                F.pmod(F.xxhash64(F.col("id_a")), F.lit(n_shards)).alias(
                    "ishard"
                )
            )
            .distinct()
            .collect(),
        )
        shards = sorted(int(r["ishard"]) for r in shard_rows)
        sh_ex = (
            _read_index_table(spark, path, "shingles")
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
        out = t(
            "verify+checkpoint",
            lambda: _verify_pairs_two_sided(
                arrays_ex, arrays_b, cand, 0.5
            ).localCheckpoint(eager=True),
        )
        t(
            "final select+noop",
            lambda: out.select(
                "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        prof.unpersist()
        cand.unpersist()
        print(f"  total {time.perf_counter() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
