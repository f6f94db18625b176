"""Measure bpe_train at realistic merge counts (r8 verdict #5).

Two probes:
1. sf1 corpus (the real fixture): vocabulary is tiny (40 distinct
   words), so training exhausts after ~109 merges — fine for the
   driver-loop mechanics, useless for per-merge cost.
2. A synthetic 50k-distinct-word corpus (skewed letter distribution,
   zipf-ish word counts) that sustains 200+ genuine merges — the
   vocab-sized-aggregate cost the docstring claims.

Measured 2026-08-15 (local[32], Spark 4.1.2):
  sf1:        200 requested -> 109 learned (vocab exhausted), 28.0 s
  synthetic:  n=50  23.7 s (474 ms/merge)
              n=100 37.5 s (375 ms/merge)
              n=200 79.6 s (398 ms/merge)  <- marginal 100->200 =
              421 ms/merge: FLAT, no plan-growth blowup; the 200-deep
              replace chain survives codegen (Spark splits oversized
              methods automatically). Real tokenizers (10k-50k
              merges) would pay ~400 ms x merges here and O(n^2)
              driver analysis eventually — batch non-overlapping
              merges per round before going there; at <=~500 merges
              the loop is measured-safe as shipped.

Run: PYTHONPATH=. python scripts/probe_bpe_merges.py
"""
import random
import time

from pyspark.sql import functions as F

from trisk_datawrangle_spark import get_spark
from trisk_datawrangle_spark.llm import text as T


def main() -> None:
    spark = get_spark(
        app_name="bpe_probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/repo/.scratch/sf1/documents.parquet")
    t = time.time()
    out = T.bpe_train(docs, n_merges=200).collect()
    print(
        f"sf1: requested=200 learned={len(out)} "
        f"total={time.time() - t:.1f}s"
    )

    rng = random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    weights = [max(1, 30 - 2 * i) for i in range(26)]
    words: set[str] = set()
    while len(words) < 50000:
        words.add(
            "".join(rng.choices(alpha, weights=weights, k=rng.randint(3, 12)))
        )
    rows = [(w, 1 + 2000 // (i + 20)) for i, w in enumerate(sorted(words))]
    vocab = spark.createDataFrame(rows, "w string, c long")
    synth = (
        vocab.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("c")), lambda _: F.col("w")
                )
            ).alias("text")
        )
        .withColumn("doc_id", F.monotonically_increasing_id())
        .repartition(32)
        .cache()
    )
    print("synthetic corpus rows:", synth.count())
    for k in (50, 100, 200):
        t = time.time()
        out = T.bpe_train(synth, n_merges=k).collect()
        dt = time.time() - t
        print(
            f"synthetic n={k}: {dt:.1f}s learned={len(out)} "
            f"avg={dt / k * 1000:.0f}ms/merge"
        )


if __name__ == "__main__":
    main()
