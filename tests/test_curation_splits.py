"""Round-5 curation additions: per-domain cap (cap_per_group),
leakage-safe cluster split (cluster_safe_split), and the end-to-end
corpus build (curate_to_splits).

Properties that matter: survivors/assignments are pure functions of
the data (stable across partition layouts), the cap is exact per
group, no near-dup cluster ever straddles splits, and the e2e
summary reconciles with its component stages (c2 survivors minus
contamination hits).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.llm.curate import (
    cluster_safe_split,
    curate,
    curate_to_splits,
)
from trisk_datawrangle_spark.llm.dedup import (
    contamination_overlap,
    minhash_lsh_dedup_pairs,
)
from trisk_datawrangle_spark.llm.sampling import cap_per_group

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------- #
# cap_per_group                                                     #
# ---------------------------------------------------------------- #


def test_cap_exact_per_group(spark, docs):
    d = docs.select("doc_id", "source", F.length("text").alias("n"))
    capped = cap_per_group(d, ["source"], 5, "n", "doc_id")
    per = {
        r.source: r.c
        for r in capped.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    full = {
        r.source: r.c
        for r in d.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert per.keys() == full.keys()  # no group vanishes
    for src, c in per.items():
        assert c == min(5, full[src])


def test_cap_keeps_top_priority(spark, docs):
    d = docs.select("doc_id", "source", F.length("text").alias("n"))
    kept = cap_per_group(d, ["source"], 3, "n", "doc_id")
    one_src = d.filter(F.col("source") == "src0").collect()
    want = sorted(one_src, key=lambda r: (-r.n, r.doc_id))[:3]
    got = sorted(
        kept.filter(F.col("source") == "src0").collect(),
        key=lambda r: (-r.n, r.doc_id),
    )
    assert [r.doc_id for r in got] == [r.doc_id for r in want]


def test_cap_partition_invariant(spark, docs):
    d = docs.select("doc_id", "source", F.length("text").alias("n"))
    a = {r.doc_id for r in cap_per_group(d, ["source"], 4, "n").collect()}
    b = {
        r.doc_id
        for r in cap_per_group(d.repartition(17), ["source"], 4, "n").collect()
    }
    assert a == b


# ---------------------------------------------------------------- #
# cluster_safe_split                                                #
# ---------------------------------------------------------------- #


@pytest.fixture(scope="module")
def assigned(spark, docs):
    pairs = minhash_lsh_dedup_pairs(
        docs, num_hashes=64, bands=32, threshold=0.5
    )
    return cluster_safe_split(docs, pairs, FR, seed=11).cache(), pairs


def test_cluster_split_complete(spark, docs, assigned):
    out, _ = assigned
    assert out.count() == docs.count()
    assert out.filter(F.col("split").isNull()).count() == 0


def test_no_cluster_straddles_splits(spark, assigned):
    out, _ = assigned
    straddle = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0


def test_near_dup_pairs_land_together(spark, assigned):
    out, pairs = assigned
    a = out.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = out.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    assert joined.filter(F.col("split_a") != F.col("split_b")).count() == 0
    assert joined.count() == pairs.count()


# ---------------------------------------------------------------- #
# curate_to_splits (w4 chain)                                       #
# ---------------------------------------------------------------- #


def test_e2e_reconciles_with_stages(spark, docs):
    corpus = docs.filter(F.col("doc_id") >= 20)
    bench = docs.filter(F.col("doc_id") < 20)
    summary = curate_to_splits(corpus, bench, fractions=FR, seed=7)
    rows = summary.collect()
    assert {r.split for r in rows} <= set(FR)
    # reconcile with the component stages computed independently
    kept = curate(corpus)
    hits = contamination_overlap(
        corpus.join(kept.select("doc_id"), "doc_id", "left_semi"),
        bench,
        n=4,
    ).select("doc_id")
    clean_n = kept.join(hits, "doc_id", "left_anti").count()
    assert sum(r.n_docs for r in rows) == clean_n
    assert all(r.total_tokens > 0 for r in rows if r.n_docs > 0)
    assert all(r.min_id >= 20 for r in rows)


# ---------------------------------------------------------------- #
# incremental dedup (d11)                                           #
# ---------------------------------------------------------------- #


def test_incremental_equals_cross_set_subset_of_full(spark, docs):
    """The incremental band join (incoming × existing only) must find
    exactly the cross-set subset of the full self-join's verified
    pairs — no pair lost by skipping within-set buckets, none
    invented."""
    from trisk_datawrangle_spark.llm.dedup import (
        minhash_lsh_dedup_pairs,
        minhash_lsh_incremental_pairs,
    )

    existing = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    inc = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_incremental_pairs(
            existing, incoming, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    full = minhash_lsh_dedup_pairs(
        docs, num_hashes=64, bands=32, threshold=0.5
    ).collect()
    cross = {
        (r.id_a, r.id_b) if r.id_a % 2 == 0 else (r.id_b, r.id_a)
        for r in full
        if (r.id_a % 2) != (r.id_b % 2)
    }
    assert inc == cross and len(inc) > 0


def test_balance_sources_equalizes_expected_weight(spark, docs):
    """Mixture sampling: per-source kept token weight lands near the
    smallest source's budget (binomial noise), the full smallest
    source is kept, and the sample is a pure function of (id, seed)."""
    from trisk_datawrangle_spark.llm.sampling import balance_sources

    d = docs.select("doc_id", "source", F.length("text").alias("w"))
    kept = balance_sources(d, "source", "w", "doc_id", seed=5).cache()
    full = {
        r.source: r.tw
        for r in d.groupBy("source").agg(F.sum("w").alias("tw")).collect()
    }
    got = {
        r.source: r.tw
        for r in kept.groupBy("source").agg(F.sum("w").alias("tw")).collect()
    }
    m = min(full.values())
    min_src = min(full, key=full.get)
    assert got[min_src] == full[min_src]  # rate 1: smallest kept whole
    for src, tw in got.items():
        assert tw <= full[src]
        assert tw > 0.3 * m  # expectation m, generous binomial band
    a = {r.doc_id for r in kept.collect()}
    b = {
        r.doc_id
        for r in balance_sources(
            d.repartition(17), "source", "w", "doc_id", seed=5
        ).collect()
    }
    assert a == b


def test_incremental_overlapping_id_does_not_inflate(spark, docs):
    """An id present in BOTH frames (same text — re-ingestion) must
    not inflate verification counts: pairs involving it keep the
    exact jaccard from the disjoint case, and it never pairs with
    itself."""
    from trisk_datawrangle_spark.llm.dedup import (
        minhash_lsh_incremental_pairs,
    )

    existing = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    base = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in minhash_lsh_incremental_pairs(
            existing, incoming, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert base
    x = next(iter(base))[0]  # an existing id that participates in a pair
    overlap_incoming = incoming.unionByName(
        docs.filter(F.col("doc_id") == x)
    )
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in minhash_lsh_incremental_pairs(
            existing, overlap_incoming, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert (x, x) not in got
    assert got == base


def test_curriculum_order_monotone_quality_and_stable(spark):
    """Tier 1 holds the highest-quality docs, positions are dense
    per (tier, shard), and the whole schedule is partition-layout
    independent."""
    from trisk_datawrangle_spark.llm.sampling import curriculum_order

    rows = [(i, float((i * 37) % 100)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    out = curriculum_order(df, "q", n_tiers=4, n_shards=4, seed=1).cache()
    tiers = {
        r["tier"]: (r["lo"], r["hi"])
        for r in out.groupBy("tier")
        .agg(F.min("q").alias("lo"), F.max("q").alias("hi"))
        .collect()
    }
    assert set(tiers) == {1, 2, 3, 4}
    # monotone: tier t's min quality >= tier t+1's max (boundary ties aside)
    for t in (1, 2, 3):
        assert tiers[t][0] >= tiers[t + 1][1] - 1e-9, tiers
    # dense positions within each (tier, shard)
    for r in (
        out.groupBy("tier", "shard")
        .agg(F.count("*").alias("n"), F.max("position").alias("mx"))
        .collect()
    ):
        assert r["n"] == r["mx"]
    # layout-independent schedule
    again = curriculum_order(
        df.repartition(13), "q", n_tiers=4, n_shards=4, seed=1
    )
    a = {(r.doc_id): (r.tier, r.shard, r.position) for r in out.collect()}
    b = {(r.doc_id): (r.tier, r.shard, r.position) for r in again.collect()}
    assert a == b


def test_bpe_pair_stats_counts(spark):
    """Pair counts are word-frequency weighted: 'aba aba ab' has
    'ab' in 3 words (2+2... 'aba' twice -> ab,ba each twice... plus
    'ab' once) -> ab:3, ba:2; single-char words contribute nothing."""
    from trisk_datawrangle_spark.llm.text import bpe_pair_stats

    df = spark.createDataFrame(
        [(1, "aba aba ab"), (2, "x y aba")], "doc_id long, text string"
    )
    got = {r.pair: r.n for r in bpe_pair_stats(df, "text", k=10).collect()}
    # vocabulary: aba (n=3), ab (n=1); x/y too short
    assert got == {"ab": 4, "ba": 3}


def test_curriculum_order_edges(spark):
    """n_tiers=1 (no cut points), all-NULL quality, and bad params."""
    import pytest as _pytest

    from trisk_datawrangle_spark.llm.sampling import curriculum_order

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 9.0)], "doc_id long, q double"
    )
    one = curriculum_order(df, "q", n_tiers=1, n_shards=2)
    assert {r.tier for r in one.collect()} == {1}

    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, q double"
    )
    out = curriculum_order(nulls, "q", n_tiers=3, n_shards=2)
    assert {r.tier for r in out.collect()} == {3}  # last tier: consumed last

    mixed = curriculum_order(df, "q", n_tiers=2, n_shards=2)
    got = {r.doc_id: r.tier for r in mixed.collect()}
    assert got[3] == 1 and got[2] == 2  # best first, NULL last

    with _pytest.raises(ValueError, match="n_tiers"):
        curriculum_order(df, "q", n_tiers=0, n_shards=2)
