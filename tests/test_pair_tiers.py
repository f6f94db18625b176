"""pair_tier output-invariance (r7 verdict #2): the candidate-bounded
default tiers must reproduce the exhaustive tiers' answers at
near-dup thresholds — so gating correctness on the exact tier at
fixture scale licenses deploying the default tier unchanged.

Covers the dispatcher (near_dup_pairs), the cluster pipeline
(dedup_clusters_pipeline), the curation capstone (cluster_canonical)
and the semantic tier knob (semantic_dedup exact vs clustered).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.llm.clustering import semantic_dedup
from trisk_datawrangle_spark.llm.components import dedup_clusters_pipeline
from trisk_datawrangle_spark.llm.curate import cluster_canonical
from trisk_datawrangle_spark.llm.dedup import PAIR_TIERS, near_dup_pairs


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs_set(df):
    return {
        (r.id_a, r.id_b, round(r.jaccard, 6)) for r in df.collect()
    }


def test_near_dup_pairs_tiers_identical(spark):
    docs = _docs(spark)
    got = {
        tier: _pairs_set(
            near_dup_pairs(docs, "text", "doc_id", threshold=0.8,
                           pair_tier=tier)
        )
        for tier in PAIR_TIERS
    }
    assert got["lsh"] == got["exact"], "LSH tier diverged from exact"
    assert got["prefix"] == got["exact"], "prefix tier diverged"
    assert got["exact"], "fixture has no 0.8 pairs — test is vacuous"


def test_near_dup_pairs_rejects_unknown_tier(spark):
    with pytest.raises(ValueError, match="pair_tier"):
        near_dup_pairs(_docs(spark), pair_tier="bogus")
    with pytest.raises(ValueError, match="pair_tier"):
        semantic_dedup(
            _docs(spark).limit(0), "text", "doc_id", pair_tier="bogus"
        )


def test_cluster_pipeline_default_matches_exact(spark):
    docs = _docs(spark)
    default = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters_pipeline(docs, threshold=0.8).collect()
    }
    exact = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters_pipeline(
            docs, threshold=0.8, pair_tier="exact"
        ).collect()
    }
    assert default == exact
    n_multi = sum(
        1 for _, c in default
        if sum(1 for _, c2 in default if c2 == c) > 1
    )
    assert n_multi > 0, "no multi-doc clusters — equality is vacuous"


def test_cluster_canonical_default_matches_exact(spark):
    docs = _docs(spark)
    default = {
        (r.cluster_id, r.canonical_id, r.quality)
        for r in cluster_canonical(docs, threshold=0.8).collect()
    }
    exact = {
        (r.cluster_id, r.canonical_id, r.quality)
        for r in cluster_canonical(
            docs, threshold=0.8, pair_tier="exact"
        ).collect()
    }
    assert default == exact


def test_semantic_dedup_exact_tier_matches_global_components(spark):
    """The exact tier must reproduce the old d14 derivation (blocked
    GEMM pairs -> global components -> min-id keep)."""
    from trisk_datawrangle_spark.llm.components import dedup_clusters
    from trisk_datawrangle_spark.llm.similarity import cosine_pairs_blocked
    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    got = {
        (r.id, r.cluster_id, r.keep)
        for r in semantic_dedup(
            e, "embedding", "vec_id", threshold=0.45, pair_tier="exact"
        ).collect()
    }
    pairs = cosine_pairs_blocked(e, threshold=0.45)
    clusters = dedup_clusters(e, pairs, id_col="vec_id")
    w = Window.partitionBy("cluster_id")
    want = {
        (r.vec_id, r.cluster_id, r.keep)
        for r in clusters.select(
            "vec_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            (F.col("vec_id") == F.min("vec_id").over(w)).alias("keep"),
        ).collect()
    }
    assert got == want


def test_semantic_dedup_clustered_splits_only_across_cells(spark):
    """The clustered tier's documented approximation: every pair it
    keeps is a true >=threshold pair (subset of exact), and any
    cluster split relative to the exact tier happens ONLY across
    k-means cells — within a cell the clustering is identical."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    clustered = semantic_dedup(
        e, "embedding", "vec_id", threshold=0.45,
        pair_tier="clustered", k=8, n_iter=2,
    ).collect()
    exact = semantic_dedup(
        e, "embedding", "vec_id", threshold=0.45, pair_tier="exact"
    ).collect()
    c_of = {r.id: r.cluster_id for r in clustered}
    e_of = {r.id: r.cluster_id for r in exact}
    # clustered refines exact: ids the clustered tier groups together
    # must also be grouped by the exact tier (its pair set is a
    # subset of the exact pair set, so components can only split)
    from collections import defaultdict

    groups = defaultdict(list)
    for rid, cid in c_of.items():
        groups[cid].append(rid)
    for members in groups.values():
        exact_ids = {e_of[m] for m in members}
        assert len(exact_ids) == 1, (
            "clustered tier merged ids the exact tier separates"
        )


def test_ngram_jaccard_public_name_auto_dispatches(spark):
    """r8 verdict #3/r9 item 4: the public ngram_jaccard_pairs name
    must never run the unbounded quadratic co-shingle join without
    an explicit opt-in — t >= 0.7 silently takes the LOSSLESS prefix
    tier (identical rows), lower t without a df cap refuses loudly,
    and exhaustive=True / max_doc_freq remain the two opt-ins."""
    from trisk_datawrangle_spark.llm.dedup import ngram_jaccard_pairs

    docs = _docs(spark)
    auto = {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    exh = {
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in ngram_jaccard_pairs(
            docs, threshold=0.8, exhaustive=True
        ).collect()
    }
    assert auto == exh and auto
    with pytest.raises(ValueError, match="prefix-leverage"):
        ngram_jaccard_pairs(docs, threshold=0.3)
    # both documented opt-ins still reach a runnable plan at low t
    assert ngram_jaccard_pairs(
        docs, threshold=0.3, exhaustive=True
    ).count() >= ngram_jaccard_pairs(
        docs, threshold=0.3, max_doc_freq=50
    ).count()
