"""Connected-components correctness: against a python union-find on
random graphs, plus convergence and composition with the dedup
pipeline."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.llm.components import (
    connected_components,
    dedup_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member id per component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        nodes = list(range(100))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.node: r.comp for r in connected_components(df).collect()
        }
        expected = _union_find(edges)
        assert got == expected, trial


def test_chain_converges_to_single_component(spark):
    """A path graph is the worst case for label propagation depth."""
    n = 30
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {r.node: r.comp for r in connected_components(df, max_iter=40).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_dedup_clusters_composition(spark):
    """Exact-duplicate docs end in one cluster; cluster-keyed splits
    then keep them together (the leakage-safe path end-to-end)."""
    from trisk_datawrangle_spark.llm.dedup import ngram_jaccard_pairs
    from trisk_datawrangle_spark.llm.sampling import deterministic_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    clustered = dedup_clusters(docs, pairs)
    assert clustered.count() == docs.count()
    # every paired doc shares its cluster with its partner
    p = pairs.select("id_a", "id_b").collect()
    cl = {r.doc_id: r.cluster_id for r in clustered.collect()}
    assert len(p) > 0
    for r in p:
        assert cl[r.id_a] == cl[r.id_b]
    # split on cluster id → partners land in the same split
    split = deterministic_split(
        clustered, "cluster_id", {"train": 0.9, "test": 0.1}, seed=3
    )
    sp = {r.doc_id: r.split for r in split.collect()}
    for r in p:
        assert sp[r.id_a] == sp[r.id_b]


def test_long_path_converges_within_budget(spark):
    """A 300-node path has diameter 299 — plain min-label propagation
    needs ~300 rounds; pointer jumping must land it well inside the
    default 20-round budget with the correct single component."""
    from trisk_datawrangle_spark.llm.components import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    comp = connected_components(pairs)
    rows = comp.collect()
    assert len(rows) == 300
    assert {r.comp for r in rows} == {0}
