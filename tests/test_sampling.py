"""Deterministic split properties: proportions near the requested
fractions, assignment a pure function of the id (stable across
partition layouts), seed changes reshuffle, and cluster-keyed splits
keep near-duplicates together (leakage control)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.llm.sampling import deterministic_split

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _assignment(df, id_col="doc_id"):
    out = deterministic_split(df, id_col, FR, seed=1)
    return {r[id_col]: r.split for r in out.select(id_col, "split").collect()}


def test_proportions_and_completeness(spark, docs):
    a = _assignment(docs)
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= set(FR)
    assert sum(c.values()) == n  # complete: every row labeled
    # 500 docs: binomial 5σ bands around the requested fractions
    assert abs(c["train"] / n - 0.8) < 0.10
    assert abs(c["val"] / n - 0.1) < 0.08
    assert abs(c["test"] / n - 0.1) < 0.08


def test_pure_function_of_id(spark, docs):
    assert _assignment(docs) == _assignment(docs.repartition(13))


def test_seed_reshuffles(spark, docs):
    a = {
        r.doc_id: r.split
        for r in deterministic_split(docs, "doc_id", FR, seed=1)
        .select("doc_id", "split")
        .collect()
    }
    b = {
        r.doc_id: r.split
        for r in deterministic_split(docs, "doc_id", FR, seed=2)
        .select("doc_id", "split")
        .collect()
    }
    assert a != b  # some docs move between splits under a new seed


def test_cluster_keyed_split_prevents_leakage(spark, docs):
    """Splitting on a dedup-cluster key puts every member of a cluster
    in the same split."""
    clustered = docs.withColumn("cluster_id", F.col("doc_id") % 50)
    out = deterministic_split(clustered, "cluster_id", FR, seed=1)
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in per_cluster)


def test_bad_fractions_rejected(spark, docs):
    with pytest.raises(ValueError, match="sum"):
        deterministic_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_stratified_take_exact_k_and_stable(spark, docs):
    from trisk_datawrangle_spark.llm.sampling import stratified_take

    out = stratified_take(docs, ["lang"], 3, "doc_id", seed=1)
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in counts.items():
        assert n == min(3, sizes[lang])
    a = {(r.lang, r.doc_id) for r in out.select("lang", "doc_id").collect()}
    b = {
        (r.lang, r.doc_id)
        for r in stratified_take(docs.repartition(11), ["lang"], 3, "doc_id", seed=1)
        .select("lang", "doc_id")
        .collect()
    }
    assert a == b


def test_weighted_take_properties(spark):
    """E-S weighted sampling: exact k per group, deterministic across
    calls, excludes non-positive weights, and a dominant weight is
    effectively always selected."""
    from trisk_datawrangle_spark.llm.sampling import weighted_take

    rows = [(g, i, 1.0 if i else 1e9) for g in ("a", "b") for i in range(20)]
    rows.append(("a", 99, 0.0))    # weight 0: never sampled
    rows.append(("b", 98, None))   # NULL weight: never sampled
    df = spark.createDataFrame(rows, "g string, doc_id long, w double")
    for seed in (0, 1, 2, 3, 4):
        got = weighted_take(df, ["g"], 5, "w", "doc_id", seed=seed)
        per = {(r.g, r.doc_id) for r in got.collect()}
        counts = {}
        for g, i in per:
            counts[g] = counts.get(g, 0) + 1
        assert counts == {"a": 5, "b": 5}
        # the 1e9-weight doc (doc_id 0) dominates: P(miss) ~ (u^1e9
        # effect) -> essentially impossible at these sizes
        assert ("a", 0) in per and ("b", 0) in per
        assert ("a", 99) not in per and ("b", 98) not in per
    again = {
        (r.g, r.doc_id)
        for r in weighted_take(df, ["g"], 5, "w", "doc_id", seed=2).collect()
    }
    first = {
        (r.g, r.doc_id)
        for r in weighted_take(df, ["g"], 5, "w", "doc_id", seed=2).collect()
    }
    assert again == first


def test_balance_sources_null_group_is_own_source(spark):
    """A NULL source forms its own mixture group (repo-wide
    NULL-keys-group-together policy): its rows must be sampled
    against each other via the null-safe rate join, not silently
    dropped, and its weight participates in the min-budget."""
    from trisk_datawrangle_spark.llm.sampling import balance_sources

    df = spark.createDataFrame(
        [(i, "big", 10) for i in range(200)]
        + [(1000 + i, None, 10) for i in range(20)],
        "doc_id long, source string, w long",
    )
    out = balance_sources(df, "source", "w", "doc_id", seed=3)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # NULL is the smallest source -> rate 1.0 -> all 20 rows kept
    assert by_src.get(None) == 20, by_src
    # and the big source is downsampled toward the NULL source's budget
    assert 0 < by_src["big"] < 200, by_src


def test_token_topk_accepts_text_only_frame(spark):
    """token_topk's gram-builder rewrite must not break the public
    contract that a bare text column is enough — a frame without
    doc_id gets a constant id injected."""
    from trisk_datawrangle_spark.llm.text import token_topk

    df = spark.createDataFrame(
        [("alpha beta beta",), ("beta gamma",)], "text string"
    )
    top = token_topk(df, "text", k=2).collect()
    assert [(r.token, r.n) for r in top] == [("beta", 3), ("alpha", 1)]


def test_balance_sources_temperature_interpolates(spark):
    """alpha=1 keeps everything, alpha=0 equals the default full
    balance, alpha=0.5 keeps strictly more of the big source than
    full balance (rates are sqrt-compressed toward 1)."""
    from trisk_datawrangle_spark.llm.sampling import balance_sources

    df = spark.createDataFrame(
        [(i, "big", 10) for i in range(400)]
        + [(10_000 + i, "small", 10) for i in range(20)],
        "doc_id long, source string, w long",
    )

    def kept(alpha):
        out = balance_sources(df, "source", "w", "doc_id", seed=7, alpha=alpha)
        return {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }

    full = kept(0.0)
    sq = kept(0.5)
    none = kept(1.0)
    assert none == {"big": 400, "small": 20}
    assert full["small"] == 20 and sq["small"] == 20  # anchor source whole
    # expected rates: full 0.05 -> ~20 of 400; sqrt(0.05)~0.224 -> ~89
    assert full["big"] < sq["big"] < none["big"]
    assert 5 <= full["big"] <= 45 and 60 <= sq["big"] <= 125


def test_global_take_takeordered_and_stable(spark, docs):
    """global_take plans TakeOrderedAndProject (never a single-task
    global-sort window) and picks the identical subset on any
    partition layout."""
    from trisk_datawrangle_spark.llm.sampling import global_take

    out = global_take(docs.select("doc_id"), 50, seed=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in global_take(
            docs.select("doc_id").repartition(17), 50, seed=2
        ).collect()
    )
    assert len(a) == 50 and a == b
