"""Round-5 operator invariants: context-window chunking covers every
word with bounded overlap, BM25 matches a hand-computed score, and
Bloom decontamination is a strict no-false-negative superset of the
exact broadcast-gram gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.dedup import (
    bloom_contamination,
    contamination_overlap,
)
from trisk_datawrangle_spark.llm.packing import chunk_documents
from trisk_datawrangle_spark.llm.ranking import bm25_scores


# ---------------------------------------------------------------- #
# chunking                                                          #
# ---------------------------------------------------------------- #


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(150))),  # 3 chunks @ 64/48
        (2, " ".join(f"w{i}" for i in range(64))),   # exactly one window
        (3, "one two three"),                        # shorter than window
        (4, ""),                                     # empty → no chunks
        (5, "!!! ??? ..."),                          # only separators → none
        (6, " ".join(f"w{i}" for i in range(112))),  # n-W=48: boundary
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_counts(spark, docs):
    out = chunk_documents(docs, "text", "doc_id", window=64, stride=48)
    counts = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # ceil(max(n-64,0)/48)+1 — and wordless docs yield nothing
    assert counts == {1: 3, 2: 1, 3: 1, 6: 2}


def test_chunks_cover_every_word_in_order(spark, docs):
    out = chunk_documents(docs, "text", "doc_id", 64, 48).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        n_words = {1: 150, 2: 64, 3: 3, 6: 112}[doc_id]
        covered = set()
        for r in chunks:
            words = r.chunk_text.split(" ")
            assert len(words) == r.n_chunk_tokens <= 64
            start = r.chunk_id * 48
            # chunk i is exactly positions [i*stride, i*stride+window)
            assert words == [f"w{i}" for i in range(start, min(start + 64, n_words))] or doc_id == 3
            covered.update(range(start, start + len(words)))
        assert covered == set(range(n_words))


def test_chunking_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=-1)


# ---------------------------------------------------------------- #
# BM25                                                              #
# ---------------------------------------------------------------- #


def test_bm25_matches_hand_computation(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.bm25
        for r in bm25_scores(df, ["apple", "banana"]).collect()
    }
    # N=3, avgdl=8/3; df(apple)=1, df(banana)=2
    k1, b = 1.2, 0.75

    def score(tf, dft, dl):
        idf = math.log((3 - dft + 0.5) / (dft + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (8 / 3)))

    exp1 = round(score(2, 1, 3) + score(1, 2, 3), 6)
    exp2 = round(score(0, 1, 2) + score(1, 2, 2), 6)
    assert out.keys() == {1, 2}  # doc 3 matches no term
    assert out[1] == pytest.approx(exp1, abs=1e-6)
    assert out[2] == pytest.approx(exp2, abs=1e-6)


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])


# ---------------------------------------------------------------- #
# Bloom decontamination                                             #
# ---------------------------------------------------------------- #


def test_bloom_superset_of_exact_overlap(spark, sf_dir):
    from trisk_datawrangle_spark.sources.readers import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    bench = docs.filter(F.col("doc_id") < 20)
    corp = docs.filter(F.col("doc_id") >= 20)
    exact = {
        r.doc_id: r.n_hits
        for r in contamination_overlap(corp, bench, "text", "doc_id", 4).collect()
    }
    bloom = {
        r.doc_id: r.n_bloom_hits
        for r in bloom_contamination(corp, bench, "text", "doc_id", 4).collect()
    }
    # no false negatives: every exact hit is a bloom hit, counts >=
    assert set(exact) <= set(bloom)
    for doc_id, n in exact.items():
        assert bloom[doc_id] >= n
    # FPs stay near the design rate: with n_bench_grams ≈ 1.4k in
    # m=2^18 bits, k=3 → p ≈ (1.4e3·3/2.6e5)^3 ≈ 4e-6 per gram; a
    # doc-level blowup means the position math broke, not bad luck
    extra = set(bloom) - set(exact)
    assert len(extra) <= max(2, len(exact) // 5)


def test_bloom_bitmap_rejects_bad_m(spark):
    from trisk_datawrangle_spark.llm.dedup import bloom_bitmap

    g = spark.createDataFrame([("a b c d",)], "gram string")
    with pytest.raises(ValueError):
        bloom_bitmap(g, m_bits=100)


# ---------------------------------------------------------------- #
# block-level (sub-document) dedup                                  #
# ---------------------------------------------------------------- #


def test_block_dedup_removes_shared_blocks_and_preserves_order(spark):
    from trisk_datawrangle_spark.llm.dedup import block_dedup

    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"  # one exact 10-word block
    rows = [
        (1, f"u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 {boiler} t0 t1 t2"),
        (2, f"{boiler} v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),
        (3, "w0 w1 w2 w3 w4"),      # untouched
        (4, boiler),                # entirely boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in block_dedup(df, block_words=10).collect()}
    # the shared block disappears from every doc, order preserved
    assert out[1].clean_text == "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 t0 t1 t2"
    assert out[1].n_blocks_removed == 1 and out[1].n_blocks_kept == 2
    assert out[2].clean_text == "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"
    assert out[3].clean_text == "w0 w1 w2 w3 w4"
    assert out[3].n_blocks_removed == 0
    # all-boilerplate doc survives with empty text (policy is caller's)
    assert out[4].clean_text == "" and out[4].n_blocks_kept == 0


def test_block_dedup_unique_corpus_is_identity(spark):
    from trisk_datawrangle_spark.llm.dedup import block_dedup

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(25))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in block_dedup(df, block_words=10).collect():
        assert r.n_blocks_removed == 0 and r.n_blocks_kept == 3
        assert r.clean_text == " ".join(f"d{r.doc_id}w{j}" for j in range(25))


def test_bm25_sql_escapes_quoted_terms(duck):
    """Terms containing a single quote must emit a valid doubled-
    quote SQL literal (found in review: bm25_sql(["o'brien"]) used to
    generate a syntax error while the Spark side handled it fine)."""
    from trisk_datawrangle_spark.llm.ranking import bm25_sql

    sql = bm25_sql(["o'brien", "plain"])
    assert "'o''brien'" in sql
    rows = duck.execute(sql).fetchall()  # parses and runs
    assert isinstance(rows, list)
