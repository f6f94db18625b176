"""Property tests for the hash-based dedup/similarity operators that
have no SQL oracle (minhash/LSH/simhash): determinism, signature
structure, and the LSH recall property — near-identical documents
MUST collide; unrelated documents must not flood the candidate set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash_table,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "every single morning before the sun rises over the quiet hills"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate
        (2, BASE.replace("lazy", "sleepy")),  # near-duplicate
        (3, "completely different content about spark query engines "
            "and distributed columnar execution with shuffle exchanges "
            "plus adaptive planning for skewed join keys at scale"),
        (4, "short doc"),  # too short for 3-grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_deterministic_and_complete(docs):
    sh = shingle_hashes(docs, "text", "doc_id", n=3)
    counts = {r["id"]: r["cnt"] for r in sh.groupBy("id").agg(F.count("*").alias("cnt")).collect()}
    n_words = len(BASE.split())
    assert counts[0] == n_words - 2  # every position yields one gram
    assert 4 not in counts  # 2-word doc has no 3-grams
    # identical text → identical shingle multiset
    a = sorted(r["h"] for r in sh.filter(F.col("id") == 0).collect())
    b = sorted(r["h"] for r in sh.filter(F.col("id") == 1).collect())
    assert a == b


def test_minhash_signature_properties(docs):
    sig = minhash_signatures(docs, "text", "doc_id", num_hashes=64)
    rows = {r["id"]: r["sig"] for r in sig.collect()}
    assert set(rows) == {0, 1, 2, 3}  # shingle-less doc 4 absent
    assert all(len(s) == 64 for s in rows.values())
    assert rows[0] == rows[1]  # identical docs → identical signature
    # near-dup agrees on most positions; unrelated on almost none
    agree_near = sum(x == y for x, y in zip(rows[0], rows[2]))
    agree_far = sum(x == y for x, y in zip(rows[0], rows[3]))
    assert agree_near > 40
    assert agree_far < 10


def test_lsh_recall_and_precision(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, num_hashes=64, bands=16).collect()
    }
    # exact and near duplicates MUST be candidates (recall)
    assert (0, 1) in pairs and pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    # the unrelated doc must not pair with everything (precision)
    assert (0, 3) not in pairs
    # LSH candidates ⊇ high-Jaccard pairs from the exact verifier
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact <= set(pairs)


def test_simhash_hamming_property(docs):
    st = {r["id"]: r["simhash"] for r in simhash_table(docs, "text", "doc_id").collect()}
    assert st[0] == st[1]
    ham_near = bin((st[0] ^ st[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((st[0] ^ st[3]) & ((1 << 64) - 1)).count("1")
    assert ham_near < 16
    assert ham_far > 16


def test_signatures_stable_across_partitionings(docs):
    one = {r["id"]: r["sig"] for r in minhash_signatures(docs.coalesce(1)).collect()}
    many = {r["id"]: r["sig"] for r in minhash_signatures(docs.repartition(7)).collect()}
    assert one == many


def test_ngram_jaccard_max_doc_freq_is_conservative(spark):
    """Dropping high-doc-frequency shingles from the join side only
    can only LOWER a pair's Jaccard (sizes keep every shingle), and a
    frequency cap >= ndocs is a no-op."""
    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "completely different words here about spark engines running",
        "completely different words here about spark engines failing",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.0, exhaustive=True
        ).collect()
    }
    noop = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.0, max_doc_freq=len(texts)
        ).collect()
    }
    assert noop == exact
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.0, max_doc_freq=1
        ).collect()
    }
    # df<=1 keeps only shingles unique to one doc -> no co-shingles
    assert capped == {}
    capped2 = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.0, max_doc_freq=2
        ).collect()
    }
    for pair, j in capped2.items():
        assert j <= exact[pair] + 1e-12, (pair, j, exact[pair])


def test_zero_norm_vector_survives_cosine_ops(spark):
    """A zero embedding (failed extraction) must score ~0 cosine, not
    kill the job with ANSI DIVIDE_BY_ZERO (found in review: the JVM
    _norm had no clamp while every numpy path clamped at 1e-12)."""
    from pyspark.sql import functions as F

    from trisk_datawrangle_spark.llm.similarity import cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(df, df.filter(F.col("vec_id") == 1), k=2).collect()
    got = {r.neighbor_id: r.cosine for r in out}
    assert set(got) == {2, 3}
    assert abs(got[3]) < 1e-6  # zero vector ranks as ~0, never NaN/crash


def test_block_dedup_keeps_zero_chunk_docs(spark):
    """Docs whose text yields no chunks (empty/whitespace) must
    survive with empty clean_text, not vanish from the output."""
    from trisk_datawrangle_spark.llm.dedup import block_dedup

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.clean_text, r.n_blocks_kept) for r in
           block_dedup(df, block_words=2, min_docs=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == ("", 0) and out[3] == ("", 0)


def test_lsh_bands_must_divide_hashes(spark):
    from trisk_datawrangle_spark.llm.dedup import minhash_lsh_pairs
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, num_hashes=64, bands=24).collect()


def test_chunk_stride_gap_rejected(spark):
    from trisk_datawrangle_spark.llm.packing import chunk_documents
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="uncovered"):
        chunk_documents(df, window=10, stride=20)


def test_balance_sources_zero_weight_source(spark):
    """A source whose rows all weigh 0 must neither crash (0/0 under
    ANSI) nor zero out every other source's rate."""
    from trisk_datawrangle_spark.llm.sampling import balance_sources

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 0), (4, "b", 0), (5, "c", 30)],
        "doc_id long, source string, w long",
    )
    kept = balance_sources(df, "source", "w", "doc_id", seed=1).collect()
    srcs = {r.source for r in kept}
    assert "b" not in srcs          # nothing eligible there
    assert {"a", "c"} & srcs        # other sources still sampled


def test_pii_scrub_masks_and_ordering(spark):
    """pii_scrub masks URL/email/IP/phone; a dotted quad is masked as
    <IP>, never half-eaten by the phone pattern (order contract)."""
    from trisk_datawrangle_spark.llm.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "visit https://x.io/a?b=1 now"),
            (2, "mail a.b+c@ex-ample.org please"),
            (3, "host 192.168.001.200 down"),
            (4, "call +1 (555) 010-4477 today"),
            (5, "server  10.0.0.1   and\tphone 555.123.4567 end"),
        ],
        "id long, t string",
    )
    got = {r.id: r.c for r in df.select("id", pii_scrub("t").alias("c")).collect()}
    assert got[1] == "visit <URL> now"
    assert got[2] == "mail <EMAIL> please"
    assert got[3] == "host <IP> down"
    assert got[4] == "call <PHONE> today"
    assert got[5] == "server <IP> and phone <PHONE> end"


def test_bpe_train_learns_expected_first_merge(spark):
    """Hand-checkable corpus: 'ab' x3 + 'abc' x2 -> pair (a,b) count
    5 wins round 1; round 2 sees symbols [ab] and c: merge (ab, c)
    count 2."""
    from trisk_datawrangle_spark.llm.text import bpe_train

    rows = [(i, "ab ab ab abc abc") for i in range(1)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.n)
        for r in bpe_train(df, n_merges=2).orderBy("rank").collect()
    ]
    assert got == [(1, "a", "b", "ab", 5), (2, "ab", "c", "abc", 2)]


def test_bpe_train_deterministic_tiebreak(spark):
    """Equal counts break on (lhs, rhs) text — 'ab' vs 'ba' both
    appear twice in 'abab'? No: craft true tie: 'ab' x2 and 'cd' x2
    -> (a,b) and (c,d) both 2; (a,b) must win rank 1."""
    from trisk_datawrangle_spark.llm.text import bpe_train

    df = spark.createDataFrame(
        [(0, "ab ab cd cd")], "doc_id long, text string"
    )
    got = bpe_train(df, n_merges=1).collect()[0]
    assert (got.lhs, got.rhs, got.n) == ("a", "b", 2)
