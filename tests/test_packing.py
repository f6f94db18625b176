"""Sequence-packing invariants: packs fill to the budget with at most
one straddling document of overflow, oversized documents isolate, and
assignment is a pure function of (shard, order, counts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.packing import pack_sequences


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # shard s: 200+200+200 → doc 3 straddles into pack 1, etc.
        (1, "s", 200), (2, "s", 200), (3, "s", 200), (4, "s", 200),
        (5, "s", 900),   # oversized: bigger than the budget
        (6, "s", 10),
        (7, "t", 512),   # exactly one budget
        (8, "t", 1),
    ]
    return spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")


def test_pack_assignment_and_overflow_bound(spark, frame):
    out = {
        r.doc_id: r.pack_id
        for r in pack_sequences(frame, "n_tok", 512, ["shard"], "doc_id").collect()
    }
    # cum_before/512: 0,200,400 → docs 1-3 in pack 0 (600 tokens —
    # one straddler over budget); 600,800 → docs 4-5 pack 1; 1700 → doc 6 pack 3
    assert out[1] == out[2] == out[3] == 0
    assert out[4] == 1 and out[5] == 1
    assert out[6] == 3
    # shard t: doc 7 fills pack 0 exactly; doc 8 starts pack 1
    assert out[7] == 0 and out[8] == 1


def test_pack_totals_overflow_by_at_most_one_doc(spark, frame):
    packed = pack_sequences(frame, "n_tok", 512, ["shard"], "doc_id")
    per_pack = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("n_tok").alias("tot"), F.max("n_tok").alias("mx"))
        .collect()
    )
    for r in per_pack:
        assert r.tot < 512 + r.mx  # budget + one straddler


def test_pack_partition_layout_independent(spark, frame):
    a = {(r.doc_id, r.pack_id) for r in pack_sequences(frame, "n_tok", 512, ["shard"], "doc_id").collect()}
    b = {
        (r.doc_id, r.pack_id)
        for r in pack_sequences(
            frame.repartition(7), "n_tok", 512, ["shard"], "doc_id"
        ).collect()
    }
    assert a == b


def test_bad_budget_rejected(spark, frame):
    with pytest.raises(ValueError):
        pack_sequences(frame, "n_tok", 0, ["shard"], "doc_id")


def test_pack_invariants_on_random_inputs(spark):
    """Property sweep: for random token multisets, packing preserves
    rows, respects order-contiguity (a pack is a contiguous run in
    the accumulation order), and never overflows by more than the one
    straddling document."""
    import random

    rng = random.Random(5)
    rows = [
        (i, f"s{rng.randint(0, 2)}", rng.choice([1, 10, 100, 450, 700]))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")
    out = pack_sequences(df, "n_tok", 512, ["shard"], "doc_id").collect()
    assert len(out) == len(rows)
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        # pack ids are non-decreasing in accumulation order (contiguous)
        packs = [r.pack_id for r in rs]
        assert packs == sorted(packs), shard
        # per-pack totals: budget plus at most the largest member
        totals = {}
        for r in rs:
            totals.setdefault(r.pack_id, []).append(r.n_tok)
        for pid, toks in totals.items():
            assert sum(toks) < 512 + max(toks), (shard, pid)


def test_cdc_chunks_shift_resistant(spark):
    """The CDC property fixed chunking lacks: prepending words to a
    document changes ONLY the leading chunk's fingerprint — every
    chunk from the first content-defined boundary on re-aligns
    byte-for-byte."""
    from pyspark.sql import functions as F

    from trisk_datawrangle_spark.llm.packing import cdc_chunk_table

    base_text = " ".join(f"w{(i * 37) % 97}" for i in range(400))
    a = spark.createDataFrame([(1, base_text)], "doc_id long, text string")
    b = spark.createDataFrame(
        [(1, "inserted words up front " + base_text)],
        "doc_id long, text string",
    )
    ha = [r.chunk_hash for r in cdc_chunk_table(a, avg_words=10)
          .orderBy("chunk_idx").collect()]
    hb = [r.chunk_hash for r in cdc_chunk_table(b, avg_words=10)
          .orderBy("chunk_idx").collect()]
    assert len(ha) > 5
    # all but the leading chunk(s) re-align: compare the tails
    n = min(len(ha), len(hb)) - 1
    assert ha[-n:] == hb[-n:]
    # word coverage is exact: chunk word counts sum to the doc's words
    total = sum(
        r.n_words
        for r in cdc_chunk_table(a, avg_words=10).collect()
    )
    assert total == 400
    # determinism across partition layouts
    many = spark.createDataFrame(
        [(i, base_text) for i in range(20)], "doc_id long, text string"
    ).repartition(7)
    out = cdc_chunk_table(many, avg_words=10)
    per_doc = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert len(set(per_doc.values())) == 1  # identical docs, identical chunking
