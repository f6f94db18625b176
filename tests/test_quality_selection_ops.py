"""Targeted properties for the round-7 curation trio: Gopher rules
(x34), DSIR importance weights (x35), duplicate spans (x36). Oracle
parity for the catalog entries rides test_oracle_parity.py; these
pin the semantic contracts the oracle can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.sampling import dsir_importance_weights
from trisk_datawrangle_spark.llm.text import (
    duplicate_spans,
    gopher_quality_table,
)


def test_gopher_rules_discriminate(spark):
    good = " ".join(
        ["the quick brown fox jumps over and rests with care that day"] * 5
    )  # 60 words, mean len ~4, all alpha, stopwords present
    too_short = "the cat sat"
    symbol_heavy = " ".join(["the of and that have with be to"] * 7) + (
        " " + "# " * 20
    )
    no_stopwords = " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbol_heavy), (4, no_stopwords),
         (5, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_table(df).collect()}
    assert out[1].passes_gopher
    assert not out[2].passes_gopher  # word count < 50
    assert not out[3].passes_gopher  # symbol ratio > 0.1
    assert not out[4].passes_gopher  # 0 stopwords
    assert not out[5].passes_gopher and out[5].n_words == 0


def test_dsir_weights_favor_target_lookalikes(spark):
    target_text = "climate risk scenario pathway transition energy policy"
    other_text = "football match goal score league player season referee"
    rows = [(i, target_text, "tgt") for i in range(10)]
    rows += [(100 + i, other_text, "raw") for i in range(10)]
    # a raw-source doc that LOOKS like the target domain must outscore
    # raw-source docs that don't
    rows.append((200, target_text, "raw"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r.logweight
        for r in dsir_importance_weights(
            df, F.col("source") == "tgt", buckets=64
        ).collect()
    }
    assert out[200] > out[100]
    assert abs(out[200] - out[0]) < 1e-9  # identical text, identical score


def test_duplicate_spans_find_planted_boilerplate(spark):
    license_blk = "this work is licensed under the creative commons license"
    rows = [
        (i, f"unique preamble {i} alpha beta {license_blk} tail {i * 3}")
        for i in range(5)
    ]
    rows.append((99, "entirely novel content with no repeated eight gram "
                     "runs anywhere in this sentence at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, n=8, min_count=2).collect()
    ids = {r.doc_id for r in out}
    assert ids == set(range(5))  # the novel doc is never flagged
    # every planted doc flags the same license span hash at least once
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.span_hash)
    shared = set.intersection(*by_doc.values())
    assert shared  # the license block's grams repeat in all five
    # positions are 1-based word indexes into the filtered word list
    assert all(r.start >= 1 for r in out)


def test_bpe_encode_matches_pair_walk(spark):
    """The replace-chain encoding must equal the reference greedy
    pair-walk (exhaustive leftmost application per merge rank) —
    including adjacent merge sites and repeated symbols."""
    from trisk_datawrangle_spark.llm.text import BPE_MERGES, bpe_encode_stats

    def pair_walk(word):
        seq = list(word)
        for a, b in BPE_MERGES:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    docs = [
        (1, "erer inin stow stat"),        # adjacent merge chains
        (2, "joinjoin partner lulu"),      # multi-rank cascades (j oin, pa r)
        (3, "aaa ststst merer"),           # repeated symbols
        (4, "zzz qqq"),                    # no merges fire
        (5, ""),                           # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in bpe_encode_stats(df).collect()}
    import re

    for doc_id, text in docs:
        words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        expect = sum(pair_walk(w) for w in words)
        assert got[doc_id].n_bpe_tokens == expect, (doc_id, expect)
        assert got[doc_id].n_words == len(words)


def test_scrub_spans_keeps_first_occurrence_only(spark):
    from trisk_datawrangle_spark.llm.text import scrub_duplicate_spans

    license_blk = ("this work is licensed under the creative commons "
                   "attribution license")
    rows = [
        (i, f"unique preamble number {i * 11} alpha beta {license_blk}")
        for i in range(4)
    ]
    rows.append((99, "entirely novel content with no repeated eight gram "
                     "runs anywhere in this sentence at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_duplicate_spans(df, n=8).collect()}
    # doc 0 is the corpus-wide first occurrence: untouched
    assert out[0].n_removed == 0
    assert "creative commons" in out[0].scrubbed_text
    # later docs lose the license words but keep their unique preamble
    for i in (1, 2, 3):
        assert out[i].n_removed >= 8
        assert "creative commons" not in out[i].scrubbed_text
        assert f"number {i * 11}" in out[i].scrubbed_text
    # the novel doc is untouched
    assert out[99].n_removed == 0
    # surviving words are a subsequence of the original token stream
    import re
    for doc_id, text in rows:
        orig = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        kept = out[doc_id].scrubbed_text.split()
        it = iter(orig)
        assert all(any(w == o for o in it) for w in kept), doc_id


def test_maximal_spans_reconstruct_planted_length(spark):
    """A planted 14-word duplicated block must reconstruct as ONE
    maximal span of exactly 14 words (7 consecutive 8-gram starts)."""
    from trisk_datawrangle_spark.catalog.llm import QUERIES as _Q  # noqa: F401
    from pyspark.sql import Window
    from trisk_datawrangle_spark.llm.text import duplicate_spans
    from pyspark.sql import functions as F2

    blk = ("alpha bravo charlie delta echo foxtrot golf hotel india "
           "juliet kilo lima mike november")  # 14 words
    rows = [
        (1, f"unique one {blk} tail one"),
        (2, f"other prefix two {blk} different tail"),
        (3, "no duplicated content in this document at all nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 8
    flagged = duplicate_spans(df, n=n).select("doc_id", "start").distinct()
    w = Window.partitionBy("doc_id").orderBy("start")
    runs = flagged.withColumn("grp", F2.col("start") - F2.row_number().over(w))
    spans = runs.groupBy("doc_id", "grp").agg(
        (F2.count(F2.lit(1)) + (n - 1)).alias("span_words")
    )
    out = {r.doc_id: r.span_words for r in spans.collect()}
    assert out == {1: 14, 2: 14}
