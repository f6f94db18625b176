"""_shingle_profile — the r12 one-pass shingle/signature aggregate.

Two contracts: (1) VALUES — the profile's sorted distinct-hash
array, size, and signature must equal what the split shape
(shingle_hashes(distinct=True) + _signatures_from_shingles + the
verifier's own aggregation) produced, row for row; (2) SHAPE — the
whole profile costs exactly ONE exchange (the doc repartition
inside word_gram_table): the distinct and the signature groupBy
must NOT re-shuffle grams that are already id-clustered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.dedup import (
    _shingle_profile,
    _signatures_from_shingles,
    shingle_hashes,
)


def _doc_frame(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap at all here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (5, "short text"),  # fewer words than the gram width n=3
        (6, ""),  # no grams at all
        (7, "repeat repeat repeat repeat repeat repeat repeat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_profile_matches_split_shape(spark):
    df = _doc_frame(spark)
    prof = _shingle_profile(df, "text", "doc_id", 3, 16)

    sh = shingle_hashes(df, "text", "doc_id", 3, distinct=True)
    arrays = sh.groupBy("id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).alias("n_grams"),
    )
    sig = _signatures_from_shingles(sh, 16)
    expected = {
        r["id"]: (r["hs"], r["n_grams"], r["sig"])
        for r in arrays.join(sig, "id").collect()
    }
    got = {
        r["id"]: (r["hs"], r["n_grams"], r["sig"])
        for r in prof.collect()
    }
    assert got == expected
    # doc 6 has no grams: absent from both, like the split shape
    assert 6 not in got and 6 in {r["doc_id"] for r in df.collect()}


def test_profile_plan_has_single_exchange(spark):
    df = _doc_frame(spark)
    prof = _shingle_profile(df, "text", "doc_id", 3, 16)
    plan = prof._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # exactly the word_gram_table doc repartition — the profile's
    # distinct (collect_set) and K-min signature ride the same
    # clustering with zero further shuffles (each physical node
    # appears once as a numbered detail header "(n) Exchange")
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
