"""Bigram LM quality score (x17): partition invariance of the
micro-integer sum, coverage (every doc with ≥2 tokens scored, scores
≤ 0), and the ranking property the filter exists for — text made of
corpus-frequent bigrams scores higher than tokens the model has
barely seen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.llm.lm import ngram_lm_scores


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_coverage_and_range(spark, docs):
    out = ngram_lm_scores(docs).cache()
    n_scorable = docs.filter(
        F.size(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != ""
            )
        )
        >= 2
    ).count()
    assert out.count() == n_scorable
    assert out.filter(F.col("lm_score") > 0).count() == 0
    assert out.filter(F.col("n_bigrams") < 1).count() == 0


def test_partition_invariant(spark, docs):
    a = {r.doc_id: r.lm_score for r in ngram_lm_scores(docs).collect()}
    b = {
        r.doc_id: r.lm_score
        for r in ngram_lm_scores(docs.repartition(17)).collect()
    }
    assert a == b  # exact equality: integer-micro sums, no float drift


def test_frequent_bigrams_score_higher(spark):
    # 30 docs of one repeated phrase (high bigram counts) + 1 doc of
    # tokens that appear nowhere else: the model must prefer the
    # phrase docs.
    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)]
    rare = [(99, "zxqv wplk mnrt qqss ttuu vvww")]
    df = spark.createDataFrame(common + rare, ["doc_id", "text"])
    scores = {r.doc_id: r.lm_score for r in ngram_lm_scores(df).collect()}
    assert scores[0] > scores[99]
    assert all(scores[i] == scores[0] for i in range(30))  # identical docs
