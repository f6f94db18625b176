"""fan_out_scan — the gated repartition for small unsplittable
scans (guide §2.5 input skew). The gate must be provably inert on
production-shaped inputs: many files, or a big input, pass through
untouched; only the small few-file case pays the exchange."""

from __future__ import annotations

import pytest

from trisk_datawrangle_spark.sources.readers import fan_out_scan


@pytest.fixture(scope="module")
def one_file_df(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fanout") / "one")
    spark.range(1000).selectExpr(
        "id", "id % 7 AS k", "cast(id * 1.5 as double) AS v"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_fires_on_small_single_file(spark, one_file_df):
    out = fan_out_scan(one_file_df, "k")
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # identical multiset of rows — the exchange moves, never edits
    assert out.count() == 1000
    a = sorted(one_file_df.collect())
    b = sorted(out.collect())
    assert a == b


def test_keyless_form_spreads(spark, one_file_df):
    out = fan_out_scan(one_file_df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert out.count() == 1000


def test_noop_when_enough_files(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fanout") / "many")
    n = spark.sparkContext.defaultParallelism
    spark.range(1000).repartition(n + 1).write.mode(
        "overwrite"
    ).parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= n
    assert fan_out_scan(df, "id") is df


def test_noop_when_input_exceeds_cap(spark, one_file_df):
    spark.conf.set("spark.trisk.fanout.maxInputBytes", "1")
    try:
        assert fan_out_scan(one_file_df, "k") is one_file_df
    finally:
        spark.conf.unset("spark.trisk.fanout.maxInputBytes")


def test_group_aggregates_unchanged(spark, one_file_df):
    from pyspark.sql import functions as F

    base = (
        one_file_df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    fanned = (
        fan_out_scan(one_file_df, "k")
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    assert sorted(base) == sorted(fanned)
