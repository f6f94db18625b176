"""Bucketed-table co-located join: the plan must prove the shuffle
is gone, and the results must match the plain join exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.sources.bucketed import (
    assert_no_shuffle_join,
    bucketed_join,
    write_bucketed,
)
from trisk_datawrangle_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    write_bucketed(
        t["orders"], "bktest.orders_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        t["lineitem"], "bktest.lineitem_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield t
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_join_plans_no_exchange(spark, bucketed_pair):
    # at test scale the dim side auto-broadcasts, which also avoids a
    # shuffle but proves nothing about bucketing — force the big-join
    # strategy the 100 TB case would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("bktest.lineitem_b")
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(spark.table("bktest.orders_b"), "o_orderkey")
        )
        # the join itself must not shuffle either bucketed side
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert_no_shuffle_join(j)
        # ... and an aggregate on top still executes
        agg = j.groupBy("o_orderpriority").agg(
            F.sum("l_extendedprice").alias("rev")
        )
        assert agg.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    t = bucketed_pair
    plain = (
        t["lineitem"]
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(t["orders"], "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    bucketed = (
        spark.table("bktest.lineitem_b")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table("bktest.orders_b"), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in bucketed.collect()}
    assert a == b


def test_path_read_loses_bucketing_and_guard_fires(spark, bucketed_pair):
    """The failure mode the guard exists for: reading the same files
    by PATH drops bucket metadata and reintroduces the Exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        path_df = spark.read.parquet(f"{wh}/bktest.db/orders_b")
        j = (
            spark.table("bktest.lineitem_b")
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(path_df, "o_orderkey")
        )
        with pytest.raises(AssertionError):
            assert_no_shuffle_join(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
