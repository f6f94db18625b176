"""Feature-prep operators (x18/x19): equal-frequency bin sizes,
deterministic tie handling, exact-moment z-scores (partition
invariance, zero-variance policy, unit variance of the output)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.mlprep import group_zscore, quantile_bins
from trisk_datawrangle_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_tables(spark, sf_dir, ["orders"])["orders"]


def test_bins_equal_frequency(spark, orders):
    b = quantile_bins(orders, "o_totalprice", 10, ["o_orderpriority"], "o_orderkey")
    sizes = (
        b.groupBy("o_orderpriority", "bin")
        .count()
        .groupBy("o_orderpriority")
        .agg((F.max("count") - F.min("count")).alias("spread"))
        .collect()
    )
    assert all(r.spread <= 1 for r in sizes)  # NTILE: sizes differ by ≤1


def test_bins_partition_invariant(spark, orders):
    a = {
        r.o_orderkey: r.bin
        for r in quantile_bins(
            orders, "o_totalprice", 10, ["o_orderpriority"], "o_orderkey"
        ).collect()
    }
    b = {
        r.o_orderkey: r.bin
        for r in quantile_bins(
            orders.repartition(13), "o_totalprice", 10,
            ["o_orderpriority"], "o_orderkey",
        ).collect()
    }
    assert a == b


def test_zscore_partition_invariant_and_standardized(spark, orders):
    z1 = {
        r.o_orderkey: r.zscore
        for r in group_zscore(
            orders, "o_totalprice", ["o_orderpriority"], "o_orderkey"
        ).collect()
    }
    z2 = {
        r.o_orderkey: r.zscore
        for r in group_zscore(
            orders.repartition(13), "o_totalprice",
            ["o_orderpriority"], "o_orderkey",
        ).collect()
    }
    assert z1 == z2  # exact equality: integer moments, no float drift
    vals = [v for v in z1.values() if v is not None]
    mean = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals)
    assert abs(mean) < 1e-3
    assert abs(var - 1.0) < 1e-2


def test_zscore_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 3.0)],
        ["id", "g", "v"],
    )
    z = {r.id: r.zscore for r in group_zscore(df, "v", ["g"], "id").collect()}
    assert z[1] is None and z[2] is None  # constant group
    assert z[3] is not None and math.isclose(z[3], -z[4])
