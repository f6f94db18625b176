"""Scale-path aggregate properties: the approximate median must stay
inside its documented rank-error bound against the exact quantiles,
and must be partition-layout independent (sketch merge is
deterministic for a fixed accuracy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.functions.aggregates import median, median_approx
from trisk_datawrangle_spark.sources.readers import load_tables


def test_median_approx_within_rank_bound(spark):
    (li,) = load_tables(spark, SF_DIR, ["lineitem"]).values()
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            median_approx("l_extendedprice").alias("approx"),
            F.percentile("l_extendedprice", 0.49).alias("p49"),
            F.percentile("l_extendedprice", 0.51).alias("p51"),
            median("l_extendedprice").alias("exact"),
        )
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        # rank error ≤ n/accuracy ≪ 1% → the estimate sits between
        # the exact 49th and 51st percentile values
        assert r.p49 <= r.approx <= r.p51, r
        # and the exact median does too (sanity on the bracket)
        assert r.p49 <= r.exact <= r.p51, r


def test_median_approx_partition_independent(spark):
    (li,) = load_tables(spark, SF_DIR, ["lineitem"]).values()

    def vals(df):
        return {
            r.l_returnflag: r.m
            for r in df.groupBy("l_returnflag")
            .agg(median_approx("l_extendedprice").alias("m"))
            .collect()
        }

    assert vals(li) == vals(li.repartition(17))
