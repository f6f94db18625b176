"""Continuous-aggregate (rollup ladder) semantics: folds must be
exact for additive aggregates, the router must only pick grains whose
buckets tile the range, and a persisted grain must prune partitions on
range queries.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.operators.rollup import (
    build_rollups,
    rollup_range_query,
    route_grain,
)
from trisk_datawrangle_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def cents_events(spark):
    (ev,) = load_tables(spark, SF_DIR, ["events"]).values()
    return ev.withColumn("value", F.round(F.col("value") * 100).cast("long"))


def _agg_raw(ev, start, end):
    rows = (
        ev.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    )
    return {r.event_type: (r.n, r.sum_value, r.min_value, r.max_value) for r in rows}


def test_every_grain_folds_exactly(spark, cents_events):
    """day and month grains are folded from hour, never from raw —
    their answers must still equal direct aggregation of raw events."""
    rollups = build_rollups(cents_events, "ts", ["event_type"])
    start, end = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    expected = _agg_raw(cents_events, start, end)
    for grain in ("hour", "day", "month"):
        got = {
            r.event_type: (r.n, r.sum_value, r.min_value, r.max_value)
            for r in rollup_range_query(
                {grain: rollups[grain]}, start, end, ["event_type"]
            ).collect()
        }
        assert got == expected, grain


def test_skipping_a_grain_still_folds(spark, cents_events):
    rollups = build_rollups(cents_events, "ts", ["event_type"], ["hour", "month"])
    assert set(rollups) == {"hour", "month"}
    start, end = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    got = {
        r.event_type: r.sum_value
        for r in rollup_range_query(
            {"month": rollups["month"]}, start, end, ["event_type"]
        ).collect()
    }
    expected = _agg_raw(cents_events, start, end)
    assert got == {k: v[1] for k, v in expected.items()}


def test_router_picks_coarsest_tiling_grain():
    d = dt.datetime
    assert route_grain(d(2024, 1, 1), d(2024, 2, 1)) == "month"
    assert route_grain(d(2024, 1, 2), d(2024, 1, 5)) == "day"
    assert route_grain(d(2024, 1, 2, 3), d(2024, 1, 2, 7)) == "hour"
    with pytest.raises(ValueError):
        route_grain(d(2024, 1, 2, 3, 30), d(2024, 1, 3))
    # restricted ladder: month-aligned range routed within {hour, day}
    assert route_grain(d(2024, 1, 1), d(2024, 2, 1), ["hour", "day"]) == "day"


def test_persisted_grain_prunes_partitions(spark, cents_events, tmp_path_factory):
    """The materialized rollup, partitioned by bucket date, must show
    partition pruning for a range query."""
    out = str(tmp_path_factory.mktemp("rollup")) + "/day"
    rollups = build_rollups(cents_events, "ts", ["event_type"])
    rollups["day"].withColumn(
        "bucket_date", F.to_date("bucket")
    ).write.mode("overwrite").partitionBy("bucket_date").parquet(out)
    r = spark.read.parquet(out).filter(
        (F.col("bucket_date") >= "2024-01-10") & (F.col("bucket_date") < "2024-01-12")
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert r.count() > 0
    # partition filters present → only the two matching date dirs scanned
    assert "PartitionFilters: [" in plan and "bucket_date" in plan
