"""HLL sketch-rollup properties: the union of sketches is the sketch
of the union (fold invariance), estimates stay inside HLL error
bounds, and merging is partition-layout independent.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trisk_datawrangle_spark.operators.sketches import (
    hll_range_distinct,
    hll_rollup,
)
from trisk_datawrangle_spark.sources.readers import load_tables

START, END = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)


@pytest.fixture(scope="module")
def events(spark):
    (ev,) = load_tables(spark, SF_DIR, ["events"]).values()
    return ev


def _estimates(rollups, grain):
    return {
        r.event_type: r.approx_distinct
        for r in hll_range_distinct(
            {grain: rollups[grain]}, START, END, ["event_type"]
        ).collect()
    }


def test_fold_invariance_across_grains(spark, events):
    """Estimating from month-folded sketches must equal estimating
    from hour sketches directly — sketch union is associative, so the
    ladder loses nothing."""
    rollups = hll_rollup(events, "ts", ["event_type"], "user_id")
    hour, day, month = (
        _estimates(rollups, g) for g in ("hour", "day", "month")
    )
    assert hour == day == month


def test_estimates_within_hll_error(spark, events):
    rollups = hll_rollup(events, "ts", ["event_type"], "user_id")
    approx = _estimates(rollups, "month")
    exact = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        # lg_k=12 → ~1.6% relative standard error; allow 5σ
        assert abs(approx[k] - exact[k]) <= max(3, 0.08 * exact[k]), k


def test_merge_partition_layout_independent(spark, events):
    a = hll_rollup(events, "ts", ["event_type"], "user_id")
    b = hll_rollup(events.repartition(13), "ts", ["event_type"], "user_id")
    assert _estimates(a, "month") == _estimates(b, "month")
