"""Hypertable-style continuous aggregates: multi-grain time rollups
with a grain router.

The pattern: materialize the event stream once per grain (hour → day →
month), each grain folding the one below it, then answer range queries
from the coarsest grain that tiles the requested range. At 100 TB the
raw table is scanned exactly once (for the finest grain); every
coarser grain aggregates the previous one (tiny), and queries touch
rollup partitions instead of raw events — partition pruning on the
bucket column does the rest.

Only additive aggregates roll up exactly (count / sum / min / max —
and mean as sum÷count); exact medians/distincts don't fold, which is
why the rollup contract carries the additive pieces, not the derived
statistic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# grain name → truncation unit understood by date_trunc
GRAINS: dict[str, str] = {"hour": "hour", "day": "day", "month": "month"}
# fold order: each grain can be computed from the one before it
GRAIN_ORDER: tuple[str, ...] = ("hour", "day", "month")


def _additive_aggs() -> list:
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def _fold_aggs() -> list:
    """Re-aggregate the additive pieces one grain up."""
    return [
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]


def fold_ladder(
    events: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    grains: Sequence[str],
    base_aggs: Sequence,
    fold_aggs: Sequence,
) -> dict[str, DataFrame]:
    """The grain-ladder scaffolding shared by every rollup flavor:
    aggregate the raw table once at the finest selected grain with
    ``base_aggs``, then fold each coarser grain from the previous one
    with ``fold_aggs`` (any coarser unit tiles exactly over a finer
    one). O(raw) work total regardless of how many grains exist; each
    grain is (buckets × groups) rows."""
    grains = [g for g in GRAIN_ORDER if g in set(grains)]
    if not grains:
        raise ValueError("need at least one grain")
    out: dict[str, DataFrame] = {}
    finest = grains[0]
    out[finest] = (
        events.withColumn("bucket", F.date_trunc(GRAINS[finest], F.col(ts_col)))
        .groupBy("bucket", *group_cols)
        .agg(*base_aggs)
    )
    for i, g in enumerate(grains[1:], start=1):
        out[g] = (
            out[grains[i - 1]]
            .withColumn("bucket", F.date_trunc(GRAINS[g], F.col("bucket")))
            .groupBy("bucket", *group_cols)
            .agg(*fold_aggs)
        )
    return out


def build_rollups(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    grains: Sequence[str] = GRAIN_ORDER,
) -> dict[str, DataFrame]:
    """Materialize the additive rollup ladder
    (count/sum/min/max). Returns {grain: DataFrame(bucket,
    *group_cols, n, sum_value, min_value, max_value)}. Callers persist
    each grain partitioned by a date-derived column
    (``.write.partitionBy(...)``) so range queries prune partitions.
    """
    return fold_ladder(
        events, ts_col, group_cols, grains, _additive_aggs(), _fold_aggs()
    )


def route_grain(start, end, grains: Sequence[str] = GRAIN_ORDER) -> str:
    """Pick the coarsest grain whose buckets tile [start, end) exactly
    — boundaries must land on bucket edges or the answer would mix
    partial buckets."""
    import datetime as dt

    def aligned(t: "dt.datetime", grain: str) -> bool:
        if grain == "hour":
            return t.minute == t.second == t.microsecond == 0
        if grain == "day":
            return aligned(t, "hour") and t.hour == 0
        if grain == "month":
            return aligned(t, "day") and t.day == 1
        raise ValueError(grain)

    for g in reversed([g for g in GRAIN_ORDER if g in set(grains)]):
        if aligned(start, g) and aligned(end, g):
            return g
    raise ValueError(f"[{start}, {end}) aligns with no grain in {grains}")


def rollup_range_query(
    rollups: dict[str, DataFrame],
    start,
    end,
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Answer an aggregate-over-range query from the routed grain:
    filter buckets in [start, end), re-aggregate the additive pieces,
    derive the mean. The bucket filter is a plain range predicate on
    the rollup's partition column — prunable at the scan."""
    g = route_grain(start, end, list(rollups))
    r = rollups[g].filter(
        (F.col("bucket") >= F.lit(start)) & (F.col("bucket") < F.lit(end))
    )
    return (
        r.groupBy(*group_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n"))
    )
