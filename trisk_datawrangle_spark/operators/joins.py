"""Join operators (SURVEY.md §2.3).

Every reference join is an equi-join; the engine maps them to Spark's
join types and adds the scale policy the reference never needed:
dimension/lookup sides are broadcast (``F.broadcast``), fact-fact
joins rely on AQE for skew splitting, and natural joins compute their
key set explicitly (dplyr infers it silently — schema drift would
change semantics without warning, SURVEY.md §7.3.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def semi_join(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``df`` with a match in ``other`` (J5 — the reference
    spells it ``inner_join(x %>% distinct(key))``,
    run_prepare_prewrangled_financial_data_stress_test.R:57-59).
    ``left_semi`` never duplicates and never moves ``other``'s
    payload — strictly better than the reference's idiom at scale."""
    return df.join(other.select(*on).distinct(), list(on), "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """dplyr ``anti_join`` (J4, ~15 sites, e.g.
    prepare_scenario_data.R:242)."""
    return df.join(other.select(*on).distinct(), list(on), "left_anti")


def natural_join(df: DataFrame, other: DataFrame, how: str = "outer") -> DataFrame:
    """dplyr join with no ``by=``: key = column-name intersection,
    computed explicitly and asserted non-empty (J3 full-join sites,
    e.g. prepare_prewrangled_capacity_factors.R:434)."""
    on = [c for c in df.columns if c in set(other.columns)]
    if not on:
        raise ValueError("natural_join: no shared columns")
    return df.join(other, on, how)


def closest_parent(
    child: DataFrame,
    edges: DataFrame,
    child_key: str,
    edge_child_key: str,
    level_col: str = "ownership_level",
    tie_cols: Sequence[str] = (),
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Nearest-ancestor match through an ownership tree (J9,
    prepare_prewrangled_financial_data_stress_test.R:172-217): join
    the edge list on the subsidiary key, keep the minimum
    ``ownership_level`` row per child (slice_min :195-197). Levels are
    precomputed in the data, so no graph traversal — one join + one
    window.

    ``group_cols`` widens the keep-one window beyond ``child_key``
    when the child frame is finer-grained than the join key (e.g. one
    row per (company, sector) matched through a company-keyed tree) —
    without it, all but one of a child's rows would be silently
    collapsed."""
    e = edges.withColumnRenamed(edge_child_key, child_key)
    joined = child.join(e, child_key, "left")
    keys = list(group_cols) if group_cols else [child_key]
    w = Window.partitionBy(*keys).orderBy(level_col, *tie_cols)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def bind_cols_single_row(df: DataFrame, one_row: DataFrame) -> DataFrame:
    """``bind_cols`` of a 1-row aggregate onto every row (J8,
    prepare_prewrangled_financial_data_stress_test.R:319-322) — a
    broadcast cross join, not a collect-and-lit."""
    return df.crossJoin(F.broadcast(one_row))


def union_with_precedence(
    primary: DataFrame, secondary: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Dedup-union ``bind_rows(a, b %>% anti_join(a))`` (U3,
    prep_datalake.R:112-116): keep all of ``primary``, add only
    ``secondary`` rows whose key is absent."""
    return primary.unionByName(
        secondary.join(primary.select(*on).distinct(), list(on), "left_anti"),
        allowMissingColumns=True,
    )
