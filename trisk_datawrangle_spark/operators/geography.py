"""Geography regrouping — set-similarity dedup of region labels
(SURVEY.md §2.11; rename_geographies.R:222-268).

The reference's only set-similarity operator: two scenario geographies
are "the same region" when one's country set is contained in the
other's at a tolerance. Spark-first formulation:

1. ``collect_set(country)`` per geography (one shuffle; sets are
   small — countries ≤ ~250 — so rows stay tiny even with millions of
   geographies).
2. self cross join of the (geography, set) table — the *aggregated*
   table, not the raw bridge, so the cross join is |G|², not |rows|².
   For large |G| swap the crossJoin for a token-bucket join on a
   shared country (same results, linear in co-occurrence).
3. containment = |A∩B| / |A| via ``array_intersect`` + ``size``.
4. canonical name = the longest name in each similarity cluster
   (rename_geographies.R:83-106), applied as a broadcast rename map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def containment_pairs(
    bridge: DataFrame,
    group_col: str = "scenario_geography",
    member_col: str = "country_iso",
    tolerance: float = 1.0,
) -> DataFrame:
    """All (a, b) geography pairs with |members(a) ∩ members(b)| /
    |members(a)| ≥ tolerance, a ≠ b (rename_geographies.R:59-77)."""
    sets = (
        bridge.select(group_col, member_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.collect_set(member_col).alias("__members"))
    )
    a = sets.select(
        F.col(group_col).alias("geo_a"), F.col("__members").alias("__ma")
    )
    b = sets.select(
        F.col(group_col).alias("geo_b"), F.col("__members").alias("__mb")
    )
    pairs = a.crossJoin(b).filter(F.col("geo_a") != F.col("geo_b"))
    ratio = F.size(F.array_intersect("__ma", "__mb")) / F.size("__ma")
    return (
        pairs.withColumn("containment", ratio)
        .filter(F.col("containment") >= tolerance)
        .select("geo_a", "geo_b", "containment")
    )


def regroup_geographies(
    bridge: DataFrame,
    group_col: str = "scenario_geography",
    member_col: str = "country_iso",
    tolerance: float = 1.0,
) -> DataFrame:
    """Rename map geography → canonical (longest-named) equivalent
    (rename_geographies.R:79-106). Mutual containment at ``tolerance``
    defines equivalence; each geography maps to the longest name among
    its equivalents (itself included). Returns (geography, new_name) —
    broadcast it against fact tables to apply."""
    pairs = containment_pairs(bridge, group_col, member_col, tolerance)
    mutual = pairs.alias("p").join(
        pairs.select(
            F.col("geo_a").alias("geo_b"), F.col("geo_b").alias("geo_a")
        ).alias("q"),
        ["geo_a", "geo_b"],
        "inner",
    )
    self_pairs = (
        bridge.select(group_col).distinct()
        .select(F.col(group_col).alias("geo_a"))
        .withColumn("geo_b", F.col("geo_a"))
    )
    candidates = mutual.select("geo_a", "geo_b").unionByName(self_pairs)
    w = Window.partitionBy("geo_a").orderBy(
        F.length("geo_b").desc(), F.col("geo_b")
    )
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("geo_a").alias(group_col),
            F.col("geo_b").alias("new_name"),
        )
    )
