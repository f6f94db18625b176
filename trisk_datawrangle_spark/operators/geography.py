"""Geography regrouping — set-similarity dedup of region labels
(SURVEY.md §2.11; rename_geographies.R:222-268).

The reference's only set-similarity operator: two scenario geographies
are "the same region" when one's country set is contained in the
other's at a tolerance. Spark-first formulation:

1. token-bucket self-join of the (geography, country) bridge on the
   country — only pairs sharing at least one member are generated, so
   the shuffle is linear in co-occurrence, never |G|² (the default;
   ``method="cross"`` keeps the aggregated-set crossJoin for the
   tolerance=0 edge where zero-overlap pairs must appear).
2. containment = |A∩B| / |A| from the co-occurrence counts.
3. canonical name = the longest name in each similarity cluster
   (rename_geographies.R:83-106), applied as a broadcast rename map.
4. the generic string-standardization rule chain (:148-176) and the
   apply-across-tables step (:187-207) finish the pipeline.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def containment_pairs(
    bridge: DataFrame,
    group_col: str = "scenario_geography",
    member_col: str = "country_iso",
    tolerance: float = 1.0,
    method: str = "bucket",
) -> DataFrame:
    """All (a, b) geography pairs with |members(a) ∩ members(b)| /
    |members(a)| ≥ tolerance, a ≠ b (rename_geographies.R:59-77).

    ``method="bucket"`` (default) joins the bridge to itself on the
    member column: each shared country is one join hit, counts per
    pair give the intersection size, and pairs with no overlap are
    never materialized — the right plan at large |G|. It requires
    tolerance > 0; ``method="cross"`` (the |G|² aggregated-set
    crossJoin) also emits zero-overlap pairs and so supports
    tolerance = 0."""
    if method == "bucket" and tolerance <= 0:
        raise ValueError(
            "bucketed containment never sees zero-overlap pairs; "
            "use method='cross' for tolerance <= 0"
        )
    dedup = bridge.select(group_col, member_col).distinct()
    if method == "bucket":
        sizes = dedup.groupBy(group_col).agg(F.count("*").alias("__na"))
        a = dedup.select(
            F.col(group_col).alias("geo_a"), F.col(member_col).alias("__m")
        )
        b = dedup.select(
            F.col(group_col).alias("geo_b"), F.col(member_col).alias("__m")
        )
        co = (
            a.join(b, "__m")
            .filter(F.col("geo_a") != F.col("geo_b"))
            .groupBy("geo_a", "geo_b")
            .agg(F.count("*").alias("__ni"))
        )
        return (
            co.join(sizes.withColumnRenamed(group_col, "geo_a"), "geo_a")
            .withColumn("containment", F.col("__ni") / F.col("__na"))
            .filter(F.col("containment") >= tolerance)
            .select("geo_a", "geo_b", "containment")
        )
    sets = dedup.groupBy(group_col).agg(
        F.collect_set(member_col).alias("__members")
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


def standardize_geography_names(col: Column | str) -> Column:
    """The generic renaming rule chain
    (rename_geographies.R:148-176), applied in order:

    1. ``&`` → `` and `` (``to_and_fullword``)
    2. title-case, but only names that contain a space
       (``geography_to_title`` — single-token names keep their casing,
       so acronyms like ``EU`` survive)
    3. strip all whitespace (``no_whitespace_renaming``)
    4. strip the NGFS ``(R5)`` suffix (``no_r5_renaming``)

    Pure Catalyst expression — apply with ``withColumn`` anywhere."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "&", " and ")
    c = F.when(c.contains(" "), F.initcap(c)).otherwise(c)
    c = F.regexp_replace(c, " ", "")
    # case-insensitive: ICU title case (stringr) capitalizes the first
    # CASED letter so "(R5)" survives step 2, while initcap upcases
    # only the first character and yields "(r5)" — stripping either
    # spelling reproduces the reference's net result.
    return F.regexp_replace(c, "(?i)\\(R5\\)", "")


def geography_rename_map(
    bridge: DataFrame,
    group_col: str = "scenario_geography",
    member_col: str = "country_iso",
    tolerance: float = 1.0,
) -> DataFrame:
    """The full §2.11 map: regroup identical geographies to the
    longest-named canonical label, then push the canonical label
    through the standardization rule chain
    (regroup_and_rename_geographies, rename_geographies.R:222-268).
    Returns (group_col, new_name)."""
    return regroup_geographies(
        bridge, group_col, member_col, tolerance
    ).withColumn("new_name", standardize_geography_names(F.col("new_name")))


def rename_geographies_across(
    tables: Mapping[str, DataFrame],
    rename_map: DataFrame,
    col: str = "scenario_geography",
) -> dict[str, DataFrame]:
    """Apply a (old → new) geography rename map to every table in
    ``tables`` (rename_stress_test_inputs,
    rename_geographies.R:187-207). The map is tiny (one row per
    distinct geography) so it broadcasts; labels without a mapping
    pass through unchanged — mirroring the reference's named-vector
    recode, which leaves unmapped values as-is."""
    mapping = rename_map.select(
        F.col(col).alias("__geo_old"), F.col("new_name").alias("__geo_new")
    ).distinct()
    out = {}
    for name, df in tables.items():
        out[name] = (
            df.join(
                F.broadcast(mapping),
                df[col] == mapping["__geo_old"],
                "left",
            )
            .withColumn(col, F.coalesce("__geo_new", col))
            .drop("__geo_old", "__geo_new")
        )
    return out
