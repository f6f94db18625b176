"""Geography §2.11 tests: standardization rule chain, token-bucket
containment vs the crossJoin formulation, apply-across-tables, and the
no-cartesian plan audit (rename_geographies.R:59-207)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.geography import (
    containment_pairs,
    geography_rename_map,
    regroup_geographies,
    rename_geographies_across,
    standardize_geography_names,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("OECD & EU (R5)", "OecdAndEu"),  # all four rules
        ("latin america", "LatinAmerica"),  # title-case + space strip
        ("EU", "EU"),  # single token keeps casing
        ("lower", "lower"),  # single token, stays lower
        ("Middle East", "MiddleEast"),
        ("A&B", "AAndB"),  # & without surrounding spaces
    ],
)
def test_standardize_rule_chain(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "label string")
    out = df.select(
        standardize_geography_names("label").alias("v")
    ).collect()
    assert out[0]["v"] == expected


def _bridge(spark):
    rows = [
        ("Europe", "DE"),
        ("Europe", "FR"),
        ("Europe", "IT"),
        ("European Union", "DE"),
        ("European Union", "FR"),
        ("European Union", "IT"),
        ("Western Europe", "DE"),
        ("Western Europe", "FR"),
        ("Asia", "CN"),
        ("Asia", "JP"),
    ]
    return spark.createDataFrame(
        rows, "scenario_geography string, country_iso string"
    )


def test_bucketed_matches_cross(spark):
    b = _bridge(spark)
    for tol in (0.5, 1.0):
        got_b = {
            (r["geo_a"], r["geo_b"], round(r["containment"], 9))
            for r in containment_pairs(b, tolerance=tol).collect()
        }
        got_c = {
            (r["geo_a"], r["geo_b"], round(r["containment"], 9))
            for r in containment_pairs(
                b, tolerance=tol, method="cross"
            ).collect()
        }
        assert got_b == got_c and got_b


def test_bucketed_rejects_zero_tolerance(spark):
    with pytest.raises(ValueError):
        containment_pairs(_bridge(spark), tolerance=0.0)


def test_regroup_longest_name_canonical(spark):
    got = {
        r["scenario_geography"]: r["new_name"]
        for r in regroup_geographies(_bridge(spark), tolerance=1.0).collect()
    }
    # Europe ≡ European Union (same set) → both take the longest name;
    # Western Europe is contained but not mutual; Asia maps to itself.
    assert got["Europe"] == "European Union"
    assert got["European Union"] == "European Union"
    assert got["Western Europe"] == "Western Europe"
    assert got["Asia"] == "Asia"


def test_rename_map_applies_standardization(spark):
    got = {
        r["scenario_geography"]: r["new_name"]
        for r in geography_rename_map(_bridge(spark), tolerance=1.0).collect()
    }
    assert got["Europe"] == "EuropeanUnion"
    assert got["Western Europe"] == "WesternEurope"
    assert got["Asia"] == "Asia"


def test_rename_across_tables(spark):
    mapping = geography_rename_map(_bridge(spark), tolerance=1.0)
    t1 = spark.createDataFrame(
        [("Europe", 1.0), ("Asia", 2.0), ("Atlantis", 3.0)],
        "scenario_geography string, v double",
    )
    t2 = spark.createDataFrame(
        [("Western Europe", 9)], "scenario_geography string, n int"
    )
    out = rename_geographies_across({"a": t1, "b": t2}, mapping)
    got_a = {r["scenario_geography"]: r["v"] for r in out["a"].collect()}
    # unmapped labels pass through unchanged
    assert got_a == {"EuropeanUnion": 1.0, "Asia": 2.0, "Atlantis": 3.0}
    assert out["b"].collect()[0]["scenario_geography"] == "WesternEurope"


def test_rename_map_plan_has_no_cartesian(spark, sf_dir):
    """The bucketed containment path must never fall back to a
    cross/nested-loop join — that is the whole point of the
    token-bucket formulation at large |G|."""
    from trisk_datawrangle_spark.catalog import QUERIES

    df = QUERIES["g2_regroup_rename"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
