"""Per-source capacity-factor wrangler tests
(plans/capacity_factor_sources.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.plans.capacity_factor_sources import (
    ipr_capacity_factors_baseline,
    prepare_capacity_factors_gem_steel,
    prepare_capacity_factors_ipr,
    prepare_capacity_factors_ngfs,
    prepare_capacity_factors_oxford,
    prepare_capacity_factors_weo2023,
    weo2021_scenario_clones,
)


def test_weo2021_scenario_clones(spark):
    df = spark.createDataFrame(
        [("SPS", 0.5), ("SDS", 0.6), ("NZE", 0.7)],
        "scenario string, capacity_factor double",
    )
    out = weo2021_scenario_clones(df)
    got = {(r["scenario"], r["capacity_factor"]) for r in out.collect()}
    assert got == {
        ("WEO2021_STEPS", 0.5),
        ("WEO2021_SDS", 0.6),
        ("WEO2021_NZE", 0.7),
        ("WEO2021_NZE_2050", 0.6),  # SDS clone
        ("WEO2021_APS", 0.5),  # STEPS clone (from renamed SPS)
    }


def test_weo2023_chain(spark):
    rows = []
    for ind, v0, v1 in [
        ("Capacity", 100.0, 200.0),
        ("Electricity generation", 438.0, 876.0),
    ]:
        rows += [
            ("WEO2023", "STEPS", "Global", "Power", "CoalCap", "x", ind, 2030, v0),
            ("WEO2023", "STEPS", "Global", "Power", "CoalCap", "x", ind, 2032, v1),
        ]
    # non-Power rows are dropped
    rows.append(
        ("WEO2023", "STEPS", "Global", "Oil&Gas", "Oil", "x", "Capacity",
         2030, 5.0)
    )
    df = spark.createDataFrame(
        rows,
        "source string, scenario string, scenario_geography string, "
        "sector string, technology string, units string, indicator string, "
        "year int, value double",
    )
    out = prepare_capacity_factors_weo2023(df, start_year=2030, end_year=2032)
    got = {r["year"]: r for r in out.collect()}
    assert set(got) == {2030, 2031, 2032}
    # generation 438 TWh → 438*1000/8760 = 50 GW; cf = 50/100 = 0.5
    assert got[2030]["capacity_factor"] == pytest.approx(0.5)
    # 2031 interpolated on both sides: cap 150, gen 75 GW → 0.5
    assert got[2031]["capacity_factor"] == pytest.approx(0.5)
    assert got[2030]["scenario"] == "WEO2023_STEPS"


NGFS_CF_SCHEMA = (
    "Model string, Scenario string, Region string, Unit string, "
    "category_a string, category_c string, year int, value double"
)


def test_ngfs_chain_fan_in_and_clamp(spark):
    m = "GCAM 6.0 NGFS"
    rows = [
        # renewables: two sub-techs summed per category
        (m, "Net Zero 2050", "World", "GW", "Capacity", "Solar", 2030, 60.0),
        (m, "Net Zero 2050", "World", "GW", "Capacity", "Wind", 2030, 40.0),
        (m, "Net Zero 2050", "World", "EJ", "Secondary Energy", "Solar", 2030, 1.0),
        (m, "Net Zero 2050", "World", "EJ", "Secondary Energy", "Wind", 2030, 0.5),
        # coal: cf > 1 clamps to 1
        (m, "Net Zero 2050", "World", "GW", "Capacity", "Coal", 2030, 10.0),
        (m, "Net Zero 2050", "World", "EJ", "Secondary Energy", "Coal", 2030, 2.0),
        # gas: zero capacity with generation → 0
        (m, "Net Zero 2050", "World", "GW", "Capacity", "Gas", 2030, 0.0),
        (m, "Net Zero 2050", "World", "EJ", "Secondary Energy", "Gas", 2030, 1.0),
    ]
    out = prepare_capacity_factors_ngfs(
        spark.createDataFrame(rows, NGFS_CF_SCHEMA), start_year=2030
    )
    got = {r["technology"]: r for r in out.collect()}
    assert set(got) == {"RenewablesCap", "CoalCap", "GasCap"}
    assert got["RenewablesCap"]["scenario"] == "NGFS2023GCAM_NZ2050"
    # 1.5 EJ × 31.68808781 = 47.53 GW over 100 GW
    assert got["RenewablesCap"]["capacity_factor"] == pytest.approx(
        1.5 * 31.68808781 / 100.0
    )
    assert got["CoalCap"]["capacity_factor"] == 1.0
    assert got["GasCap"]["capacity_factor"] == 0.0


IPR_CF_SCHEMA = (
    "Variable_class string, Sub_variable_class_1 string, "
    "Sub_variable_class_2 string, Sector string, Scenario string, "
    "Region string, Units string, year int, value double"
)


def test_ipr_chain_and_baseline(spark):
    rows = [
        # capacity keyed by Sub_variable_class_2
        ("Capacity", None, "Coal", "Power", "FPS", "WORLD", "GW", 2030, 80.0),
        # generation keyed by Sub_variable_class_1 (TWh)
        ("Electricity generation", "Coal", None, "Power", "FPS", "WORLD",
         "TWh", 2030, 350.64),
        # unmapped tech → dropped
        ("Capacity", None, "Hydrogen", "Power", "FPS", "WORLD", "GW", 2030, 9.0),
    ]
    out = prepare_capacity_factors_ipr(
        spark.createDataFrame(rows, IPR_CF_SCHEMA), start_year=2030
    ).cache()
    rows_out = out.collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["technology"] == "CoalCap" and r["scenario"] == "IPR2023_FPS"
    # 350.64 TWh × 1000/(24×365.25) = 40 GW over 80 GW
    assert r["capacity_factor"] == pytest.approx(0.5)
    base = ipr_capacity_factors_baseline(out).collect()
    assert len(base) == 1 and base[0]["scenario"] == "IPR2023_baseline"


def test_oxford_hold_constant_extension(spark):
    df = spark.createDataFrame(
        [
            ("WEO2021_SDS", "Global", "CoalCap", 2039, 0.62),
            ("WEO2021_SDS", "Global", "CoalCap", 2040, 0.60),
            ("WEO2021_STEPS", "Global", "CoalCap", 2040, 0.70),
            ("WEO2021_SDS", "EU", "CoalCap", 2040, 0.99),  # non-Global drop
            ("WEO2021_APS", "Global", "CoalCap", 2040, 0.5),  # unmatched
        ],
        "scenario string, scenario_geography string, technology string, "
        "year int, capacity_factor double",
    )
    out = prepare_capacity_factors_oxford(df, hold_from=2040, end_year=2043)
    fast = {
        r["year"]: r["capacity_factor"]
        for r in out.collect()
        if r["scenario"] == "Oxford2021_fast"
    }
    assert fast[2039] == pytest.approx(0.62)
    # 2041..2043 held at the 2040 value
    assert fast[2041] == fast[2042] == fast[2043] == pytest.approx(0.60)
    assert {r["scenario"] for r in out.collect()} == {
        "Oxford2021_fast",
        "Oxford2021_base",
    }


def test_gem_steel_clones_and_constant_fill(spark):
    df = spark.createDataFrame(
        [
            ("BOF Steel", 2027, 0.8),
            ("EAF Steel", 2026, 0.6),
            ("DRI", 2026, 0.5),
            ("OHF Steel", 2026, 0.4),
        ],
        "technology string, year int, value double",
    )
    out = prepare_capacity_factors_gem_steel(df, start_year=2025, max_year=2028)
    base = {
        (r["technology"], r["year"]): r["capacity_factor"]
        for r in out.collect()
        if r["scenario"] == "Steel_baseline"
    }
    techs = {t for t, _ in base}
    assert techs == {
        "BF-BOF", "BF-EAF", "EAF", "BOF", "DRI-EAF", "DRI-BOF", "BF-OHF",
    }
    # constant fill: every year carries the series' first value
    assert base[("BOF", 2025)] == pytest.approx(0.8)
    assert base[("BOF", 2028)] == pytest.approx(0.8)
    assert base[("DRI-EAF", 2025)] == pytest.approx(0.5)
    assert base[("BF-EAF", 2028)] == pytest.approx(0.6)
    # both scenarios materialized
    assert out.select("scenario").distinct().count() == 2
    # 7 techs × 4 years × 2 scenarios
    assert out.count() == 7 * 4 * 2


def test_weo2023_zero_capacity_rows(spark):
    rows = [
        ("WEO2023", "NZE", "Global", "Power", "OilCap", "GW", "Capacity",
         2030, 0.0),
        ("WEO2023", "NZE", "Global", "Power", "OilCap", "GW",
         "Electricity generation", 2030, 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "source string, scenario string, scenario_geography string, "
        "sector string, technology string, units string, indicator string, "
        "year int, value double",
    )
    out = prepare_capacity_factors_weo2023(df, start_year=2030, end_year=2030)
    assert out.collect()[0]["capacity_factor"] == 0.0


def test_oxford_holds_last_value_when_hold_year_missing(spark):
    """A series with no row at exactly hold_from holds its LAST
    published value; years beyond hold_from in the input are
    truncated instead of conflicting with the extension."""
    df = spark.createDataFrame(
        [
            # ends at 2039 — no 2040 row
            ("WEO2021_SDS", "Global", "GasCap", 2039, 0.55),
            # runs past 2040 — 2041 input row must not duplicate
            ("WEO2021_STEPS", "Global", "GasCap", 2040, 0.70),
            ("WEO2021_STEPS", "Global", "GasCap", 2041, 0.99),
        ],
        "scenario string, scenario_geography string, technology string, "
        "year int, capacity_factor double",
    )
    out = prepare_capacity_factors_oxford(df, hold_from=2040, end_year=2042)
    rows = [
        (r["scenario"], r["year"], r["capacity_factor"])
        for r in out.collect()
    ]
    fast = {y: v for s, y, v in rows if s == "Oxford2021_fast"}
    base = {y: v for s, y, v in rows if s == "Oxford2021_base"}
    # fast (from SDS): extension holds the 2039 value, never NULL
    assert fast[2041] == pytest.approx(0.55)
    assert fast[2042] == pytest.approx(0.55)
    # base: the 2041 input row was truncated; extension holds 0.70
    assert base[2041] == pytest.approx(0.70)
    # exactly one row per (scenario, year)
    assert len(rows) == len({(s, y) for s, y, _ in rows})


def test_ipr_off_vocabulary_scenario_dropped(spark):
    rows = [
        ("Capacity", None, "Coal", "Power", "FPS", "WORLD", "GW", 2030, 80.0),
        ("Electricity generation", "Coal", None, "Power", "FPS", "WORLD",
         "TWh", 2030, 350.64),
        # unknown scenario label: dropped, not a NULL-scenario group
        ("Capacity", None, "Coal", "Power", "EPS", "WORLD", "GW", 2030, 70.0),
    ]
    out = prepare_capacity_factors_ipr(
        spark.createDataFrame(rows, IPR_CF_SCHEMA), start_year=2030
    ).collect()
    assert len(out) == 1 and out[0]["scenario"] == "IPR2023_FPS"
