"""Per-source price wrangler tests (plans/price_sources.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.plans.price_sources import (
    create_automotive_prices,
    ipr_prices_baseline,
    wrangle_power_lcoe,
    wrangle_prices_ipr,
    wrangle_prices_ngfs,
    wrangle_prices_oxford,
    wrangle_prices_weo2021,
)

POWER_SCHEMA = (
    "source string, scenario string, region string, technology string, "
    "indicator string, unit string, `2020` double, `2022` double"
)


def test_power_lcoe_fan_in_clones_and_locf(spark):
    rows = [
        # two renewable sub-techs fan into one RenewablesCap MEAN
        ("WEO2021", "SDS", "EU", "Solar PV", "LCOE", "$/MWh", 40.0, 20.0),
        ("WEO2021", "SDS", "EU", "Wind onshore", "LCOE", "$/MWh", 60.0, 30.0),
        # Gas CCGT -> GasCap; 2022 missing -> LOCF carries 80
        ("WEO2021", "SDS", "EU", "Gas CCGT", "LCOE", "$/MWh", 80.0, None),
        # non-LCOE row dropped
        ("WEO2021", "SDS", "EU", "Coal", "CAPEX", "$/MWh", 9.0, 9.0),
    ]
    out = wrangle_power_lcoe(spark.createDataFrame(rows, POWER_SCHEMA))
    got = {
        (r["technology"], r["scenario_geography"], r["year"]): r["price"]
        for r in out.collect()
    }
    assert got[("RenewablesCap", "EU", 2020)] == pytest.approx(50.0)
    assert got[("RenewablesCap", "EU", 2022)] == pytest.approx(25.0)
    # placeholder clones
    assert got[("HydroCap", "EU", 2020)] == pytest.approx(50.0)
    assert got[("OilCap", "EU", 2022)] == pytest.approx(80.0)  # LOCF'd
    assert got[("GasCap", "EU", 2022)] == pytest.approx(80.0)
    # global mean rows exist for every technology
    assert got[("GasCap", "Global", 2020)] == pytest.approx(80.0)
    assert ("CoalCap", "EU", 2020) not in got  # CAPEX row dropped


def test_weo2021_full_chain_interpolates_and_asserts(spark):
    fossil = spark.createDataFrame(
        [
            ("WEO2020", "Crude oil", "usd/barrel", "US", "STEPS", 100.0, 200.0),
            ("WEO2020", "Coal", "usd/tonne", "US", "STEPS", 50.0, 70.0),
        ],
        "source string, sector string, unit string, scenario_geography "
        "string, scenario string, `2020` double, `2022` double",
    )
    power = spark.createDataFrame(
        [("WEO2020", "STEPS", "US", "Coal", "LCOE", "$/MWh", 30.0, 50.0)],
        POWER_SCHEMA,
    )
    out = wrangle_prices_weo2021(fossil, power)
    got = {
        (r["technology"], r["scenario_geography"], r["year"]): r["price"]
        for r in out.collect()
    }
    # barrel -> GJ (x0.16), 2021 interpolated midpoint
    assert got[("Oil", "US", 2020)] == pytest.approx(16.0)
    assert got[("Oil", "US", 2021)] == pytest.approx(24.0)
    # coal unconverted; Gas/Coal global-mean rows present
    assert got[("Coal", "Global", 2020)] == pytest.approx(50.0)
    assert got[("CoalCap", "US", 2021)] == pytest.approx(40.0)
    # no NA prices anywhere (the reference's closing assert)
    assert all(v is not None for v in got.values())


NGFS_SCHEMA = (
    "Model string, Scenario string, Region string, Unit string, "
    "category_a string, category_c string, year int, value double"
)


def test_ngfs_price_units_and_key(spark):
    m = "GCAM 6.0 NGFS"
    rows = [
        (m, "Net Zero 2050", "World", "$/GJ", "price", "Oil", 2030, 10.0),
        (m, "Net Zero 2050", "World", "$/GJ", "price", "Oil", 2032, 14.0),
        (m, "Net Zero 2050", "World", "$/GJ", "price", "Coal", 2030, 2.0),
    ]
    out = wrangle_prices_ngfs(
        spark.createDataFrame(rows, NGFS_SCHEMA), start_year=2030
    )
    got = {(r["technology"], r["year"]): r for r in out.collect()}
    assert got[("Oil", 2030)]["scenario"] == "NGFS2023GCAM_NZ2050"
    assert got[("Oil", 2031)]["price"] == pytest.approx(12.0)  # interpolated
    assert got[("Oil", 2030)]["unit"] == "$/GJ"
    # coal EJ-price -> $/tonnes via the published factor
    assert got[("Coal", 2030)]["price"] == pytest.approx(2.0 / 0.03414368)
    assert got[("Coal", 2030)]["unit"] == "$/tonnes"


IPR_PRICE_SCHEMA = (
    "Sub_variable_class_1 string, Variable_class string, Scenario string, "
    "Region string, Units string, year int, value double"
)


def test_ipr_price_means(spark):
    rows = [
        # coal: two regions -> global mean 60
        ("Coal", "price", "FPS", "EU", "USD / tonne", 2030, 50.0),
        ("Coal", "price", "FPS", "US", "USD / tonne", 2030, 70.0),
        # gas: high/low x two regions -> regional means 20/40 -> 30
        ("Natural gas", "high price", "FPS", "EU", "USD / MMBtu", 2030, 18.0),
        ("Natural gas", "high price", "FPS", "US", "USD / MMBtu", 2030, 22.0),
        ("Natural gas", "low price", "FPS", "EU", "USD / MMBtu", 2030, 38.0),
        ("Natural gas", "low price", "FPS", "US", "USD / MMBtu", 2030, 42.0),
        # oil: high/low -> mean 100
        ("Oil", "high price", "FPS", "World", "USD / Barrel", 2030, 80.0),
        ("Oil", "low price", "FPS", "World", "USD / Barrel", 2030, 120.0),
    ]
    out = wrangle_prices_ipr(
        spark.createDataFrame(rows, IPR_PRICE_SCHEMA), start_year=2030
    )
    got = {r["technology"]: r for r in out.collect()}
    assert got["Coal"]["price"] == pytest.approx(60.0)
    assert got["Coal"]["unit"] == "usd/tonne"
    assert got["Gas"]["price"] == pytest.approx(30.0 * 0.9478171203)
    assert got["Gas"]["unit"] == "GJ"
    assert got["Oil"]["price"] == pytest.approx(100.0 * 0.16)
    assert {r["scenario_geography"] for r in out.collect()} == {"Global"}


def test_ipr_baseline_relabel(spark):
    df = spark.createDataFrame(
        [("WEO2021_STEPS", 1.0), ("WEO2021_SDS", 2.0)],
        "scenario string, price double",
    )
    out = ipr_prices_baseline(df).collect()
    assert len(out) == 1 and out[0]["scenario"] == "IPR2023_baseline"


def test_oxford_ols_extension(spark):
    # price linear in year over the fit window -> extension continues
    # the exact line
    rows = [
        ("Oil", "Fossil Fuels", "Oxford - fast_transition", "World", y,
         3.6 * (10.0 + 2.0 * (y - 2049)))
        for y in range(2045, 2070)
    ] + [
        ("Oil", "Fossil Fuels", "Oxford - slow_transition", "World", 2050,
         99.0)
    ]
    df = spark.createDataFrame(
        rows,
        "Technology string, Sector string, Scenario string, Region string, "
        "Year int, LCOE double",
    )
    out = wrangle_prices_oxford(df, start_year=2045, end_year=2075)
    got = {
        (r["scenario"], r["year"]): r["price"] for r in out.collect()
    }
    # converted /3.6: price(y) = 10 + 2(y-2049); OLS over 2049-2069
    # recovers the line, so 2075 = 10 + 2*26 = 62
    assert got[("Oxford2021_fast", 2070)] == pytest.approx(52.0)
    assert got[("Oxford2021_fast", 2075)] == pytest.approx(62.0)
    # slow scenario dropped
    assert not any(s == "Oxford2021_slow" for s, _ in got)
    # sector/unit recodes
    sample = [r for r in out.collect() if r["year"] == 2050][0]
    assert sample["sector"] == "Oil&Gas" and sample["unit"] == "GJ"


def test_automotive_unit_prices(spark):
    scen = spark.createDataFrame(
        [
            ("NZE", "Automotive", "ICE", 2030, 0.5),
            ("NZE", "Automotive", "ICE", 2031, 0.4),
            ("NZE", "Power", "CoalCap", 2030, 0.3),
        ],
        "scenario string, ald_sector string, ald_business_unit string, "
        "year int, fair_share_perc double",
    )
    out = create_automotive_prices(scen).collect()
    assert len(out) == 2
    assert all(
        r["price"] == 1.0 and r["unit"] == "dummy" and r["sector"] == "Automotive"
        for r in out
    )
