"""Tests for the TRISK-v2 assembly stage (plans/trisk_v2.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.plans.trisk_v2 import (
    align_to_common_scenarios,
    assemble_assets_data,
    assemble_scenarios_data,
)


def test_alignment_prunes_to_intersection(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "scenario string, scenario_geography string, x double"
    )
    scen = mk([("A", "Global", 1.0), ("B", "Global", 1.0), ("C", "EU", 1.0)])
    price = mk([("A", "Global", 1.0), ("B", "Global", 1.0)])
    cf = mk([("A", "Global", 1.0), ("C", "EU", 1.0)])
    s2, p2, c2 = align_to_common_scenarios(scen, price, cf)
    keep = {(r["scenario"], r["scenario_geography"]) for r in s2.collect()}
    assert keep == {("A", "Global")}
    assert p2.count() == 1 and c2.count() == 1


def test_assets_data_capacity_factor(spark):
    abcd = spark.createDataFrame(
        [
            (1, "Power", "1_1", 2022, 50.0),
            (1, "Power", "1_1", 2023, 100.0),
            (2, "Power", "2_1", 2022, 0.0),
            (2, "Power", "2_1", 2023, 0.0),
        ],
        "company_id long, ald_sector string, asset_id string, year int, "
        "plan_tech_prod double",
    )
    fin = spark.createDataFrame(
        [(1, "Power", 0.1, 0.2, 1.5, 0.3)],
        "company_id long, ald_sector string, pd double, "
        "net_profit_margin double, debt_equity_ratio double, "
        "volatility double",
    )
    out = assemble_assets_data(abcd, fin).cache()
    a1 = {r["year"]: r["capacity_factor"] for r in out.filter(F.col("asset_id") == "1_1").collect()}
    assert a1[2022] == pytest.approx(0.5)
    assert a1[2023] == pytest.approx(1.0)
    # all-zero asset → factor 0, not NULL/NaN
    assert all(
        r["capacity_factor"] == 0.0
        for r in out.filter(F.col("asset_id") == "2_1").collect()
    )
    # financials attached; missing company → NULLs survive (left join)
    assert out.filter(F.col("company_id") == 1).collect()[0]["pd"] == pytest.approx(0.1)
    assert out.filter(F.col("company_id") == 2).collect()[0]["pd"] is None


def test_scenarios_data_join_and_provider(spark):
    scen = spark.createDataFrame(
        [("WEO_STEPS", "Global", "Power", "CoalCap", 2022, -0.1)],
        "scenario string, scenario_geography string, ald_sector string, "
        "ald_business_unit string, year int, fair_share_perc double",
    )
    cf = spark.createDataFrame(
        [("WEO_STEPS", "Global", "CoalCap", 2022, 0.55)],
        "scenario string, scenario_geography string, "
        "ald_business_unit string, year int, capacity_factor double",
    )
    # geography-free after the reference's select(-scenario_geography)
    # happens inside the assembler; the raw price table still has it
    price = spark.createDataFrame(
        [("WEO_STEPS", "Global", "Power", 2022, 42.0)],
        "scenario string, scenario_geography string, sector string, "
        "year int, price double",
    )
    # NGFS-keyed carbon: 3 models, 'World' vocabulary — must reduce
    # to ONE row per (scenario, geography, year) and conform to
    # 'Global', not fan the scenarios row out 3×
    carbon = spark.createDataFrame(
        [
            ("GCAM", "WEO_STEPS", "World", "Price|Carbon", 2022, 70.0),
            ("REMIND", "WEO_STEPS", "World", "Price|Carbon", 2022, 75.0),
            ("MESSAGE", "WEO_STEPS", "World", "Price|Carbon", 2022, 80.0),
        ],
        "model string, scenario string, scenario_geography string, "
        "variable string, year int, carbon_tax double",
    )
    rows = assemble_scenarios_data(scen, cf, price, carbon).collect()
    assert len(rows) == 1, "multi-model carbon must not fan out"
    row = rows[0]
    assert row["capacity_factor"] == pytest.approx(0.55)
    assert row["price"] == pytest.approx(42.0)
    assert row["carbon_tax"] == pytest.approx(75.0)  # mean over models
    assert row["scenario_provider"] == "WEO"


def test_scenarios_data_price_join_is_technology_granular(spark):
    """run_workflow.R:197-199: prices join on (scenario, ald_sector,
    ald_business_unit, year) with geography dropped, INNER — a row
    whose business unit has no price is dropped, and a two-technology
    price table must not cross-fan."""
    scen = spark.createDataFrame(
        [
            ("S", "Global", "Power", "CoalCap", 2022, -0.1),
            ("S", "Global", "Power", "GasCap", 2022, -0.2),
            ("S", "Global", "Power", "HydroCap", 2022, 0.3),
        ],
        "scenario string, scenario_geography string, ald_sector string, "
        "ald_business_unit string, year int, fair_share_perc double",
    )
    cf = spark.createDataFrame(
        [("S", "Global", "CoalCap", 2022, 0.5)],
        "scenario string, scenario_geography string, "
        "ald_business_unit string, year int, capacity_factor double",
    )
    price = spark.createDataFrame(
        [
            ("S", "EU", "Power", "CoalCap", 2022, 40.0),
            ("S", "Global", "Power", "CoalCap", 2022, 40.0),
            ("S", "Global", "Power", "GasCap", 2022, 60.0),
        ],
        "scenario string, scenario_geography string, sector string, "
        "ald_business_unit string, year int, price double",
    )
    out = assemble_scenarios_data(scen, cf, price).cache()
    got = {r["ald_business_unit"]: r["price"] for r in out.collect()}
    # geography dropped + distinct: the EU duplicate collapses; Hydro
    # has no price so the inner join drops it
    assert got == {"CoalCap": 40.0, "GasCap": 60.0}
    assert out.count() == 2
