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
    price = spark.createDataFrame(
        [("WEO_STEPS", "Global", "Power", 2022, 42.0)],
        "scenario string, scenario_geography string, sector string, "
        "year int, price double",
    )
    carbon = spark.createDataFrame(
        [("WEO_STEPS", "Global", 2022, 75.0)],
        "scenario string, scenario_geography string, year int, "
        "carbon_tax double",
    )
    row = assemble_scenarios_data(scen, cf, price, carbon).collect()[0]
    assert row["capacity_factor"] == pytest.approx(0.55)
    assert row["price"] == pytest.approx(42.0)
    assert row["carbon_tax"] == pytest.approx(75.0)
    assert row["scenario_provider"] == "WEO"
