"""Per-source LCOE adjustment tests (plans/lcoe_sources.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.plans.lcoe_sources import (
    lc_adjust_steel,
    lcoe_adjust_ipr,
    mp_lc_steel_wrangling,
    oxford_lcoe_power,
)


def test_lcoe_adjust_ipr_clones_sds(spark):
    data = spark.createDataFrame(
        [
            ("WEO", "SDS", "Global", "Power", "CoalCap", "LCOE", "$/MWh",
             2020, 40.0),
            ("WEO", "SDS", "Global", "Power", "CoalCap", "LCOE", "$/MWh",
             2030, 50.0),
            # non-Global pruned
            ("WEO", "SDS", "EU", "Power", "CoalCap", "LCOE", "$/MWh",
             2020, 99.0),
            # non-SDS pruned after adjustment
            ("WEO", "STEPS", "Global", "Power", "CoalCap", "LCOE", "$/MWh",
             2020, 77.0),
        ],
        "source string, scenario string, scenario_geography string, "
        "sector string, technology string, indicator string, unit string, "
        "year int, price double",
    )
    out = lcoe_adjust_ipr(data, average_npm_power=0.2, start_year=2020)
    got = {
        (r["scenario"], r["year"]): r["price"] for r in out.collect()
    }
    # implied 40/0.8 = 50; 2030 = 50 × (40/50) = 40 — for BOTH clones
    assert got[("IPR2023_FPS", 2020)] == pytest.approx(50.0)
    assert got[("IPR2023_RPS", 2030)] == pytest.approx(40.0)
    assert len(got) == 4


def test_mp_steel_wrangle_clones_and_global(spark):
    data = spark.createDataFrame(
        [
            ("baseline", "EU", "Avg BF-BOF", 2030, 400.0),
            ("baseline", "US", "Avg BF-BOF", 2030, 600.0),
            ("baseline", "EU", "EAF", 2030, 300.0),
            ("carbon_cost", "EU", "DRI-Melt-BOF", 2030, 500.0),
            ("baseline", "EU", "Scrap", 2030, 1.0),  # dropped route
            ("other", "EU", "EAF", 2030, 1.0),  # dropped scenario
        ],
        "scenario string, region string, technology string, year int, "
        "levelized_cost double",
    )
    out = mp_lc_steel_wrangling(data)
    got = {
        (r["scenario"], r["scenario_geography"], r["technology"]): r["price"]
        for r in out.collect()
    }
    # BF-BOF cloned to BOF and BF-OHF; EAF to BF-EAF; global means added
    assert got[("baseline", "EU", "BF-BOF")] == pytest.approx(400.0)
    assert got[("baseline", "EU", "BOF")] == pytest.approx(400.0)
    assert got[("baseline", "EU", "BF-OHF")] == pytest.approx(400.0)
    assert got[("baseline", "EU", "BF-EAF")] == pytest.approx(300.0)
    assert got[("baseline", "Global", "BF-BOF")] == pytest.approx(500.0)
    assert got[("carbon_cost", "EU", "DRI-BOF")] == pytest.approx(500.0)
    assert ("baseline", "EU", "Scrap") not in got
    assert not any(s == "other" for s, _, _ in got)
    sample = out.collect()[0]
    assert sample["sector"] == "Steel" and sample["unit"] == "$/ton"


def test_lc_adjust_steel_relabels(spark):
    data = spark.createDataFrame(
        [
            ("MP", "baseline", "Global", "Steel", "BF-BOF",
             "Levelized Cost", "$/ton", 2030, 400.0),
            ("MP", "baseline", "Global", "Steel", "BF-BOF",
             "Levelized Cost", "$/ton", 2040, 500.0),
            ("MP", "carbon_cost", "Global", "Steel", "BF-BOF",
             "Levelized Cost", "$/ton", 2030, 400.0),
        ],
        "source string, scenario string, scenario_geography string, "
        "sector string, technology string, indicator string, unit string, "
        "year int, price double",
    )
    out = lc_adjust_steel(data, average_npm_steel=0.2, start_year=2030)
    got = {(r["scenario"], r["year"]): r for r in out.collect()}
    # implied = 400/0.8 = 500; 2040 = 500 × (400/500) = 400
    assert got[("Steel_baseline", 2030)]["price"] == pytest.approx(500.0)
    assert got[("Steel_baseline", 2040)]["price"] == pytest.approx(400.0)
    assert got[("Steel_NZ", 2030)]["price"] == pytest.approx(500.0)
    assert "source" not in out.columns
    assert all(r["indicator"] == "price" for r in out.collect())


def test_oxford_lcoe_matrix(spark):
    rows = []
    for y in range(2049, 2070):
        # linear LCOE -> OLS extension continues the line exactly
        rows.append(
            ("Power", "Oxford - fast_transition", y, "Coal", "none",
             "World", 100.0 + 2.0 * (y - 2049))
        )
        rows.append(
            ("Power", "Oxford - no_transition", y, "Coal", "none",
             "World", 200.0 + 1.0 * (y - 2049))
        )
    rows.append(
        ("Power", "Oxford - slow_transition", 2050, "Coal", "none",
         "World", 1.0)
    )
    rows.append(
        ("Gas", "Oxford - fast_transition", 2050, "Coal", "none",
         "World", 1.0)  # non-Power dropped
    )
    df = spark.createDataFrame(
        rows,
        "Sector string, Scenario string, Year int, Technology string, "
        "Sub_Technology string, Region string, LCOE double",
    )
    out = oxford_lcoe_power(
        df, average_npm_power=0.0, start_year=2021, ngfs_vintage=2023,
        end_year=2075,
    ).cache()
    scens = {r["scenario"] for r in out.select("scenario").distinct().collect()}
    # 3 models × (4 fast + 3 slow) + 2 Oxford labels
    assert len(scens) == 3 * 7 + 2
    assert "NGFS2023GCAM_NZ2050" in scens and "Oxford2021_base" in scens
    assert "Oxford2021_slow" not in scens
    got = {
        (r["scenario"], r["year"]): r["price"] for r in out.collect()
        if r["scenario"] in ("Oxford2021_fast", "NGFS2023REMIND_CP")
    }
    # npm 0 → adjusted price = raw first × (first/price)… cost chain:
    # implied = 100, price_y = 100 × (100 / (100 + 2Δ)); at 2049 = 100
    assert got[("Oxford2021_fast", 2049)] == pytest.approx(100.0)
    # extension years exist out to end_year for every scenario label
    assert ("Oxford2021_fast", 2075) in got
    assert ("NGFS2023REMIND_CP", 2075) in got
    assert all(v is not None for v in got.values())
