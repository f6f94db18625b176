"""Per-source scenario wrangler tests (plans/scenario_sources.py) —
each fixture exercises the quirk its reference block exists for:
indicator whitelists, NA-geography poisoning, renewables fan-in,
post-share clones, trailing-zero/anchor imputation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.plans.scenario_sources import (
    ipr_baseline,
    ipr_baseline_automotive,
    preprepare_ngfs,
    wrangle_ipr,
    wrangle_oxford,
    wrangle_steel,
    wrangle_weo23,
    wrangle_weo_geco,
)

P4I_SCHEMA = (
    "Source string, Technology string, ScenarioGeography string, "
    "Sector string, Units string, Indicator string, Scenario string, "
    "Sub_Technology string, Year int, Direction string, "
    "mktFSRatio double, techFSRatio double, FairSharePerc double"
)


def _p4i_row(
    source="WEO2021",
    tech="CoalCap",
    geo="Global",
    sector="Power",
    units="GW",
    indicator="Capacity",
    scenario="STEPS",
    sub=None,
    year=2025,
    fsp=0.1,
):
    return (
        source, tech, geo, sector, units, indicator, scenario, sub, year,
        "declining", 0.0, 0.0, fsp,
    )


def test_weo_geco_filters_and_na_guard(spark):
    rows = [
        _p4i_row(),  # kept
        _p4i_row(indicator="Emissions"),  # wrong indicator for WEO
        _p4i_row(source="GECO2021", sector="Automotive", tech="ICE",
                 scenario="CurPol", indicator="Sales"),  # kept
        _p4i_row(source="GECO2021", sector="Power",
                 scenario="CurPol", indicator="Capacity"),  # GECO non-auto
        _p4i_row(tech="RenewablesCap", sub="Solar"),  # sub-tech dropped
        _p4i_row(tech="RenewablesCap", sub=None),  # kept
        # NA units on a guard scenario poisons (WEO2021, EU, Power)
        _p4i_row(geo="EU", units=None),
        _p4i_row(geo="EU", tech="GasCap"),  # same combo → also pruned
    ]
    out = wrangle_weo_geco(spark.createDataFrame(rows, P4I_SCHEMA)).cache()
    got = {
        (r["scenario"], r["scenario_geography"], r["technology"])
        for r in out.collect()
    }
    assert got == {
        ("WEO2021_STEPS", "Global", "CoalCap"),
        ("WEO2021_STEPS", "Global", "RenewablesCap"),
        ("GECO2021_CurPol", "Global", "ICE"),
    }
    assert "scenario_source" not in out.columns


def test_weo23_keeps_only_its_indicators(spark):
    rows = [
        _p4i_row(source="WEO2023", indicator="Capacity"),
        _p4i_row(source="WEO2023", indicator="Total energy supply",
                 tech="Gas", sector="Oil&Gas"),
        _p4i_row(source="WEO2023", indicator="Sales"),
        _p4i_row(source="WEO2021", indicator="Capacity"),
    ]
    out = wrangle_weo23(spark.createDataFrame(rows, P4I_SCHEMA))
    got = {(r["scenario"], r["technology"]) for r in out.collect()}
    assert got == {("WEO2023_STEPS", "CoalCap"), ("WEO2023_STEPS", "Gas")}


NGFS_SCHEMA = (
    "Model string, Scenario string, Region string, Unit string, "
    "category_b string, category_c string, year int, value double"
)


def test_ngfs_prewrangler_recodes_and_renewables_fan_in(spark):
    m = "GCAM 6.0 NGFS"
    rows = [
        (m, "Net Zero 2050", "World", "GW", "Electricity", "Solar", 2030, 10.0),
        (m, "Net Zero 2050", "World", "GW", "Electricity", "Wind", 2030, 15.0),
        (m, "Net Zero 2050", "World", "GW", "Electricity", "Coal", 2030, 20.0),
        (m, "Net Zero 2050", "World", "EJ", "Oil", None, 2030, 5.0),
        ("REMIND-MAgPIE 3.2-4.6", "Current Policies", "Europe", "GW",
         "Electricity", "Hydro", 2030, 7.0),
    ]
    out = preprepare_ngfs(
        spark.createDataFrame(rows, NGFS_SCHEMA), vintage=2023
    ).cache()
    got = {
        (r["scenario"], r["scenario_geography"], r["sector"],
         r["technology"], r["indicator"]): r["value"]
        for r in out.collect()
    }
    # solar+wind summed into one RenewablesCap series
    assert got[
        ("NGFS2023GCAM_NZ2050", "Global", "Power", "RenewablesCap", "Capacity")
    ] == pytest.approx(25.0)
    assert got[
        ("NGFS2023GCAM_NZ2050", "Global", "Power", "CoalCap", "Capacity")
    ] == pytest.approx(20.0)
    assert got[
        ("NGFS2023GCAM_NZ2050", "Global", "Oil&Gas", "Oil", "Production")
    ] == pytest.approx(5.0)
    assert got[
        ("NGFS2023REMIND_CP", "Europe", "Power", "HydroCap", "Capacity")
    ] == pytest.approx(7.0)
    assert "model" not in out.columns


IPR_SCHEMA = (
    "Variable_class string, Sub_variable_class_1 string, "
    "Sub_variable_class_2 string, Sector string, Scenario string, "
    "Region string, Units string, year int, value double"
)


def test_ipr_wrangler_shares_and_horizon(spark):
    rows = [
        # Power: coal + two renewable parts (fan-in)
        ("Cap", None, "Coal", "Power", "FPS", "WORLD", "GW", 2025, 50.0),
        ("Cap", None, "Coal", "Power", "FPS", "WORLD", "GW", 2030, 25.0),
        ("Cap", None, "Solar", "Power", "FPS", "WORLD", "GW", 2025, 10.0),
        ("Cap", None, "Solar", "Power", "FPS", "WORLD", "GW", 2030, 30.0),
        ("Cap", None, "Onshore wind", "Power", "FPS", "WORLD", "GW", 2025, 5.0),
        ("Cap", None, "Onshore wind", "Power", "FPS", "WORLD", "GW", 2030, 15.0),
        # Automotive rows incl. one past the 2042 horizon
        ("Sales", None, "BEV", "Transport", "FPS", "WORLD", "M", 2025, 1.0),
        ("Sales", None, "BEV", "Transport", "FPS", "WORLD", "M", 2045, 9.0),
        # unknown tech → NA sector → dropped
        ("Cap", "Hydrogen", None, "Industry", "FPS", "WORLD", "PJ", 2025, 3.0),
    ]
    out = wrangle_ipr(
        spark.createDataFrame(rows, IPR_SCHEMA), start_year=2025
    ).cache()
    rows_out = out.collect()
    techs = {r["technology"] for r in rows_out}
    assert techs == {"CoalCap", "RenewablesCap", "Electric"}
    ren = {
        r["year"]: (r["scenario_pathway"], r["fair_share_perc"],
                    r["direction"])
        for r in rows_out
        if r["technology"] == "RenewablesCap"
    }
    # fan-in: 10+5=15 (2025), 30+15=45 (2030)
    assert ren[2025][0] == pytest.approx(15.0)
    assert ren[2030][0] == pytest.approx(45.0)
    # green → smsp = (45-15)/sector_total(2025) = 30/65
    assert ren[2030][1] == pytest.approx(30.0 / 65.0)
    assert ren[2030][2] == "increasing"
    coal = {
        r["year"]: (r["fair_share_perc"], r["direction"], r["scenario"])
        for r in rows_out
        if r["technology"] == "CoalCap"
    }
    # declining → tmsr = (25-50)/50
    assert coal[2030][0] == pytest.approx(-0.5)
    assert coal[2030][1] == "declining"
    assert coal[2030][2] == "IPR2023_FPS"
    # Automotive: scenario split + horizon cap at 2042
    auto = [r for r in rows_out if r["ald_sector"] == "Automotive"]
    assert {r["scenario"] for r in auto} == {"IPR2023Automotive_FPS"}
    assert max(r["year"] for r in auto) < 2042


def test_ipr_baselines_clone(spark):
    weo = spark.createDataFrame(
        [("WEO2021_STEPS", "Global", 1.0), ("WEO2021_SDS", "Global", 2.0)],
        "scenario string, scenario_geography string, fair_share_perc double",
    )
    base = ipr_baseline(weo).collect()
    assert len(base) == 1 and base[0]["scenario"] == "IPR2023_baseline"
    geco = spark.createDataFrame(
        [("GECO2021_CurPol", "Global", 1.0)],
        "scenario string, scenario_geography string, fair_share_perc double",
    )
    auto = ipr_baseline_automotive(geco).collect()
    assert len(auto) == 1 and auto[0]["scenario"] == "IPR2023Automotive_baseline"


OXF_SCHEMA = (
    "`Annual energy` string, scenario string, scenario_geography string, "
    "units string, year int, value double"
)


def test_oxford_wrangler_oilcap_clone_after_shares(spark):
    rows = [
        ("gas_electricity", "fast_transition_oxford", "Global", "EJ", 2021, 40.0),
        ("gas_electricity", "fast_transition_oxford", "Global", "EJ", 2030, 20.0),
        ("solar_electricity", "fast_transition_oxford", "Global", "EJ", 2021, 10.0),
        ("solar_electricity", "fast_transition_oxford", "Global", "EJ", 2030, 30.0),
        ("wind_electricity", "fast_transition_oxford", "Global", "EJ", 2021, 6.0),
        ("wind_electricity", "fast_transition_oxford", "Global", "EJ", 2030, 14.0),
        ("coal_final", "fast_transition_oxford", "Global", "EJ", 2021, 8.0),
        ("batteries_ST_electricity", "fast_transition_oxford", "Global",
         "EJ", 2021, 1.0),
    ]
    out = wrangle_oxford(
        spark.createDataFrame(rows, OXF_SCHEMA), start_year=2021
    ).cache()
    rows_out = out.collect()
    techs = {r["technology"] for r in rows_out}
    # solar/wind folded into RenewablesCap; OilCap cloned from GasCap
    assert techs == {"GasCap", "OilCap", "RenewablesCap", "Coal"}
    gas = {
        r["year"]: r["fair_share_perc"]
        for r in rows_out
        if r["technology"] == "GasCap"
    }
    oil = {
        r["year"]: r["fair_share_perc"]
        for r in rows_out
        if r["technology"] == "OilCap"
    }
    # the clone happens after the share pass: identical fair shares
    assert gas == pytest.approx(oil)
    # declining gas: tmsr = (20-40)/40
    assert gas[2030] == pytest.approx(-0.5)
    ren = {
        r["year"]: (r["value"], r["fair_share_perc"])
        for r in rows_out
        if r["technology"] == "RenewablesCap"
    }
    assert ren[2021][0] == pytest.approx(16.0)
    assert ren[2030][0] == pytest.approx(44.0)
    # increasing → smsp against the Power sector total at 2021 (40+16)
    assert ren[2030][1] == pytest.approx((44.0 - 16.0) / 56.0)


STEEL_SCHEMA = (
    "scenario string, technology string, year int, `Production (Mt)` double"
)


def test_steel_wrangler_imputation_and_clones(spark):
    rows = [
        ("Baseline", "Avg BF-BOF", 2025, 100.0),
        ("Baseline", "Avg BF-BOF", 2027, 80.0),  # 2026 gap → stays NA
        ("Baseline", "EAF", 2025, 50.0),
        ("Baseline", "EAF", 2028, 70.0),
        ("Baseline", "DRI-Melt-BOF", 2026, 10.0),  # leading NA at 2025
        ("Baseline", "DRI-EAF", 2025, 20.0),
        ("Baseline", "DRI-EAF", 2026, 25.0),
        ("Carbon Cost", "Avg BF-BOF", 2025, 90.0),
        ("Carbon Cost", "EAF", 2025, 60.0),
        ("Carbon Cost", "DRI-Melt-BOF", 2026, 12.0),
        ("Carbon Cost", "DRI-EAF", 2025, 30.0),
        ("unmodeled", "EAF", 2025, 1.0),  # dropped scenario
        ("Baseline", "H2-DRI", 2025, 1.0),  # dropped technology
    ]
    out = wrangle_steel(
        spark.createDataFrame(rows, STEEL_SCHEMA),
        start_year=2025,
        max_year=2028,
    ).cache()
    rows_out = out.collect()
    assert {r["scenario"] for r in rows_out} == {"Steel_baseline", "Steel_NZ"}
    techs = {r["technology"] for r in rows_out}
    # renames + the three clones
    assert techs == {
        "BF-BOF", "BOF", "BF-OHF", "EAF", "BF-EAF", "DRI-BOF", "DRI-EAF",
    }
    base = {
        (r["technology"], r["year"]): r["scenario_pathway"]
        for r in rows_out
        if r["scenario"] == "Steel_baseline"
    }
    # trailing years beyond the last published value become 0
    assert base[("BF-BOF", 2028)] == 0.0
    # ... and the BOF / BF-OHF clones inherit the same series
    assert base[("BOF", 2028)] == 0.0 and base[("BF-OHF", 2027)] == 80.0
    # interior gap stays NA (no interpolation in the steel chain)
    assert base[("BF-BOF", 2026)] is None
    # DRI-BOF's leading NA takes the scenario's 2026 value
    assert base[("DRI-BOF", 2025)] == pytest.approx(10.0)
    # EAF → BF-EAF clone shares the series
    assert base[("BF-EAF", 2025)] == pytest.approx(50.0)
    # fair share = tmsr for every route, direction declining
    assert all(r["direction"] == "declining" for r in rows_out)
    eaf_2028 = [
        r
        for r in rows_out
        if r["scenario"] == "Steel_baseline"
        and r["technology"] == "EAF"
        and r["year"] == 2028
    ][0]
    assert eaf_2028["fair_share_perc"] == pytest.approx((70.0 - 50.0) / 50.0)
    assert eaf_2028["units"] == "Mt/yr" and eaf_2028["ald_sector"] == "Steel"
