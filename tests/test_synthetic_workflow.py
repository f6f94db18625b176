"""Reference-style synthetic integration test (SURVEY.md §5): the
reference's de-facto correctness mechanism is a chained synthetic
workflow — random companies × sectors × countries × year-columned
production with injected NULLs and all-NULL rows
(gen_synthetic_company_data.R:9-135: 200 companies, 30% NULL rate,
all-NULL rows, MW/MWh duplication for Power), pushed end-to-end
through the abcd and financial pipelines, then checked with the
§2.10 invariants.

Ported here by *semantics* (deterministic python generator, seed 42),
not by code.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.functions.scalars import any_null
from trisk_datawrangle_spark.plans.abcd import prepare_abcd_data
from trisk_datawrangle_spark.plans.financial import (
    INDICATORS,
    prepare_financial_data,
)

N_COMPANIES = 200
NA_RATE = 0.3
N_ALL_NULL = 10
YEARS = (2022, 2023, 2024, 2025, 2026, 2027)
SECTORS = {
    "Power": ["CoalCap", "GasCap", "RenewablesCap"],
    "Oil&Gas": ["Oil", "Gas"],
    "Automotive": ["ICE", "Electric"],
}
COUNTRIES = ["DE", "FR", "US", "JP", "BR"]


def _gen_wide(rng: random.Random, emissions: bool):
    rows = []
    for cid in range(1, N_COMPANIES + 1):
        sector = rng.choice(list(SECTORS))
        for tech in rng.sample(SECTORS[sector], rng.randint(1, 2)):
            for country in rng.sample(COUNTRIES, rng.randint(1, 2)):
                units = (
                    ["tCO2"]
                    if emissions
                    # MW/MWh duplication for Power
                    else (["MW", "MWh"] if sector == "Power" else ["unit"])
                )
                for unit in units:
                    vals = [
                        None
                        if rng.random() < NA_RATE
                        else round(rng.uniform(1, 1000), 2)
                        for _ in YEARS
                    ]
                    rows.append(
                        (cid, f"Company {cid}", sector, tech, country, unit, *vals)
                    )
    # all-NULL rows (must aggregate to NULL, then drop as dead series)
    for i in range(N_ALL_NULL):
        cid = N_COMPANIES + 1 + i
        rows.append(
            (cid, f"Dead {cid}", "Power", "CoalCap", "DE", "MW",
             *[None] * len(YEARS))
        )
    return rows


SCHEMA = (
    "company_id long, company_name string, ald_sector string, "
    "ald_business_unit string, ald_location string, activity_unit string, "
    + ", ".join(f"`Equity Ownership {y}` double" for y in YEARS)
)


@pytest.fixture(scope="module")
def synthetic_abcd(spark):
    rng = random.Random(42)
    activities = spark.createDataFrame(_gen_wide(rng, emissions=False), SCHEMA)
    emissions = spark.createDataFrame(_gen_wide(rng, emissions=True), SCHEMA)
    # localCheckpoint truncates the deep window/join lineage so the
    # financial stage (which reuses this frame several times) plans
    # against materialized blocks, not the full DAG
    return prepare_abcd_data(
        activities, emissions, start_year=2022, time_horizon=5
    ).localCheckpoint()


def test_abcd_output_schema_and_rows(synthetic_abcd):
    expected = {
        "company_id", "company_name", "ald_sector", "ald_business_unit",
        "country_iso2", "asset_id", "scenario_geography", "year",
        "ald_production_unit", "emissions_factor_unit", "plan_tech_prod",
        "plan_emission_factor",
    }
    assert set(synthetic_abcd.columns) == expected
    assert synthetic_abcd.count() > 0


def test_abcd_dense_spine_per_series(synthetic_abcd):
    # every surviving series covers the full model horizon (T1)
    bad = (
        synthetic_abcd.groupBy("asset_id")
        .agg(F.countDistinct("year").alias("n"))
        .filter(F.col("n") != len(YEARS))
    )
    assert bad.count() == 0


def test_abcd_no_null_production(synthetic_abcd):
    # Q3: after interpolate+LOCF+zero-fill, production is never NULL
    assert synthetic_abcd.filter(F.col("plan_tech_prod").isNull()).count() == 0


def test_abcd_dead_companies_dropped(synthetic_abcd):
    # the injected all-NULL companies (ids > N_COMPANIES) must vanish
    assert (
        synthetic_abcd.filter(F.col("company_id") > N_COMPANIES).count() == 0
    )


def test_abcd_asset_ids_unique_per_year(synthetic_abcd):
    # Q6: (asset_id, year) is a key
    dups = (
        synthetic_abcd.groupBy("asset_id", "year")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    assert dups.count() == 0


@pytest.fixture(scope="module")
def synthetic_financial(spark, synthetic_abcd):
    """Eikon-style data: ~50% of companies dropped, orphan ISINs
    (gen_synthetic_eikon_data.R:15-67 semantics)."""
    rng = random.Random(43)
    companies = synthetic_abcd.select("company_id", "ald_sector").distinct()
    ids = sorted(r["company_id"] for r in companies.select("company_id").distinct().collect())
    covered = set(rng.sample(ids, len(ids) // 2))
    rows = []
    for cid in ids:
        if cid not in covered:
            continue
        for k in range(rng.randint(1, 3)):
            country = rng.choice(COUNTRIES)
            rows.append(
                (f"{country}{cid:06d}{k}", cid, country, "EU" if country in ("DE", "FR") else "OTHER",
                 rng.uniform(0, 1),
                 rng.uniform(-0.5, 1.5),  # some implausible npm
                 rng.uniform(0, 5), rng.uniform(0, 1))
            )
    for i in range(100):  # orphan ISINs
        rows.append((f"XX{i:07d}", None, "XX", "OTHER",
                     0.5, 0.5, 1.0, 0.5))
    eikon = spark.createDataFrame(
        rows,
        "isin string, company_id long, ald_location string, region string, "
        "pd double, net_profit_margin double, debt_equity_ratio double, "
        "volatility double",
    )
    # ownership: odd uncovered companies point at a covered parent
    edges = []
    covered_list = sorted(covered)
    for cid in ids:
        if cid not in covered and cid % 2 == 1 and covered_list:
            edges.append((rng.choice(covered_list), cid, 1.0, 1))
    tree = spark.createDataFrame(
        edges or [(0, 0, 1.0, 1)],
        "parent_company_id long, subsidiary_company_id long, "
        "linking_stake double, ownership_level int",
    )
    return prepare_financial_data(
        eikon, companies, tree, min_sample_size=5
    ).cache(), companies


def test_financial_covers_every_company(synthetic_financial):
    fin, companies = synthetic_financial
    # Q2: one output row per (company, sector) — nothing lost, nothing
    # duplicated by the joins
    assert fin.count() == companies.count()
    # Q3: no NULL indicators after the cascade
    assert fin.filter(any_null(list(INDICATORS))).count() == 0


def test_financial_npm_within_gate(synthetic_financial):
    fin, _ = synthetic_financial
    # implausible raw npm was nulled pre-aggregation; medians of the
    # gated values stay in [0, 1]
    bad = fin.filter(
        (F.col("net_profit_margin") < 0) | (F.col("net_profit_margin") > 1)
    )
    assert bad.count() == 0


def test_financial_provenance_ratios_bounded(synthetic_financial):
    fin, _ = synthetic_financial
    bad = fin.filter((F.col("rawdata_ratio") < 0) | (F.col("rawdata_ratio") > 1))
    assert bad.count() == 0
    # uncovered companies exist and were filled purely from averages
    assert fin.filter(F.col("rawdata_ratio") == 0.0).count() > 0
