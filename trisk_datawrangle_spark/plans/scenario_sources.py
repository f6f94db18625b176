"""Per-source scenario wranglers — the reference's hardcoded recode
blocks as data-driven configs over the engine's primitives
(R/prepare_scenario_data.R:172-1065).

Each public function mirrors one reference wrangler:

====================  ==============================================
function              reference
====================  ==============================================
wrangle_weo_geco      prepare_scenario_data (:172-255) — WEO2021 +
                      GECO2021 P4I-formatted files
wrangle_weo23         prepare_scenario_data_weo23 (:262-309)
preprepare_ngfs       preprepare_ngfs_scenario_data (:435-505) and
                      the v5 variant (:533-607) via ``vintage`` /
                      ``model_recode``
wrangle_ipr           prepare_IPR_scenario_data2023 (:613-760),
                      including IPR's own tmsr/smsp variant
                      (:713-732; groups carry ``units``)
ipr_baseline /        prepare_IPR_baseline_scenario (:764-772) and
ipr_baseline_auto     the Automotive clone (:776-832)
wrangle_oxford        prepare_OXF_scenario_data (:836-935), incl.
                      the OilCap-from-GasCap clone AFTER the share
                      calculation (:911-915)
wrangle_steel         prepare_steel_scenario_data (:938-1065)
====================  ==============================================

All transformations are Catalyst expressions (recode = chained
``when``; clones = filter+relabel+union; shares = two window
partitionings). Nothing collects; the vocabulary tables below are
plan literals. Scale: these run over model-output pathway tables —
small relative to asset facts — but the shapes (window over series
keys, one shuffle per share pass) hold at any multiple.

Semantics note: Spark/DuckDB ``sum`` skips NULLs where R's
``sum(..., na.rm = FALSE)`` propagates them. In the reference chains
the share sums run on dense interpolated series, so the difference
is immaterial there; series with interior NAs (steel) use tmsr only,
matching the reference's own advice.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.functions.scalars import recode
from trisk_datawrangle_spark.operators.setops import clone_recode, union_by_name
from trisk_datawrangle_spark.operators.windows import (
    add_market_share_columns,
)

# ------------------------------------------------------------------ #
# WEO2021 / GECO2021 (prepare_scenario_data, :172-255)               #
# ------------------------------------------------------------------ #

#: Indicator whitelist per source pattern (:186-191): raw-data
#: inconsistencies force different indicator sets per provider.
P4I_INDICATOR_RULES: Mapping[str, Sequence[str]] = {
    "WEO2021": ("Capacity", "Energy Supply", "Production", "Sales"),
    "GECO2021": ("Capacity", "Production", "Sales"),
}

#: Scenarios whose NA geographies poison the whole combination
#: (:227-239).
NA_GUARD_SCENARIOS = (
    "WEO2021_STEPS",
    "WEO2021_SDS",
    "WEO2021_NZE_2050",
    "WEO2021_APS",
    "WEO2020_SPS",
    "GECO2021_CurPol",
    "GECO2021_1.5C-Unif",
    "GECO2021_NDC-LTS",
)

_P4I_RENAME = {
    "Source": "scenario_source",
    "ScenarioGeography": "scenario_geography",
    "Scenario": "scenario",
    "Sector": "ald_sector",
    "Units": "units",
    "Technology": "technology",
    "Year": "year",
    "Direction": "direction",
    "FairSharePerc": "fair_share_perc",
}


def _p4i_rename_concat(data: DataFrame) -> DataFrame:
    """Shared rename + source-prefixed scenario + distinct
    (:203-224)."""
    out = data.select(
        *[F.col(src).alias(dst) for src, dst in _P4I_RENAME.items()]
    )
    return out.withColumn(
        "scenario", F.concat_ws("_", "scenario_source", "scenario")
    ).distinct()


def wrangle_weo_geco(
    data: DataFrame,
    indicator_rules: Mapping[str, Sequence[str]] = P4I_INDICATOR_RULES,
    na_guard_scenarios: Sequence[str] = NA_GUARD_SCENARIOS,
    sector_tech_lookup: DataFrame | None = None,
) -> DataFrame:
    """prepare_scenario_data (:172-255): the WEO2021+GECO2021 path
    over the already-P4I-formatted scenario file. Filters per
    indicator whitelist, GECO restricted to Automotive (:193-196),
    sub-technology'd RenewablesCap dropped (:197-199), rename +
    source-prefixed scenario + distinct, then the NA-geography
    anti-join (:227-241): a (source, geography, sector) is removed
    everywhere as soon as any guard scenario has a NULL anywhere in
    it. Optionally prunes to the lookup's sectors and removes
    incomplete sectors (:244-250)."""
    keep = None
    for pattern, indicators in indicator_rules.items():
        cond = F.col("Source").contains(pattern) & F.col("Indicator").isin(
            *indicators
        )
        keep = cond if keep is None else keep | cond
    data = data.filter(keep)
    data = data.filter(
        ~(F.col("Source").contains("GECO2021") & (F.col("Sector") != "Automotive"))
    )
    data = data.filter(
        ~(
            (F.col("Technology") == "RenewablesCap")
            & F.col("Sub_Technology").isNotNull()
        )
    )
    renamed = _p4i_rename_concat(data)
    any_na = None
    for c in renamed.columns:
        cond = F.col(c).isNull()
        any_na = cond if any_na is None else any_na | cond
    na_geos = (
        renamed.filter(F.col("scenario").isin(*na_guard_scenarios))
        .filter(any_na)
        .select("scenario_source", "scenario_geography", "ald_sector")
        .distinct()
    )
    pruned = renamed.join(
        F.broadcast(na_geos),
        ["scenario_source", "scenario_geography", "ald_sector"],
        "left_anti",
    )
    if sector_tech_lookup is not None:
        from trisk_datawrangle_spark.plans.scenarios import (
            remove_incomplete_sectors,
        )

        sectors = [
            r[0]
            for r in sector_tech_lookup.select("ald_sector")
            .distinct()
            .collect()
        ]
        pruned = pruned.filter(F.col("ald_sector").isin(*sectors))
        pruned = remove_incomplete_sectors(
            pruned.withColumnRenamed("technology", "ald_business_unit"),
            sector_tech_lookup,
        ).withColumnRenamed("ald_business_unit", "technology")
    return pruned.drop("scenario_source")


def wrangle_weo23(data: DataFrame) -> DataFrame:
    """prepare_scenario_data_weo23 (:262-309): WEO2023 publishes only
    global data — indicator filter (Capacity / Total energy supply),
    rename, source-prefixed scenario, distinct, drop source."""
    data = data.filter(
        F.col("Source").contains("WEO2023")
        & F.col("Indicator").isin("Capacity", "Total energy supply")
    )
    return _p4i_rename_concat(data).drop("scenario_source")


# ------------------------------------------------------------------ #
# NGFS phase IV / V pre-wranglers (:435-607)                         #
# ------------------------------------------------------------------ #

NGFS_SCENARIO_RECODE = {
    "Nationally Determined Contributions (NDCs)": "NDC",
    "Below 2 C": "B2DS",
    "Delayed transition": "DT",
    "Current Policies": "CP",
    "Divergent Net Zero": "DN0",
    "Net Zero 2050": "NZ2050",
    "Fragmented World": "FW",
    "Low demand": "LD",
}

NGFS_MODEL_RECODE_V4 = {
    "GCAM 6.0 NGFS": "GCAM",
    "REMIND-MAgPIE 3.2-4.6": "REMIND",
    "MESSAGEix-GLOBIOM 1.1-M-R12": "MESSAGE",
}

NGFS_MODEL_RECODE_V5 = {
    "GCAM 6.0 NGFS": "GCAM",
    "REMIND-MAgPIE 3.3-4.8": "REMIND",
    "MESSAGEix-GLOBIOM 2.0-M-R12-NGFS": "MESSAGE",
}

#: Electricity sub-category → capacity technology (:465-476).
NGFS_POWER_TECH = {
    "Coal": "CoalCap",
    "Gas": "GasCap",
    "Hydro": "HydroCap",
    "Nuclear": "NuclearCap",
    "Oil": "OilCap",
    "Solar": "RenewablesCap",
    "Geothermal": "RenewablesCap",
    "Biomass": "RenewablesCap",
    "Wind": "RenewablesCap",
}


def preprepare_ngfs(
    data: DataFrame,
    vintage: int = 2023,
    model_recode: Mapping[str, str] = NGFS_MODEL_RECODE_V4,
) -> DataFrame:
    """preprepare_ngfs_scenario_data (:435-505; v5 variant :533-607
    differs only in vintage and model vocabulary): scenario/region/
    sector/technology recodes, the fan-in of the four renewable
    sub-technologies into one summed RenewablesCap series (:493-499),
    and the NGFS{vintage}{model}_{scenario} key (:502-504).

    Expected input columns: Model, Scenario, Region, Unit,
    category_b, category_c, year, value."""
    catb = F.col("category_b")
    sector = (
        F.when(catb.isin("Oil", "Gas"), F.lit("Oil&Gas"))
        .when(catb == "Coal", F.lit("Coal"))
        .otherwise(F.lit("Power"))
    )
    technology = (
        F.when(catb.isin("Oil", "Gas", "Coal"), catb)
        .when(
            catb == "Electricity",
            recode("category_c", NGFS_POWER_TECH),
        )
        .otherwise(F.col("category_c"))
    )
    shaped = data.select(
        recode("Scenario", NGFS_SCENARIO_RECODE).alias("scenario"),
        F.when(F.col("Region") == "World", F.lit("Global"))
        .otherwise(F.col("Region"))
        .alias("scenario_geography"),
        sector.alias("sector"),
        technology.alias("technology"),
        F.when(sector == "Power", F.lit("Capacity"))
        .otherwise(F.lit("Production"))
        .alias("indicator"),
        F.lit(f"NGFS{vintage}").alias("source"),
        recode("Model", model_recode).alias("model"),
        F.col("Unit").alias("units"),
        "year",
        "value",
    )
    ren_keys = ["year", "scenario_geography", "model", "scenario"]
    renewables = (
        shaped.filter(F.col("technology") == "RenewablesCap")
        .groupBy(*ren_keys)
        .agg(
            F.sum("value").alias("value"),
            # constant within the group (all rows are Power/Capacity
            # of one vintage); max() keeps the plan deterministic
            F.max("sector").alias("sector"),
            F.max("indicator").alias("indicator"),
            F.max("source").alias("source"),
            F.max("units").alias("units"),
        )
        .withColumn("technology", F.lit("RenewablesCap"))
    )
    rest = shaped.filter(F.col("technology") != "RenewablesCap")
    return union_by_name(rest, renewables).withColumn(
        "scenario",
        F.concat(
            F.lit(f"NGFS{vintage}"), F.col("model"), F.lit("_"), F.col("scenario")
        ),
    ).drop("model")


# ------------------------------------------------------------------ #
# IPR 2023 (:613-832)                                                #
# ------------------------------------------------------------------ #

IPR_TECH_RECODE = {
    "Oil": "Oil",
    "Coal": "Coal",
    "Natural gas": "Gas",
    "Coal_Power": "CoalCap",
    "Natural gas_Power": "GasCap",
    "Oil_Power": "OilCap",
    "Nuclear_Power": "NuclearCap",
    "Hydro_Power": "HydroCap",
    "Biomass_Power": "BiomassCap",
    "Offshore wind_Power": "OffWindCap",
    "Onshore wind_Power": "OnWindCap",
    "Solar_Power": "SolarCap",
    "BEV": "Electric",
    "PHEV": "Hybrid",
    "H2": "FuelCell",
    "ICE": "ICE",
}

IPR_SECTOR_FROM_TECH = {
    "Oil": "Oil&Gas",
    "Gas": "Oil&Gas",
    "Coal": "Coal",
    "CoalCap": "Power",
    "GasCap": "Power",
    "OilCap": "Power",
    "NuclearCap": "Power",
    "HydroCap": "Power",
    "BiomassCap": "Power",
    "OffWindCap": "Power",
    "OnWindCap": "Power",
    "SolarCap": "Power",
    "ICE": "Automotive",
    "Electric": "Automotive",
    "Hybrid": "Automotive",
    "FuelCell": "Automotive",
}

IPR_RENEWABLE_PARTS = ("OffWindCap", "OnWindCap", "SolarCap", "BiomassCap")

IPR_GREEN_TECHS = (
    "RenewablesCap",
    "HydroCap",
    "NuclearCap",
    "SolarCap",
    "OffWindCap",
    "OnWindCap",
    "BiomassCap",
    "Electric",
    "FuelCell",
)


def _combine_renewables(
    df: DataFrame, parts: Sequence[str], keys: Sequence[str]
) -> DataFrame:
    """Fan four renewable sub-capacities into one summed
    RenewablesCap series and drop the parts (:692-706 IPR, :868-882
    Oxford)."""
    combined = (
        df.filter(F.col("technology").isin(*parts))
        .groupBy(*keys)
        .agg(F.sum("value").alias("value"))
        .withColumn("technology", F.lit("RenewablesCap"))
    )
    rest = df.filter(~F.col("technology").isin(*parts))
    return union_by_name(rest, combined)


def wrangle_ipr(data: DataFrame, start_year: int) -> DataFrame:
    """prepare_IPR_scenario_data2023 (:613-760). Expected input
    columns: Sector, Sub_variable_class_1, Sub_variable_class_2,
    Scenario (RPS/FPS), Region, Units, year, value."""
    raw_tech = (
        F.when(
            F.col("Sector") == "Power",
            F.concat_ws("_", F.col("Sub_variable_class_2"), F.col("Sector")),
        )
        .when(F.col("Sector") == "Transport", F.col("Sub_variable_class_2"))
        .otherwise(F.col("Sub_variable_class_1"))
    )
    # The two vocabulary recodes are BROADCAST-JOINED mapping tables,
    # not CASE chains: recode(recode(raw)) inlines the 16-branch tech
    # CASE into every branch of the 16-branch sector CASE — and
    # predicate pushdown re-substitutes the whole nest into the
    # NULL-sector filter even when the recodes are staged as named
    # projections — a multiplicative expression blowup that
    # overflowed whole-stage codegen's 64 KB method limit and
    # dropped the stage to interpreted execution. As tiny dimension
    # joins (left join ≡ recode with default NULL) the stage stays
    # in codegen, and at 100 TB a vocabulary lives in a table, not
    # in code, anyway.
    spark = data.sparkSession
    tech_map = spark.createDataFrame(
        list(IPR_TECH_RECODE.items()),
        "__raw_tech string, __technology string",
    )
    sector_map = spark.createDataFrame(
        list(IPR_SECTOR_FROM_TECH.items()),
        "__technology string, __sector string",
    )
    staged = (
        data.withColumn("__raw_tech", raw_tech)
        .join(F.broadcast(tech_map), "__raw_tech", "left")
        .join(F.broadcast(sector_map), "__technology", "left")
    )
    sector = F.col("__sector")
    scenario = (
        F.when(F.col("Scenario") == "RPS", F.lit("IPR2023_RPS"))
        .when(
            (F.col("Scenario") == "FPS") & (sector != "Automotive"),
            F.lit("IPR2023_FPS"),
        )
        .when(
            (F.col("Scenario") == "FPS") & (sector == "Automotive"),
            F.lit("IPR2023Automotive_FPS"),
        )
    )
    shaped = staged.select(
        scenario.alias("scenario"),
        F.when(F.col("Region") == "WORLD", F.lit("Global"))
        .otherwise(F.col("Region"))
        .alias("scenario_geography"),
        sector.alias("ald_sector"),
        F.col("__technology").alias("technology"),
        F.col("Units").alias("units"),
        F.col("year").cast("int").alias("year"),
        "value",
    ).filter(F.col("ald_sector").isNotNull())
    combined = _combine_renewables(
        shaped,
        IPR_RENEWABLE_PARTS,
        ["scenario_geography", "scenario", "ald_sector", "units", "year"],
    )
    filtered = combined.filter(F.col("year") >= start_year)
    # IPR's own share variant (:713-732): groups carry `units`
    shares = add_market_share_columns(
        filtered,
        tech_group_cols=[
            "scenario_geography",
            "scenario",
            "ald_sector",
            "units",
            "technology",
        ],
        sector_group_cols=[
            "scenario_geography",
            "scenario",
            "ald_sector",
            "units",
        ],
    )
    is_green = F.col("technology").isin(*IPR_GREEN_TECHS)
    out = shares.withColumn(
        "direction",
        F.when(is_green, F.lit("increasing")).otherwise(F.lit("declining")),
    ).withColumn(
        "fair_share_perc",
        F.when(F.col("direction") == "declining", F.col("tmsr")).otherwise(
            F.col("smsp")
        ),
    )
    out = out.select(
        "scenario_geography",
        "scenario",
        "ald_sector",
        "technology",
        "units",
        "year",
        "direction",
        "fair_share_perc",
        F.col("value").alias("scenario_pathway"),
    )
    # Automotive horizon cap (:752-756): GECO price coverage ends 2041
    return out.filter(
        ~((F.col("ald_sector") == "Automotive") & (F.col("year") >= 2042))
    )


def ipr_baseline(weo_wrangled: DataFrame) -> DataFrame:
    """prepare_IPR_baseline_scenario (:764-772): the IPR baseline is
    the WEO2021 STEPS pathway under a new scenario key."""
    return weo_wrangled.filter(
        F.col("scenario") == "WEO2021_STEPS"
    ).withColumn("scenario", F.lit("IPR2023_baseline"))


def ipr_baseline_automotive(geco_wrangled: DataFrame) -> DataFrame:
    """prepare_IPR_baseline_scenario_automotive (:776-832): the
    Automotive baseline clones GECO2021 CurPol."""
    return geco_wrangled.filter(
        F.col("scenario") == "GECO2021_CurPol"
    ).withColumn("scenario", F.lit("IPR2023Automotive_baseline"))


# ------------------------------------------------------------------ #
# Oxford (:836-935)                                                  #
# ------------------------------------------------------------------ #

OXFORD_DROP_SERIES = (
    "batteries_ST_transport",
    "batteries_ST_electricity",
    "batteries_LT_electricity",
    "hydrogen",
)

OXFORD_RENEWABLE_PARTS = ("WindCap", "SolarCap", "BiomassCap")

OXFORD_GREEN_TECHS = (
    "RenewablesCap",
    "HydroCap",
    "NuclearCap",
    "SolarCap",
    "WindCap",
    "BiomassCap",
)


def wrangle_oxford(data: DataFrame, start_year: int) -> DataFrame:
    """prepare_OXF_scenario_data (:836-935). Expected input columns:
    `Annual energy` (technology_sector compound), scenario,
    scenario_geography, units, year, value. The OilCap series is a
    GasCap clone created AFTER the share calculation (:911-915), so
    it inherits GasCap's tmsr/smsp."""
    data = data.filter(~F.col("Annual energy").isin(*OXFORD_DROP_SERIES))
    parts = F.split(F.col("Annual energy"), "_")
    data = data.withColumn("technology", parts.getItem(0)).withColumn(
        "ald_sector", parts.getItem(1)
    )
    tech, sect = F.col("technology"), F.col("ald_sector")
    # R5/F1 (:847-865): sector first, then technology against the
    # UPDATED sector — the chained if_else order is load-bearing
    new_sector = (
        F.when(sect == "electricity", F.lit("Power"))
        .when((tech == "coal") & (sect == "final"), F.lit("Coal"))
        .when(tech.isin("gas", "oil") & (sect == "final"), F.lit("Oil&Gas"))
        .otherwise(sect)
    )
    data = data.withColumn("ald_sector", new_sector)
    sect = F.col("ald_sector")
    new_tech = (
        F.when((tech == "coal") & (sect == "Power"), F.lit("CoalCap"))
        .when((tech == "gas") & (sect == "Power"), F.lit("GasCap"))
        .when((tech == "oil") & (sect == "Power"), F.lit("OilCap"))
        .when((tech == "coal") & (sect == "Coal"), F.lit("Coal"))
        .when((tech == "gas") & (sect == "Oil&Gas"), F.lit("Gas"))
        .when((tech == "oil") & (sect == "Oil&Gas"), F.lit("Oil"))
        .when(tech == "solar", F.lit("SolarCap"))
        .when(tech == "wind", F.lit("WindCap"))
        .when(tech == "nuclear", F.lit("NuclearCap"))
        .when(tech == "hydro", F.lit("HydroCap"))
        .when(tech == "bioenergy", F.lit("BiomassCap"))
        .otherwise(tech)
    )
    data = data.withColumn("technology", new_tech)
    combined = _combine_renewables(
        data.select(
            "scenario_geography",
            "scenario",
            "ald_sector",
            "technology",
            "units",
            "year",
            "value",
        ),
        OXFORD_RENEWABLE_PARTS,
        ["scenario_geography", "scenario", "ald_sector", "units", "year"],
    )
    filtered = combined.filter(F.col("year") >= start_year)
    shares = add_market_share_columns(
        filtered,
        tech_group_cols=[
            "scenario_geography",
            "scenario",
            "ald_sector",
            "units",
            "technology",
        ],
        sector_group_cols=[
            "scenario_geography",
            "scenario",
            "ald_sector",
            "units",
        ],
    )
    with_oilcap = clone_recode(
        shares, F.col("technology") == "GasCap", {"technology": "OilCap"}
    )
    is_green = F.col("technology").isin(*OXFORD_GREEN_TECHS)
    out = with_oilcap.withColumn(
        "direction",
        F.when(is_green, F.lit("increasing")).otherwise(F.lit("declining")),
    ).withColumn(
        "fair_share_perc",
        F.when(F.col("direction") == "declining", F.col("tmsr")).otherwise(
            F.col("smsp")
        ),
    )
    return out.select(
        "scenario_geography",
        "scenario",
        "ald_sector",
        "technology",
        "units",
        "year",
        "direction",
        "fair_share_perc",
        "value",
    )


# ------------------------------------------------------------------ #
# Steel (:938-1065)                                                  #
# ------------------------------------------------------------------ #

STEEL_KEEP_TECHS = ("Avg BF-BOF", "DRI-Melt-BOF", "EAF", "DRI-EAF")
STEEL_KEEP_SCENARIOS = ("Baseline", "Carbon Cost")
STEEL_TECH_RECODE = {"Avg BF-BOF": "BF-BOF", "DRI-Melt-BOF": "DRI-BOF"}
STEEL_SCENARIO_RECODE = {"Baseline": "Steel_baseline", "Carbon Cost": "Steel_NZ"}


def wrangle_steel(
    data: DataFrame,
    start_year: int,
    max_year: int = 2050,
    anchor_year: int = 2026,
) -> DataFrame:
    """prepare_steel_scenario_data (:938-1065). Expected input
    columns: scenario, technology, year, `Production (Mt)`.

    Chain: filter to the four modeled routes and two scenarios →
    complete the (scenario × technology × year) cube (T2) → rename
    routes → EAF→BF-EAF clone → trailing NAs become 0 after each
    series' last published year (T5) → DRI-BOF's leading NAs take the
    scenario's ``anchor_year`` value (:1004-1020) → BF-BOF fans out
    to BOF and BF-OHF (:1023-1036) → tmsr/smsp → declining/tmsr for
    every route (:1050-1056)."""
    base = (
        data.withColumnRenamed("Production (Mt)", "value")
        .filter(F.col("technology").isin(*STEEL_KEEP_TECHS))
        .filter(F.col("scenario").isin(*STEEL_KEEP_SCENARIOS))
        .withColumn("year", F.col("year").cast("int"))
    )
    # tidyr::complete(scenario, technology, year = start:max): the
    # full cube, built distributed (explode of a literal sequence).
    # The technology side is BROADCAST (the operators/spine.py cube
    # convention): both sides are tiny distinct aggregates, but an
    # unhinted cross join plans a SHUFFLED CartesianProduct — the
    # tests/test_catalog_plan_lint.py anti-shape — while the
    # broadcast form is a bounded nested loop over dimension rows
    combos = (
        base.select("scenario").distinct()
        .crossJoin(F.broadcast(base.select("technology").distinct()))
        .withColumn(
            "year",
            F.explode(F.sequence(F.lit(start_year), F.lit(max_year))),
        )
    )
    dense = combos.join(base, ["scenario", "technology", "year"], "left")
    dense = dense.withColumn(
        "technology", recode("technology", STEEL_TECH_RECODE)
    )
    dense = clone_recode(
        dense, F.col("technology") == "EAF", {"technology": "BF-EAF"}
    )
    # trailing NAs → 0 after the last published year of each series
    from pyspark.sql import Window

    g = Window.partitionBy("scenario", "technology")
    last_pub = F.max(
        F.when(F.col("value").isNotNull(), F.col("year"))
    ).over(g)
    dense = dense.withColumn(
        "value",
        F.when(
            F.col("year") > F.coalesce(last_pub, F.lit(-(10**9))),
            F.lit(0.0),
        ).otherwise(F.col("value")),
    )
    # DRI-BOF leading NAs ← the scenario's anchor-year value
    anchor = (
        dense.filter(
            (F.col("technology") == "DRI-BOF")
            & (F.col("year") == anchor_year)
        )
        .select("scenario", F.col("value").alias("__anchor"))
        .distinct()
    )
    dense = dense.join(F.broadcast(anchor), ["scenario"], "left").withColumn(
        "value",
        F.when(
            (F.col("technology") == "DRI-BOF")
            & F.col("value").isNull()
            & F.col("__anchor").isNotNull(),
            F.col("__anchor"),
        ).otherwise(F.col("value")),
    ).drop("__anchor")
    dense = clone_recode(
        dense, F.col("technology") == "BF-BOF", {"technology": "BOF"}
    )
    dense = clone_recode(
        dense, F.col("technology") == "BF-BOF", {"technology": "BF-OHF"}
    )
    filtered = (
        dense.filter(F.col("year") >= start_year)
        .withColumn("scenario_geography", F.lit("Global"))
        .withColumn("sector", F.lit("Steel"))
    )
    shares = add_market_share_columns(
        filtered,
        tech_group_cols=[
            "scenario",
            "sector",
            "scenario_geography",
            "technology",
        ],
        sector_group_cols=["scenario", "sector", "scenario_geography"],
    )
    return (
        shares.withColumn("direction", F.lit("declining"))
        .withColumn("units", F.lit("Mt/yr"))
        .withColumn("fair_share_perc", F.col("tmsr"))
        .withColumnRenamed("sector", "ald_sector")
        .select(
            "scenario_geography",
            "scenario",
            "ald_sector",
            "technology",
            "units",
            "year",
            "direction",
            "fair_share_perc",
            F.col("value").alias("scenario_pathway"),
        )
        .withColumn("scenario", recode("scenario", STEEL_SCENARIO_RECODE))
    )
