"""Per-source capacity-factor wranglers
(R/prepare_prewrangled_capacity_factors.R beyond the WEO2020 chain in
:mod:`plans.capacity_factors`):

====================  ==============================================
function              reference
====================  ==============================================
weo2021_scenario_     the WEO2020→WEO2021 adjustment block
clones                (:215-237): SPS→STEPS rename, SDS→NZE_2050 and
                      STEPS→APS scenario clones
prepare_capacity_     prepare_prewrangled_capacity_factors_WEO2023
factors_weo2023       (:250-365): generation/capacity inner join,
                      dense spine + interpolation, NaN→0 clamp
prepare_capacity_     prepare_capacity_factors_NGFS2023 (:380-493)
factors_ngfs          and the 2024 variant (:498-610) via ``vintage``
                      / ``model_recode``
prepare_capacity_     prepare_capacity_factors_IPR2023 (:613-747)
factors_ipr           + the FPS→baseline clone (:752-762)
prepare_capacity_     prepare_capacity_factors_OXF2021 (:764-812):
factors_oxford        WEO factors matched to Oxford scenarios, held
                      constant from 2040 to 2100
prepare_capacity_     prepare_capacity_factors_GEM_steel (:815-884)
factors_gem_steel
====================  ==============================================

All chains are Catalyst expressions; the capacity⋈generation joins
are equi-joins on the series keys (one shuffle, AQE-broadcastable on
the model-output side); the year extensions are distributed
``explode(sequence(...))`` spines, never driver loops (the
reference's add_years nested for-loop becomes one cross join).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.functions.scalars import recode
from trisk_datawrangle_spark.operators.interpolate import na_approx
from trisk_datawrangle_spark.operators.setops import clone_recode, union_by_name
from trisk_datawrangle_spark.plans.scenario_sources import (
    NGFS_MODEL_RECODE_V4,
    NGFS_MODEL_RECODE_V5,
    NGFS_SCENARIO_RECODE,
    _combine_renewables,
)

__all__ = [
    "weo2021_scenario_clones",
    "prepare_capacity_factors_weo2023",
    "prepare_capacity_factors_ngfs",
    "prepare_capacity_factors_ipr",
    "ipr_capacity_factors_baseline",
    "prepare_capacity_factors_oxford",
    "prepare_capacity_factors_gem_steel",
    "NGFS_MODEL_RECODE_V5",
]


def weo2021_scenario_clones(df: DataFrame) -> DataFrame:
    """WEO2020→WEO2021 adjustment (:215-237): prefix scenarios with
    WEO2021, rename the retired SPS to STEPS, then clone SDS→NZE_2050
    and STEPS→APS (the 2021 vintage publishes no standalone factors
    for those)."""
    out = df.withColumn(
        "scenario", F.concat(F.lit("WEO2021_"), F.col("scenario"))
    ).withColumn(
        "scenario",
        F.when(
            F.col("scenario") == "WEO2021_SPS", F.lit("WEO2021_STEPS")
        ).otherwise(F.col("scenario")),
    )
    out = clone_recode(
        out,
        F.col("scenario") == "WEO2021_SDS",
        {"scenario": "WEO2021_NZE_2050"},
    )
    return clone_recode(
        out,
        F.col("scenario") == "WEO2021_STEPS",
        {"scenario": "WEO2021_APS"},
    )


#: The three-rule capacity-factor clamp shared by every variant
#: (:472-488, :585-601, :725-739): >1 → 1; capacity 0 with generation
#: → 0; 0/0 (NaN) → 0. One-sided full-join rows (one of cap/gen NULL)
#: deliberately pass through as NULL — the reference's ``if_else``
#: chain propagates NA the same way and keeps those rows in the
#: NGFS/IPR outputs; only the WEO2023 variant (na.approx na.rm
#: semantics) filters them, which its chain does explicitly.
def _clamp_cf(cap: Column, gen: Column) -> Column:
    raw = gen.cast("double") / cap.cast("double")
    return (
        F.when((cap == 0) & (gen == 0), F.lit(0.0))
        .when((cap == 0) & (gen > 0), F.lit(0.0))
        .when(raw > 1, F.lit(1.0))
        .otherwise(raw)
    )


def prepare_capacity_factors_weo2023(
    data: DataFrame,
    start_year: int,
    end_year: int = 2050,
    hours_to_year: float = 24 * 365,
) -> DataFrame:
    """prepare_prewrangled_capacity_factors_WEO2023 (:250-365):
    Power-sector generation (TWh → GW via 1000/8760) inner-joined to
    capacity on the full series key, completed to a dense
    [start_year, end_year] spine, both sides linearly interpolated,
    then capacity_factor = generation/capacity with the NaN→0 clamp
    and a WEO2023_ scenario prefix."""
    keys = [
        "source",
        "scenario",
        "scenario_geography",
        "sector",
        "technology",
        "units",
    ]
    power = data.filter(F.col("sector") == "Power")
    capacity = (
        power.filter(F.col("indicator") == "Capacity")
        .select(*keys, "year", F.col("value").alias("capacity"))
    )
    generation = (
        power.filter(F.col("indicator") == "Electricity generation")
        .select(*keys, "year", F.col("value").alias("generation"))
        .withColumn(
            "generation",
            F.col("generation") * 1000.0 / F.lit(float(hours_to_year)),
        )
        .withColumn("units", F.lit("GW"))
    )
    joined = generation.join(
        capacity.withColumn("units", F.lit("GW")),
        [*keys, "year"],
        "inner",
    ).distinct()
    # dense spine per series (tidyr::complete over the fixed range)
    combos = joined.select(*keys).distinct().withColumn(
        "year",
        F.explode(F.sequence(F.lit(start_year), F.lit(end_year))),
    )
    dense = combos.join(joined, [*keys, "year"], "left")
    interp = na_approx(
        dense, keys, "year", "capacity", na_rm=False, out_col="capacity"
    )
    interp = na_approx(
        interp, keys, "year", "generation", na_rm=False, out_col="generation"
    )
    cf = (
        interp.filter(F.col("year") >= start_year)
        # zoo::na.approx's default na.rm=TRUE drops un-interpolatable
        # edge years; the reference then asserts no NA factors remain
        .filter(
            F.col("capacity").isNotNull() & F.col("generation").isNotNull()
        )
        .withColumn(
            "capacity_factor",
            _clamp_cf(F.col("capacity"), F.col("generation")),
        )
        .select(
            F.concat(F.lit("WEO2023_"), F.col("scenario")).alias("scenario"),
            "scenario_geography",
            "technology",
            "year",
            "capacity_factor",
        )
    )
    return cf


#: category_c → capacity technology for the NGFS raw shape
#: (:402-413).
NGFS_CF_TECH_RECODE = {
    "Oil": "OilCap",
    "Gas": "GasCap",
    "Coal": "CoalCap",
    "Hydro": "HydroCap",
    "Nuclear": "NuclearCap",
    "Solar": "RenewablesCap",
    "Geothermal": "RenewablesCap",
    "Biomass": "RenewablesCap",
    "Wind": "RenewablesCap",
}

#: EJ/yr of secondary energy → GW of average output (:447-450).
NGFS_EJ_TO_GW = 31.68808781


def prepare_capacity_factors_ngfs(
    data: DataFrame,
    start_year: int,
    vintage: int = 2023,
    model_recode: Mapping[str, str] = NGFS_MODEL_RECODE_V4,
) -> DataFrame:
    """prepare_capacity_factors_NGFS2023 (:380-493; the 2024 variant
    :498-610 differs only in vintage and model vocabulary): raw NGFS
    capacity + secondary-energy rows → vocabulary recodes →
    renewables fan-in per category → dense spine + interpolation
    (edges kept) → Capacity/Secondary-Energy pivot → full join →
    clamped capacity factor → NGFS{vintage}{model}_{scenario} key.

    Expected input columns: Model, Scenario, Region, Unit,
    category_a (Capacity / Secondary Energy), category_c, year,
    value."""
    shaped = data.select(
        recode("Scenario", NGFS_SCENARIO_RECODE).alias("scenario"),
        F.when(F.col("Region") == "World", F.lit("Global"))
        .otherwise(F.col("Region"))
        .alias("scenario_geography"),
        recode("category_c", NGFS_CF_TECH_RECODE).alias("technology"),
        recode("Model", model_recode).alias("model"),
        F.col("Unit").alias("units"),
        F.col("category_a").alias("category_a"),
        "year",
        "value",
    )
    ren_keys = [
        "year",
        "scenario_geography",
        "model",
        "scenario",
        "category_a",
    ]
    renewables = (
        shaped.filter(F.col("technology") == "RenewablesCap")
        .groupBy(*ren_keys)
        .agg(F.sum("value").alias("value"), F.max("units").alias("units"))
        .withColumn("technology", F.lit("RenewablesCap"))
    )
    rest = shaped.filter(F.col("technology") != "RenewablesCap")
    combined = union_by_name(rest, renewables)
    series_keys = [
        "scenario",
        "scenario_geography",
        "technology",
        "model",
        "units",
        "category_a",
    ]
    # tidyr::complete(full_seq(year)) + na.approx(na.rm = FALSE)
    bounds = combined.groupBy(*series_keys).agg(
        F.min("year").alias("__lo"), F.max("year").alias("__hi")
    )
    spine = bounds.withColumn(
        "year", F.explode(F.sequence(F.col("__lo"), F.col("__hi")))
    ).drop("__lo", "__hi")
    dense = spine.join(combined, [*series_keys, "year"], "left")
    interp = na_approx(
        dense, series_keys, "year", "value", na_rm=False
    ).filter(F.col("year") >= start_year)
    join_keys = [
        "scenario",
        "scenario_geography",
        "technology",
        "model",
        "year",
    ]
    generation = (
        interp.filter(F.col("category_a") == "Secondary Energy")
        .select(
            *join_keys,
            (F.col("value") * F.lit(NGFS_EJ_TO_GW)).alias("generation"),
        )
    )
    capacity = interp.filter(F.col("category_a") == "Capacity").select(
        *join_keys, F.col("value").alias("capacity")
    )
    joined = capacity.join(generation, join_keys, "full")
    return joined.withColumn(
        "capacity_factor", _clamp_cf(F.col("capacity"), F.col("generation"))
    ).select(
        F.concat(
            F.lit(f"NGFS{vintage}"),
            F.col("model"),
            F.lit("_"),
            F.col("scenario"),
        ).alias("scenario"),
        "scenario_geography",
        "technology",
        "year",
        "capacity_factor",
    )


IPR_CF_TECH_RECODE = {
    "Coal_Power": "CoalCap",
    "Natural gas_Power": "GasCap",
    "Nuclear_Power": "NuclearCap",
    "Hydro_Power": "HydroCap",
    "Oil_Power": "OilCap",
    "Biomass_Power": "BiomassCap",
    "Offshore wind_Power": "OffWindCap",
    "Onshore wind_Power": "OnWindCap",
    "Solar_Power": "SolarCap",
}

IPR_CF_RENEWABLE_PARTS = ("OffWindCap", "OnWindCap", "SolarCap", "BiomassCap")

#: TWh/yr → GW of average output (:699-704).
IPR_TWH_TO_GW = 1000.0 / (24 * 365.25)


def prepare_capacity_factors_ipr(
    data: DataFrame, start_year: int
) -> DataFrame:
    """prepare_capacity_factors_IPR2023 (:613-747): compound
    technology key (Electricity-generation rows key by
    Sub_variable_class_1), vocabulary recodes with NULL-sector drops,
    WORLD→Global, renewables fan-in per Category, the
    Capacity/Electricity-generation split (TWh → GW), full join, and
    the clamped capacity factor.

    Expected input columns: Variable_class, Sub_variable_class_1,
    Sub_variable_class_2, Sector, Scenario, Region, Units, year,
    value."""
    raw_tech = F.when(
        F.col("Variable_class") == "Electricity generation",
        F.concat_ws("_", F.col("Sub_variable_class_1"), F.col("Sector")),
    ).otherwise(
        F.when(
            F.col("Sector") == "Power",
            F.concat_ws("_", F.col("Sub_variable_class_2"), F.col("Sector")),
        ).otherwise(F.col("Sub_variable_class_1"))
    )
    tech = recode(raw_tech, IPR_CF_TECH_RECODE, default=F.lit(None))
    shaped = (
        data.select(
            F.when(F.col("Scenario") == "RPS", F.lit("IPR2023_RPS"))
            .when(F.col("Scenario") == "FPS", F.lit("IPR2023_FPS"))
            .alias("scenario"),
            F.when(F.col("Region") == "WORLD", F.lit("Global"))
            .otherwise(F.col("Region"))
            .alias("scenario_geography"),
            tech.alias("technology"),
            F.col("Variable_class").alias("category"),
            F.col("Units").alias("units"),
            F.col("year").cast("int").alias("year"),
            "value",
        )
        .filter(F.col("technology").isNotNull())
        # off-vocabulary scenario labels would otherwise survive as
        # NULL-scenario groups all the way into the full join
        .filter(F.col("scenario").isNotNull())
    )
    combined = _combine_renewables(
        shaped,
        IPR_CF_RENEWABLE_PARTS,
        ["category", "scenario_geography", "scenario", "units", "year"],
    )
    join_keys = ["scenario", "scenario_geography", "technology", "year"]
    capacity = combined.filter(F.col("category") == "Capacity").select(
        *join_keys, F.col("value").alias("capacity")
    )
    generation = combined.filter(
        F.col("category") == "Electricity generation"
    ).select(
        *join_keys,
        (F.col("value") * F.lit(IPR_TWH_TO_GW)).alias("generation"),
    )
    joined = capacity.join(generation, join_keys, "full")
    return (
        joined.withColumn(
            "capacity_factor",
            _clamp_cf(F.col("capacity"), F.col("generation")),
        )
        .filter(F.col("year") >= start_year)
        .select(
            "scenario",
            "scenario_geography",
            "technology",
            "year",
            "capacity_factor",
        )
    )


def ipr_capacity_factors_baseline(df: DataFrame) -> DataFrame:
    """prepare_capacity_factors_IPR2023_baseline (:752-762): the IPR
    baseline reuses the FPS factors."""
    return df.filter(F.col("scenario") == "IPR2023_FPS").withColumn(
        "scenario", F.lit("IPR2023_baseline")
    )


def prepare_capacity_factors_oxford(
    weo_factors: DataFrame,
    hold_from: int = 2040,
    end_year: int = 2100,
) -> DataFrame:
    """prepare_capacity_factors_OXF2021 (:764-812): Oxford publishes
    no capacity factors, so the Global WEO2021 SDS/STEPS factors are
    relabeled Oxford2021_fast/base and held constant from
    ``hold_from`` to ``end_year``. The reference's add_years row loop
    + per-combination NA fill becomes one exploded spine and one
    broadcast join of the hold-year values."""
    matched = (
        weo_factors.filter(
            (F.col("scenario_geography") == "Global")
            & F.col("scenario").isin("WEO2021_SDS", "WEO2021_STEPS")
        )
        .withColumn(
            "scenario",
            recode(
                "scenario",
                {
                    "WEO2021_SDS": "Oxford2021_fast",
                    "WEO2021_STEPS": "Oxford2021_base",
                },
            ),
        )
    )
    # the reference assumes every series carries a row at exactly
    # hold_from (its NA fill indexes `year == 2040` and would error
    # otherwise) and that the input ends there (add_years would
    # otherwise create duplicate years). Make both robust: truncate
    # at hold_from, and hold the LAST published value ≤ hold_from —
    # picked as (max year with data, max value at that year) so the
    # result is deterministic even on degenerate duplicate-year input.
    series = ["scenario", "scenario_geography", "technology"]
    matched = matched.filter(F.col("year") <= hold_from)
    last_years = (
        matched.filter(F.col("capacity_factor").isNotNull())
        .groupBy(*series)
        .agg(F.max("year").alias("__hold_year"))
    )
    hold_vals = (
        matched.join(F.broadcast(last_years), series)
        .filter(F.col("year") == F.col("__hold_year"))
        .groupBy(*series)
        .agg(F.max("capacity_factor").alias("__hold"))
    )
    extension = (
        hold_vals.withColumn(
            "year",
            F.explode(
                F.sequence(F.lit(hold_from + 1), F.lit(end_year))
            ),
        )
        .select(
            "scenario",
            "scenario_geography",
            "technology",
            "year",
            F.col("__hold").alias("capacity_factor"),
        )
    )
    return union_by_name(
        matched.select(
            "scenario",
            "scenario_geography",
            "technology",
            "year",
            "capacity_factor",
        ),
        extension,
    )


GEM_STEEL_CLONES = (
    # (source technology, cloned name)
    ("EAF Steel", "BF-EAF"),
    ("EAF Steel", "EAF"),
    ("DRI", "DRI-EAF"),
    ("BOF", "BF-BOF"),
    ("DRI", "DRI-BOF"),
    ("OHF Steel", "BF-OHF"),
)

GEM_STEEL_KEEP = (
    "BF-BOF",
    "BF-EAF",
    "EAF",
    "BOF",
    "DRI-EAF",
    "DRI-BOF",
    "BF-OHF",
)


def prepare_capacity_factors_gem_steel(
    data: DataFrame, start_year: int, max_year: int = 2050
) -> DataFrame:
    """prepare_capacity_factors_GEM_steel (:815-884): route renames
    and fan-out clones, duplication across the two steel scenarios,
    completion to [start_year, max_year], and a first-non-NA constant
    fill per series. Expected input: technology, year, value.

    The reference's sequence of per-route ``rbind`` clones is a single
    explode over a routing map here (the 7-way union produced a
    needlessly deep plan; one generator expression reads the source
    once and keeps analysis cost flat)."""
    renamed = data.withColumn("scenario_geography", F.lit("Global")).withColumn(
        "technology",
        F.when(F.col("technology") == "BOF Steel", F.lit("BOF")).otherwise(
            F.col("technology")
        ),
    )
    # route → output technologies, derived from the clone table: the
    # source survives unless it is rbind-only (EAF Steel / DRI), and
    # every clone destination is appended.
    fanout: dict[str, list[str]] = {}
    for src, dst in GEM_STEEL_CLONES:
        fanout.setdefault(src, [] if src in ("EAF Steel", "DRI") else [src])
        fanout[src].append(dst)
    t = F.col("technology")
    dsts: Column = F.array(t)
    for src, outs in fanout.items():
        dsts = F.when(t == src, F.array(*[F.lit(o) for o in outs])).otherwise(
            dsts
        )
    both = (
        renamed.withColumn("technology", F.explode(dsts))
        .withColumn(
            "scenario",
            F.explode(
                F.array(F.lit("Steel_baseline"), F.lit("Steel_NZ"))
            ),
        )
    )
    series = ["technology", "scenario", "scenario_geography"]
    combos = both.select(*series).distinct().withColumn(
        "year",
        F.explode(F.sequence(F.lit(start_year), F.lit(max_year))),
    )
    dense = combos.join(
        both.withColumn("year", F.col("year").cast("int")),
        [*series, "year"],
        "left",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*series)
        .orderBy("year")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    filled = dense.withColumn(
        "value",
        F.coalesce(
            F.col("value"), F.first("value", ignorenulls=True).over(w)
        ),
    )
    return (
        filled.filter(F.col("technology").isin(*GEM_STEEL_KEEP))
        .select(
            "scenario_geography",
            "scenario",
            "technology",
            "year",
            F.col("value").alias("capacity_factor"),
        )
    )
