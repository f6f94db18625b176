"""Per-source LCOE→price adjustment variants
(R/prepare_LCOE_adjusted_price_data.R beyond the generic chain in
:func:`plans.prices.prepare_lcoe_adjusted_prices`):

=====================  =============================================
function               reference
=====================  =============================================
lcoe_adjust_ipr        prepare_lcoe_adjusted_price_data_IPR2023
                       (:260-331): the WEO adjustment, pruned to
                       Global, with the SDS series cloned to both
                       IPR2023_FPS and IPR2023_RPS
mp_lc_steel_wrangling  MP_LC_steel_wrangling (:333-387): global mean
                       rows, route recodes and clone fan-out on the
                       Mission Possible levelized-cost table
lc_adjust_steel        prepare_lc_adjusted_price_data_steel
                       (:389-448): the same implied-price adjustment
                       on (Steel, Levelized Cost) series with the
                       baseline/carbon_cost → Steel_* relabel
oxford_lcoe_power      prepare_lcoe_adjusted_price_data_oxford2022
                       (:81-258): Oxford power LCOE → adjusted
                       prices, OLS-extended to 2100, fanned out to
                       the NGFS model × scenario matrix plus the
                       Oxford labels
=====================  =============================================

All adjustment math is the shared one-window formulation (implied
price and cost factor anchored at each series' first year — see
``prepare_lcoe_adjusted_prices``); the scenario fan-outs are explode
expressions, never driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trisk_datawrangle_spark.functions.scalars import recode
from trisk_datawrangle_spark.operators.setops import union_by_name
from trisk_datawrangle_spark.plans.prices import prepare_lcoe_adjusted_prices

__all__ = [
    "lcoe_adjust_ipr",
    "mp_lc_steel_wrangling",
    "lc_adjust_steel",
    "oxford_lcoe_power",
]


def lcoe_adjust_ipr(
    input_data: DataFrame,
    average_npm_power: float = 0.1,
    start_year: int | None = None,
) -> DataFrame:
    """prepare_lcoe_adjusted_price_data_IPR2023 (:260-331): run the
    WEO adjustment, keep only Global, and clone the SDS series to
    both IPR scenarios (IEA SDS proxies IPR's FPS and RPS)."""
    adjusted = prepare_lcoe_adjusted_prices(
        input_data, average_npm_power, start_year
    ).filter(F.col("scenario_geography") == "Global")
    # stage boundary: both clone branches re-read the adjusted frame —
    # uncached, the window chain would run twice
    sds = adjusted.filter(F.col("scenario") == "SDS").cache()
    return union_by_name(
        sds.withColumn("scenario", F.lit("IPR2023_FPS")),
        sds.withColumn("scenario", F.lit("IPR2023_RPS")),
    )


#: Mission Possible route → canonical steel technology (:355-377).
MP_STEEL_TECH_RECODE = {
    "Avg BF-BOF": "BF-BOF",
    "DRI-Melt-BOF": "DRI-BOF",
}

MP_STEEL_CLONES = (
    ("EAF", "BF-EAF"),
    ("BF-BOF", "BOF"),
    ("BF-BOF", "BF-OHF"),
)


def mp_lc_steel_wrangling(data: DataFrame) -> DataFrame:
    """MP_LC_steel_wrangling (:333-387): append per-(scenario, year,
    technology) Global mean rows, keep the relevant routes and
    scenarios, recode route names, and fan BF-BOF/EAF out to their
    sibling labels via one explode (the reference's three rbind
    blocks). Expected input: scenario, region, technology, year,
    levelized_cost."""
    global_rows = (
        data.groupBy("scenario", "year", "technology")
        .agg(F.avg("levelized_cost").alias("levelized_cost"))
        .withColumn("region", F.lit("Global"))
    )
    both = union_by_name(data, global_rows)
    shaped = (
        both.withColumnsRenamed(
            {"levelized_cost": "price", "region": "scenario_geography"}
        )
        .filter(
            F.col("technology").isin(
                "Avg BF-BOF", "DRI-Melt-BOF", "EAF", "DRI-EAF"
            )
        )
        .filter(F.col("scenario").isin("baseline", "carbon_cost"))
        .withColumn("technology", recode("technology", MP_STEEL_TECH_RECODE))
    )
    t = F.col("technology")
    fanout: dict[str, list[str]] = {}
    for src, dst in MP_STEEL_CLONES:
        fanout.setdefault(src, [src]).append(dst)
    dsts = F.array(t)
    for src, outs in fanout.items():
        dsts = F.when(t == src, F.array(*[F.lit(o) for o in outs])).otherwise(
            dsts
        )
    return (
        shaped.withColumn("technology", F.explode(dsts))
        .withColumn("sector", F.lit("Steel"))
        .withColumn("indicator", F.lit("Levelized Cost"))
        .withColumn("source", F.lit("Mission Possible"))
        .withColumn("unit", F.lit("$/ton"))
    )


def lc_adjust_steel(
    input_data: DataFrame,
    average_npm_steel: float = 0.1,
    start_year: int | None = None,
) -> DataFrame:
    """prepare_lc_adjusted_price_data_steel (:389-448): implied-price
    adjustment on (Steel, Levelized Cost) series; only the adjusted
    rows survive (no other-sector bind), source dropped, the MP
    scenarios relabeled Steel_baseline / Steel_NZ."""
    data = input_data
    if start_year is not None:
        data = data.filter(F.col("year") >= start_year)
    lc = data.filter(
        (F.col("sector") == "Steel")
        & (F.col("indicator") == "Levelized Cost")
    )
    keys = [
        c
        for c in [
            "source",
            "scenario",
            "scenario_geography",
            "sector",
            "technology",
            "unit",
        ]
        if c in lc.columns
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy("year")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    first_p = F.first("price").over(w)
    implied = first_p / (1 - F.lit(float(average_npm_steel)))
    cost_factor = F.when(F.col("price") != 0, first_p / F.col("price"))
    return (
        lc.withColumn("price", implied * cost_factor)
        .withColumn("indicator", F.lit("price"))
        .drop("source")
        .withColumn(
            "scenario",
            recode(
                "scenario",
                {"baseline": "Steel_baseline", "carbon_cost": "Steel_NZ"},
            ),
        )
    )


#: Oxford → NGFS scenario matching (:215-246): fast-transition LCOEs
#: proxy the ambitious NGFS scenarios, no-transition the laggards.
OXFORD_NGFS_FAST = ("NZ2050", "LD", "B2DS", "DT")
OXFORD_NGFS_SLOW = ("NDC", "FW", "CP")
NGFS_MODELS = ("GCAM", "REMIND", "MESSAGE")

OXFORD_LCOE_SCENARIO_RECODE = {
    "Oxford - fast_transition": "fast_transition_oxford",
    "Oxford - no_transition": "no_transition_oxford",
    "Oxford - slow_transition": "slow_transition_oxford",
}


def oxford_lcoe_power(
    data: DataFrame,
    average_npm_power: float = 0.1,
    start_year: int = 2021,
    ngfs_vintage: int = 2023,
    fit_lo: int = 2049,
    fit_hi: int = 2069,
    end_year: int = 2100,
) -> DataFrame:
    """prepare_lcoe_adjusted_price_data_oxford2022 (:81-258): Oxford
    power LCOEs → technology recodes (GasCap cloned to OilCap,
    renewables fanned in by mean) → the implied-price adjustment →
    extension to ``end_year`` via an OLS line over
    [``fit_lo``, ``fit_hi``] → fan-out to NGFS model × scenario
    labels plus the Oxford2021_fast/base labels. Expected input:
    Sector, Scenario, Year, Technology, Sub_Technology, Region,
    LCOE."""
    base = (
        data.filter(F.col("Sector") == "Power")
        .filter(F.col("Scenario").contains("Oxford"))
        .filter(F.col("Year") >= start_year)
        .select(
            F.when(F.col("Technology") == "Natural gas", F.lit("GasCap"))
            .when(F.col("Technology") == "Coal", F.lit("CoalCap"))
            .when(F.col("Sub_Technology") == "Hydro", F.lit("HydroCap"))
            .when(F.col("Technology") == "Nuclear", F.lit("NuclearCap"))
            .when(
                # faithful to the reference (:95): the comparison is
                # against the RECODED label 'HydroCap' (not 'Hydro'),
                # and a NULL Sub_Technology falls through to the raw
                # Technology label — both quirks preserved
                (F.col("Technology") == "Renewables")
                & (F.col("Sub_Technology") != "HydroCap"),
                F.lit("RenewablesCap"),
            )
            .otherwise(F.col("Technology"))
            .alias("technology"),
            F.when(F.col("Region") == "World", F.lit("Global"))
            .otherwise(F.col("Region"))
            .alias("scenario_geography"),
            F.lit("$/MWh").alias("unit"),
            recode("Scenario", OXFORD_LCOE_SCENARIO_RECODE).alias("scenario"),
            F.lit("Power").alias("sector"),
            F.col("Year").cast("int").alias("year"),
            F.col("LCOE").alias("price"),
        )
        .filter(F.col("scenario") != "slow_transition_oxford")
    )
    from trisk_datawrangle_spark.operators.interpolate import (
        fit_window_extension,
    )

    # stage boundary: three branches re-read base
    base = base.cache()
    renewables = (
        base.filter(F.col("technology") == "RenewablesCap")
        .groupBy("scenario", "scenario_geography", "sector", "year",
                 "technology", "unit")
        .agg(F.avg("price").alias("price"))
    )
    rest = base.filter(F.col("technology") != "RenewablesCap")
    oil = base.filter(F.col("technology") == "GasCap").withColumn(
        "technology", F.lit("OilCap")
    )
    merged = union_by_name(union_by_name(rest, renewables), oil)

    keys = ["scenario", "scenario_geography", "sector", "technology", "unit"]
    w = (
        Window.partitionBy(*keys)
        .orderBy("year")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    first_p = F.first("price").over(w)
    implied = first_p / (1 - F.lit(float(average_npm_power)))
    cost_factor = F.when(F.col("price") != 0, first_p / F.col("price"))
    adjusted = (
        merged.withColumn("price", implied * cost_factor)
        .withColumn("indicator", F.lit("price"))
        # the published horizon is the fit window's end; rows past it
        # would collide with the extension years
        .filter(F.col("year") <= fit_hi)
    )

    series_keys = [*keys, "indicator"]
    if end_year > fit_hi:
        extension = (
            adjusted.select(*series_keys)
            .distinct()
            .withColumn(
                "year",
                F.explode(F.sequence(F.lit(fit_hi + 1), F.lit(end_year))),
            )
            .withColumn("price", F.lit(None).cast("double"))
        )
        dense = union_by_name(adjusted, extension)
        extended = fit_window_extension(
            dense, series_keys, "year", "price", fit_lo, fit_hi
        )
    else:
        extended = adjusted
    # stage boundary: the three scenario-matrix branches re-read it
    extended = extended.cache()

    # scenario matrix: Oxford labels + NGFS model × scenario fan-out
    oxford = extended.withColumn(
        "scenario",
        recode(
            "scenario",
            {
                "fast_transition_oxford": "Oxford2021_fast",
                "no_transition_oxford": "Oxford2021_base",
            },
        ),
    )
    model_arr = F.array(*[F.lit(m) for m in NGFS_MODELS])
    fast = (
        extended.filter(F.col("scenario") == "fast_transition_oxford")
        .withColumn("model", F.explode(model_arr))
        .withColumn(
            "__ngfs",
            F.explode(F.array(*[F.lit(s) for s in OXFORD_NGFS_FAST])),
        )
    )
    slow = (
        extended.filter(F.col("scenario") == "no_transition_oxford")
        .withColumn("model", F.explode(model_arr))
        .withColumn(
            "__ngfs",
            F.explode(F.array(*[F.lit(s) for s in OXFORD_NGFS_SLOW])),
        )
    )
    ngfs = union_by_name(fast, slow).withColumn(
        "scenario",
        F.concat(
            F.lit(f"NGFS{ngfs_vintage}"),
            F.col("model"),
            F.lit("_"),
            F.col("__ngfs"),
        ),
    ).drop("model", "__ngfs")
    return union_by_name(ngfs, oxford)
