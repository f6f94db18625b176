"""Price pipelines → ``price_data_long`` and ``ngfs_carbon_price``
(SURVEY.md §3; reference R/prepare_price_data_long.R and
R/prepare_ngfs_carbon_price.R).

Input shapes (FIXTURES.md §6-7): wide-year fossil-fuel / power-cost /
carbon-price tables. Chains:

prices:  melt (R1) → unit conversions (F10) → global-mean rows per
         (scenario, sector, year) unioned back (A3+U1) → dense spine
         + interpolation + LOCF (T1+W8+W7) → OLS extension to the
         model horizon (W9/T4).
carbon:  melt 5-year steps → per-group dense spine → interior
         interpolation (R/prepare_ngfs_carbon_price.R:102-165, whose
         row-loop interpolation becomes the W8 expression tree).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.functions.scalars import UNIT, recode
from trisk_datawrangle_spark.operators.interpolate import (
    fill_locf,
    lm_extrapolate,
    na_approx,
)
from trisk_datawrangle_spark.operators.reshape import melt_year_columns
from trisk_datawrangle_spark.operators.setops import union_by_name
from trisk_datawrangle_spark.operators.spine import complete_spine

PRICE_KEYS = ["scenario", "scenario_geography", "sector", "unit"]


def melt_price_table(raw: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """R1: wide year columns → long (year, price)."""
    return melt_year_columns(raw, id_cols=list(id_cols), value_name="price")


def convert_units(df: DataFrame) -> DataFrame:
    """F10 (R/prepare_price_data_long.R:38-52,297-299,709-717): all
    fossil prices normalized to usd/GJ via the published constants;
    unit label rewritten to match."""
    price = F.col("price")
    unit = F.col("unit")
    # reference arithmetic (prepare_price_data_long.R:41-42): barrel
    # ×0.16, Mbtu ×0.9478171203 — the previous formulation divided
    # where the reference multiplies (Mbtu ~11% high). usd/tonne →
    # usd/GJ is ÷(GJ per tonne), derived from the reference's own
    # constants (:706-713: MWh↔tonne 0.122835, MWh↔GJ 3.6).
    converted = (
        F.when(unit == "usd/barrel", price * F.lit(UNIT.BARREL_TO_GJ))
        .when(unit == "usd/Mbtu", price * F.lit(UNIT.MBTU_TO_GJ))
        .when(unit == "usd/tonne", price / F.lit(UNIT.COAL_TONNE_TO_GJ))
        .when(unit == "usd/MWh", price * F.lit(UNIT.USD_MWH_TO_USD_GJ))
        .otherwise(price)
    )
    new_unit = recode(
        unit,
        {
            "usd/barrel": "usd/GJ",
            "usd/Mbtu": "usd/GJ",
            "usd/tonne": "usd/GJ",
            "usd/MWh": "usd/GJ",
        },
    )
    return df.withColumn("price", converted).withColumn("unit", new_unit)


def add_global_mean_rows(df: DataFrame) -> DataFrame:
    """A3+U1 (R/prepare_price_data_long.R:78-92): the 'Global'
    geography is the mean over regional rows per (scenario, sector,
    unit, year), appended to the regional data. One extra aggregate
    over the same shuffle keys minus geography."""
    global_rows = (
        df.filter(F.col("scenario_geography") != "Global")
        .groupBy("scenario", "sector", "unit", "year")
        .agg(F.avg("price").alias("price"))
        .withColumn("scenario_geography", F.lit("Global"))
    )
    return union_by_name(
        df.filter(F.col("scenario_geography") != "Global"), global_rows
    )


def prepare_price_data_long(
    raw: DataFrame,
    id_cols: Sequence[str] = (
        "scenario",
        "scenario_geography",
        "sector",
        "unit",
    ),
    first_year: int | None = None,
    horizon_end: int | None = None,
) -> DataFrame:
    """Full price chain. ``horizon_end`` past the data triggers the
    T4/W9 extension: dense spine to the horizon, interior
    interpolation, LOCF for flat gaps, then per-group OLS for the
    far extension (R/prepare_price_data_long.R:661-733 — the
    reference's per-row loop becomes two aggregate shuffles)."""
    long = melt_price_table(raw, id_cols)
    if first_year is not None:
        long = long.filter(F.col("year") >= first_year)  # P3 :33
    long = convert_units(long)
    long = add_global_mean_rows(long)
    keys = [c for c in PRICE_KEYS if c in long.columns]
    if horizon_end is not None:
        # lo comes from the data lazily (half-specified fixed bounds);
        # an eager min-year collect here replayed the whole upstream
        # chain as an extra job and crashed on empty input
        dense = complete_spine(
            long, keys, "year", bounds="fixed", hi=horizon_end
        )
    else:
        dense = complete_spine(long, keys, "year", bounds="group")
    interp = na_approx(dense, keys, "year", "price", na_rm=False)
    extended = lm_extrapolate(
        interp, keys, "year", "price", exact_scale=None
    )
    filled = fill_locf(extended, keys, "year", "price", direction="downup")
    return filled.select(
        *keys, "year", F.col("price").cast("double").alias("price")
    )


CARBON_KEYS = ["model", "scenario", "scenario_geography", "variable", "unit"]


def prepare_ngfs_carbon_price(
    raw: DataFrame,
    id_cols: Sequence[str] = (
        "Model",
        "Scenario",
        "Region",
        "Variable",
        "Unit",
    ),
) -> DataFrame:
    """Carbon-price chain (R/prepare_ngfs_carbon_price.R:17-174):
    melt the 5-year-step columns, complete the yearly spine per
    series, interpolate the interior (the reference's explicit
    per-cell loop :78-92 / :115-165 is exactly the W8 expression),
    keep edges as published."""
    renamed = raw.select(
        *[
            F.col(src).alias(dst)
            for src, dst in zip(id_cols, CARBON_KEYS)
        ],
        *[c for c in raw.columns if c.isdigit()],
    )
    long = melt_year_columns(
        renamed, id_cols=CARBON_KEYS, value_name="carbon_tax"
    )
    dense = complete_spine(long, CARBON_KEYS, "year", bounds="group")
    interp = na_approx(
        dense, CARBON_KEYS, "year", "carbon_tax", na_rm=False
    )
    return interp.select(*CARBON_KEYS, "year", "carbon_tax")


def add_cost_factor(
    df: DataFrame,
    group_cols: Sequence[str],
    price_col: str = "price",
    x_col: str = "year",
    out_col: str = "cost_factor",
) -> DataFrame:
    """W3 (R/prepare_LCOE_adjusted_price_data.R:38-48,146-156,280-290,
    409-419): ``cost_factor = first(price)/price`` per group ordered
    by year — the technology-cost decline index."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    first_p = F.first(price_col).over(w)
    return df.withColumn(
        out_col,
        F.when(F.col(price_col) != 0, first_p / F.col(price_col)),
    )


def prepare_lcoe_adjusted_prices(
    lcoe_long: DataFrame,
    fuel_prices: DataFrame,
    models: Sequence[str] = ("GCAM", "REMIND", "MESSAGE"),
) -> DataFrame:
    """LCOE adjustment chain (R/prepare_LCOE_adjusted_price_data.R):
    per-(scenario, region, technology) cost-decline factors from the
    LCOE series (W3), applied to the fuel-price series joined on the
    conformed keys (J3 natural-join sites :131-132,244-249), then
    fanned out across the NGFS models (R8 :225-242 — the reference
    builds constant columns and melts; the Spark idiom is one explode
    over a literal array).

    Inputs: ``lcoe_long`` (scenario, scenario_geography, technology,
    year, price); ``fuel_prices`` (scenario, scenario_geography,
    sector, unit, year, price).
    """
    factors = add_cost_factor(
        lcoe_long,
        ["scenario", "scenario_geography", "technology"],
    ).select(
        "scenario", "scenario_geography", "technology", "year", "cost_factor"
    )
    adjusted = fuel_prices.join(
        F.broadcast(factors),
        ["scenario", "scenario_geography", "year"],
        "inner",
    ).withColumn("lcoe_adjusted_price", F.col("price") * F.col("cost_factor"))
    from trisk_datawrangle_spark.operators.reshape import fan_out

    return fan_out(adjusted, "model", list(models))
