"""Regenerate the in-package seed datasets (S7,
R/data.R — the reference ships its lookup/dimension data as package
``.rda``; this engine ships the same shapes as parquet under
``trisk_datawrangle_spark/data/``).

Deterministic by construction: literal rows, fixed order, one
row-group, no writer timestamps beyond what parquet mandates. Run from
the repo root::

    python scripts/build_seed_data.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "trisk_datawrangle_spark",
    "data",
)

# bench_regions shape (scenarios_geographies, R/data.R): which
# countries make up each scenario geography. Public ISO-3166 codes.
_GEOGRAPHIES: dict[str, list[tuple[str, str]]] = {
    "Africa": [
        ("DZ", "Algeria"), ("AO", "Angola"), ("EG", "Egypt"),
        ("KE", "Kenya"), ("MA", "Morocco"), ("NG", "Nigeria"),
        ("ZA", "South Africa"),
    ],
    "Asia": [
        ("CN", "China"), ("ID", "Indonesia"), ("IN", "India"),
        ("JP", "Japan"), ("KR", "South Korea"), ("MY", "Malaysia"),
        ("TH", "Thailand"), ("VN", "Vietnam"),
    ],
    "EuropeanUnion": [
        ("AT", "Austria"), ("BE", "Belgium"), ("DE", "Germany"),
        ("ES", "Spain"), ("FR", "France"), ("IT", "Italy"),
        ("NL", "Netherlands"), ("PL", "Poland"), ("SE", "Sweden"),
    ],
    "LatinAmerica": [
        ("AR", "Argentina"), ("BR", "Brazil"), ("CL", "Chile"),
        ("CO", "Colombia"), ("MX", "Mexico"), ("PE", "Peru"),
    ],
    "MiddleEast": [
        ("AE", "United Arab Emirates"), ("IQ", "Iraq"),
        ("IR", "Iran"), ("KW", "Kuwait"), ("QA", "Qatar"),
        ("SA", "Saudi Arabia"),
    ],
    "NorthAmerica": [
        ("CA", "Canada"), ("MX", "Mexico"), ("US", "United States"),
    ],
    "OECD": [
        ("AU", "Australia"), ("CA", "Canada"), ("DE", "Germany"),
        ("FR", "France"), ("GB", "United Kingdom"), ("IT", "Italy"),
        ("JP", "Japan"), ("KR", "South Korea"), ("US", "United States"),
    ],
}

# Scenario-analysis production types (production_types, R/data.R):
# sector → technology → production unit vocabulary.
_PRODUCTION_TYPES: list[tuple[str, str, str]] = [
    ("Automotive", "Electric", "# vehicles"),
    ("Automotive", "Hybrid", "# vehicles"),
    ("Automotive", "ICE", "# vehicles"),
    ("Aviation", "Freight", "tkm"),
    ("Aviation", "Passenger", "pkm"),
    ("Coal", "Coal", "tonnes of coal"),
    ("Oil&Gas", "Gas", "GJ"),
    ("Oil&Gas", "Oil", "GJ"),
    ("Power", "CoalCap", "MW"),
    ("Power", "GasCap", "MW"),
    ("Power", "HydroCap", "MW"),
    ("Power", "NuclearCap", "MW"),
    ("Power", "OilCap", "MW"),
    ("Power", "RenewablesCap", "MW"),
    ("Steel", "BF-BOF", "tonnes of steel"),
    ("Steel", "BF-EAF", "tonnes of steel"),
    ("Steel", "BF-OHF", "tonnes of steel"),
    ("Steel", "BOF", "tonnes of steel"),
    ("Steel", "DRI-BOF", "tonnes of steel"),
    ("Steel", "DRI-EAF", "tonnes of steel"),
    ("Steel", "EAF", "tonnes of steel"),
]


# P4I <-> P4B sector/technology vocabulary bridge
# (R/lookup.R:p4i_p4b_sector_technology_lookup).
_P4I_P4B_LOOKUP: list[tuple[str, str, str, str]] = [
    ("automotive", "electric", "Automotive", "Electric"),
    ("automotive", "hybrid", "Automotive", "Hybrid"),
    ("automotive", "ice", "Automotive", "ICE"),
    ("aviation", "freight", "Aviation", "Freight"),
    ("aviation", "passenger", "Aviation", "Passenger"),
    ("cement", "grinding", "Cement", "Grinding"),
    ("cement", "integrated facility", "Cement", "Integrated facility"),
    ("coal", "coal", "Coal", "Coal"),
    ("oil and gas", "gas", "Oil&Gas", "Gas"),
    ("oil and gas", "oil", "Oil&Gas", "Oil"),
    ("power", "coalcap", "Power", "CoalCap"),
    ("power", "gascap", "Power", "GasCap"),
    ("power", "hydrocap", "Power", "HydroCap"),
    ("power", "nuclearcap", "Power", "NuclearCap"),
    ("power", "oilcap", "Power", "OilCap"),
    ("power", "renewablescap", "Power", "RenewablesCap"),
    ("steel", "ac-electric arc furnace", "Steel", "Ac-Electric Arc Furnace"),
    ("steel", "bof shop", "Steel", "Bof Shop"),
    ("steel", "dc-electric arc furnace", "Steel", "Dc-Electric Arc Furnace"),
    ("steel", "open hearth meltshop", "Steel", "Open Hearth Meltshop"),
]


def _unit_rows() -> list[tuple[str, str, float]]:
    from trisk_datawrangle_spark.functions.scalars import UNIT

    return [
        ("usd/barrel", "usd/GJ", UNIT.BARREL_TO_GJ),
        ("usd/Mbtu", "usd/GJ", UNIT.MBTU_TO_GJ),
        ("usd/MWh", "usd/GJ", UNIT.USD_MWH_TO_USD_GJ),
        ("TWh", "GW-year", UNIT.TWH_TO_GW_YEAR),
        ("TWh", "GW-year-leap", UNIT.TWH_TO_GW_LEAP),
        ("EJ", "GW-year", UNIT.EJ_TO_GW),
        ("tonne of coal", "GJ", UNIT.COAL_TONNE_TO_GJ),
    ]


def build() -> dict[str, pa.Table]:
    geo_rows = []
    for geo in sorted(_GEOGRAPHIES):
        members = _GEOGRAPHIES[geo]
        for iso, country in members:
            geo_rows.append(
                (geo, iso, len(members), geo, country)
            )
    scenarios_geographies = pa.table(
        {
            "scenario_geography": [r[0] for r in geo_rows],
            "country_iso": [r[1] for r in geo_rows],
            "reg_count": pa.array(
                [r[2] for r in geo_rows], type=pa.int32()
            ),
            "scenario_geography_newname": [r[3] for r in geo_rows],
            "country": [r[4] for r in geo_rows],
        }
    )
    production_types = pa.table(
        {
            "ald_sector": [r[0] for r in _PRODUCTION_TYPES],
            "technology": [r[1] for r in _PRODUCTION_TYPES],
            "units": [r[2] for r in _PRODUCTION_TYPES],
        }
    )
    units = _unit_rows()
    unit_conversions = pa.table(
        {
            "from_unit": [r[0] for r in units],
            "to_unit": [r[1] for r in units],
            "factor": pa.array([r[2] for r in units], type=pa.float64()),
        }
    )
    p4i_p4b_lookup = pa.table(
        {
            "sector_p4b": [r[0] for r in _P4I_P4B_LOOKUP],
            "technology_p4b": [r[1] for r in _P4I_P4B_LOOKUP],
            "sector_p4i": [r[2] for r in _P4I_P4B_LOOKUP],
            "technology_p4i": [r[3] for r in _P4I_P4B_LOOKUP],
        }
    )
    return {
        "scenarios_geographies": scenarios_geographies,
        "production_types": production_types,
        "unit_conversions": unit_conversions,
        "p4i_p4b_lookup": p4i_p4b_lookup,
    }


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    for name, table in build().items():
        path = os.path.join(DATA_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="snappy")
        print(f"wrote {path}: {table.num_rows} rows")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(DATA_DIR.rstrip("/")) + "/..")
    main()
