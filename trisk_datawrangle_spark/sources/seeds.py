"""In-package seed datasets (S7; R/data.R:1-27).

The reference ships its lookup/dimension data as package ``.rda``
files (``scenarios_geographies``, ``production_types``); this engine
ships the same shapes as parquet under
``trisk_datawrangle_spark/data/`` so a pipeline can resolve them with
no external inputs. Regenerate with ``scripts/build_seed_data.py``.

Seeds are dimension-sized (dozens of rows): always broadcast them
against fact tables. ``load_seed`` reads the file DRIVER-side (pyarrow
against the installed package) and ships the rows via
``createDataFrame`` — a ``spark.read.parquet`` on the bare path would
resolve against the cluster's default filesystem (HDFS/S3) and ask
executors, which may not have the package installed, to scan a local
file. Seed frames are far below any broadcast threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SEED_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

SEED_NAMES = (
    "scenarios_geographies",
    "production_types",
    "unit_conversions",
    "p4i_p4b_lookup",
)


def seed_path(name: str) -> str:
    """Absolute path of a shipped seed parquet."""
    if name not in SEED_NAMES:
        raise KeyError(f"unknown seed dataset {name!r}; have {SEED_NAMES}")
    return os.path.join(SEED_DIR, f"{name}.parquet")


def load_seed(spark: SparkSession, name: str) -> DataFrame:
    """Read a shipped seed dataset (S7) — driver-side local read."""
    import pyarrow.parquet as pq

    table = pq.read_table(seed_path(name))
    return spark.createDataFrame(table.to_pandas())


def load_seeds(spark: SparkSession) -> dict[str, DataFrame]:
    """All seed datasets keyed by name."""
    return {n: load_seed(spark, n) for n in SEED_NAMES}
