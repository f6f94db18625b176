"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship pipeline (T1 spine + W8 interpolation +
  W1/W2 market shares — SURVEY.md §7.1.2) on sf0.001.
- ``queries()``: one entry per implemented SURVEY.md §2 operator
  (names prefixed with the inventory id they cover).
- ``oracle_sql()``: DuckDB-equivalent SQL for EVERY query (since
  round 4 the hash-based ops compose with exact verification or
  ground-truth gating, so the full catalog is value-hash checkable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trisk_datawrangle_spark.catalog import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_market_share"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
