"""Query catalog: every implemented operator from SURVEY.md §2 as a
(spark_query, duckdb_oracle_sql) pair.

``QUERIES[name](spark, sf_dir) -> DataFrame`` runs the Spark-side
implementation; ``ORACLES[name]`` is the equivalent ANSI SQL DuckDB
runs on the same parquet tables. Names are prefixed with the
SURVEY.md §2 inventory id they cover (p3=filter, j2=inner join,
w8=interpolation, ...) so coverage is auditable line-by-line.

Float-determinism contract (SURVEY.md §7.4): money sums use the
exact integer-cents trick (order-independent, bit-identical on any
partitioning and in any engine); O(1)-scale ratios are rounded to 6
decimals; regression/average outputs to 2-6. Both sides compute the
same expression shapes so values hash-match exactly.
"""

from trisk_datawrangle_spark.catalog.relational import (
    ORACLES as _REL_ORACLES,
    QUERIES as _REL_QUERIES,
)
from trisk_datawrangle_spark.catalog.llm import (
    ORACLES as _LLM_ORACLES,
    QUERIES as _LLM_QUERIES,
)
from trisk_datawrangle_spark.catalog.extended import (
    ORACLES as _EXT_ORACLES,
    QUERIES as _EXT_QUERIES,
)

QUERIES = {**_REL_QUERIES, **_LLM_QUERIES, **_EXT_QUERIES}
ORACLES = {**_REL_ORACLES, **_LLM_ORACLES, **_EXT_ORACLES}

assert set(ORACLES) <= set(QUERIES), "oracle without query"
