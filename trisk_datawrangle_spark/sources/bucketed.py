"""Bucketed tables: shuffle-free co-located joins.

The 100 TB join story the rest of the repo alludes to, made concrete:
two fact tables bucketed (and sorted) by their join key can be joined
with ZERO Exchange — each bucket pair joins locally, a sort-merge
over pre-sorted files. For a join both sides of which are large and
reused across many queries (orders ⋈ lineitem in every pipeline
here), paying one bucketed WRITE amortizes the per-query shuffle of
both fact tables away.

Spark requires the metastore for bucket metadata — path-based parquet
reads don't carry it — so these helpers go through
``saveAsTable``/``spark.table`` with a warehouse-local database. That
is the honest constraint of the feature, documented rather than
hidden: a deployment points ``spark.sql.warehouse.dir`` at durable
storage.

Plan contract (asserted in tests/test_bucketed.py): a join of two
tables bucketed into the same bucket count on the join key plans as
SortMergeJoin with NO ShuffleExchange on either side; with
``spark.sql.sources.bucketing.autoBucketedScan.enabled`` the scan
stays bucket-aware.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed
    parquet table. ``n_buckets`` should be sized so a bucket of the
    LARGER table fits an executor's task comfortably (bucket count is
    fixed at write time — plan for the table's growth, not its
    current size; Spark joins tables whose bucket counts differ by
    an integer factor without reshuffling the finer side).

    Orphan recovery: with ``mode="overwrite"``, if the table is NOT
    in this session's catalog but a previous process left its data
    directory under the warehouse, Spark refuses to create over the
    existing location — so the orphaned directory is deleted first
    (through the Hadoop FileSystem API, so any warehouse scheme
    works, not just ``file:``). Bucket METADATA lives in the
    catalog; adopting orphaned files without it would silently lose
    the bucketing this module exists to guarantee, so a rebuild is
    the only correct recovery."""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        jvm = spark.sparkContext._jvm
        wh = spark.conf.get("spark.sql.warehouse.dir")
        name = table.split(".")
        rel = (
            f"{name[0]}.db/{name[1]}" if len(name) == 2 else name[0]
        )
        loc = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + rel)
        fs = loc.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if fs.exists(loc):
            fs.delete(loc, True)
    w = df.write.format("parquet").mode(mode).bucketBy(
        int(n_buckets), *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table``
    — a path read would silently drop bucketing and reintroduce the
    shuffle)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key. The plan this
    produces is the point: both scans expose ``SelectedBucketsCount``
    and the SortMergeJoin has no Exchange child on a correctly
    bucketed pair (asserted by tests, not assumed)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), list(on), how
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the plan shuffles either join side — the guard a
    pipeline can call after composing a bucketed join to fail fast
    when someone repartitioned/aliased away the bucket metadata."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join plans an Exchange — bucket metadata was "
            "lost (path-based read? mismatched bucket counts?):\n"
            + plan[:2000]
        )
