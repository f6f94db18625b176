"""Incremental table maintenance on plain parquet: merge a batch of
updates into a partitioned table rewriting ONLY the touched
partitions.

At pipeline scale the daily update touches a handful of date/scenario
partitions of a table whose full rewrite would be a 100 TB job.
Dynamic partition overwrite (``partitionOverwriteMode=dynamic``)
makes ``mode("overwrite")`` replace exactly the partitions present in
the written frame; ``merge_by_key`` builds those partitions' new
content as updates ⊕ (existing ∖ updates-by-key) — an upsert — while
every other partition's files are never read or written.

No table format (Delta/Iceberg) ships in this environment; this is
the same merge shape those formats implement, expressed on the plain
parquet layout the corpus uses. Swap the writer for a MERGE INTO when
a transactional format is available — reader-side plans are
unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_by: Sequence[str]
) -> None:
    """Initial load: partitioned parquet layout."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def upsert_partitions(df: DataFrame, path: str, partition_by: Sequence[str]) -> None:
    """Overwrite only the partitions present in ``df`` (dynamic mode
    is set per-write, not globally, so other writers keep static
    semantics)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def _table_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FS API —
    ``os.path.exists`` is driver-local and always False for s3://
    hdfs:// etc., which would make every micro-batch 'bootstrap' and
    statically overwrite the table."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def stream_upsert(
    stream_df: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
    checkpoint: str,
):
    """Maintain a partitioned parquet table from a stream: each
    micro-batch is key-merged into the table (``foreachBatch`` →
    :func:`merge_by_key`), so the table always holds the latest row
    per key while only touched partitions are rewritten.

    The checkpoint makes ingestion resumable — a restarted query
    continues from the last committed batch instead of re-merging
    history. Returns the started StreamingQuery (caller awaits /
    stops); uses availableNow so batch backfills and continuous runs
    share the code path.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        if _table_exists(batch_df.sparkSession, path):
            merge_by_key(
                batch_df.sparkSession, batch_df, path, keys, partition_by
            )
        else:  # first batch bootstraps the table layout
            write_partitioned(batch_df, path, partition_by)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _partition_filter(parts, partition_by: Sequence[str]):
    """OR-of-ANDs partition predicate, NULL-safe: ``== lit(None)``
    evaluates to NULL and silently drops existing rows from a NULL
    partition (which dynamic overwrite then deletes)."""
    cond = F.lit(False)
    for p in parts:
        clause = F.lit(True)
        for c in partition_by:
            clause = clause & F.col(c).eqNullSafe(F.lit(p[c]))
        cond = cond | clause
    return cond


def merge_by_key(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
) -> None:
    """Upsert ``updates`` into the table at ``path``: rows matching on
    ``keys`` are replaced (wherever they currently live), new rows
    appended, and only affected partitions are rewritten.

    Affected partitions = partitions named by the update batch ∪
    partitions currently holding an updated key (a key may move
    between partitions; finding its old home is one column-pruned
    semi-join over (keys, partition cols) — no data columns read).
    The existing-side read filters to those partitions, drops rows
    whose key reappears in the batch (left-anti join over just those
    partitions' rows), and the union is written with dynamic
    partition overwrite. A partition whose every row moved away is
    deleted explicitly (dynamic overwrite cannot write an empty
    partition).
    """
    keys = list(keys)
    partition_by = list(partition_by)
    upd_keys = updates.select(*keys).distinct()
    table = spark.read.parquet(path)
    # partitions that currently hold any updated key (key moves)
    old_parts = (
        table.select(*keys, *partition_by)
        .join(upd_keys, keys, "left_semi")
        .select(*partition_by)
        .distinct()
        .collect()
    )
    new_parts = updates.select(*partition_by).distinct().collect()
    seen, parts = set(), []
    for p in [*new_parts, *old_parts]:
        t = tuple(p[c] for c in partition_by)
        if t not in seen:
            seen.add(t)
            parts.append(p)
    if not parts:
        return
    cond = _partition_filter(parts, partition_by)
    existing = table.filter(cond)
    kept = existing.join(upd_keys, keys, "left_anti")
    merged = updates.select(*existing.columns).unionByName(kept)
    # the merged frame re-reads `path` while overwrite is rewriting it
    # → materialize before the write (localCheckpoint severs lineage)
    merged = merged.localCheckpoint(eager=True)
    upsert_partitions(merged, path, partition_by)
    # partitions fully drained by key moves: dynamic overwrite wrote
    # no rows there, so the stale files must be removed explicitly
    written = {
        tuple(r[c] for c in partition_by)
        for r in merged.select(*partition_by).distinct().collect()
    }
    drained = [p for p in parts if tuple(p[c] for c in partition_by) not in written]
    if drained:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for p in drained:
            leaf = "/".join(
                f"{c}={'__HIVE_DEFAULT_PARTITION__' if p[c] is None else p[c]}"
                for c in partition_by
            )
            hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{leaf}")
            fs = hpath.getFileSystem(hconf)
            fs.delete(hpath, True)
