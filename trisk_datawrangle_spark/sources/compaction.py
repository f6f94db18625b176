"""Small-file compaction for partitioned parquet tables.

The operational problem at 100 TB: incremental writers
(``merge_by_key``, streaming ``foreachBatch`` sinks, hourly appends)
leave partitions holding hundreds of KB-scale files. Scans then pay
one task + one open per file, the driver pays listing and footer
reads, and shuffles inherit the tiny-split skew. Compaction is the
janitor: rewrite ONLY the offending partitions into ~target-sized
files, leave healthy partitions' files untouched (so their cache/
mtime survive), and swap so that a crash at ANY point never loses a
row.

Swap protocol per partition — whole-directory renames, each atomic
on local/HDFS filesystems, with a decidable recovery rule:

1. write the compacted files to a SIBLING dir
   ``<parent>/.compact-tmp-<leafname>`` (dot-prefixed: invisible to
   Spark's partition discovery, and outside the leaf so a concurrent
   leaf read never lists half-written files);
2. rename ``<leaf>`` → ``<parent>/.compact-trash-<leafname>``;
3. rename tmp → ``<leaf>``;
4. delete trash.

Crash windows and their recovery (run automatically on re-entry):

- tmp exists, trash absent → crashed during/after (1): originals
  are intact in the leaf; delete tmp.
- trash exists, leaf exists → crashed between (3) and (4): the
  promotion completed; delete trash.
- trash exists, leaf absent → crashed between (2) and (3): tmp is
  complete by construction (trash is only created after the tmp
  write fully succeeds); promote tmp, then delete trash.

The only reader-visible anomaly is a missing-partition window
between (2) and (3) — never a partial or mixed file set. On object
stores without atomic dir rename (S3), pair this with the
versioned-path + pointer pattern ``llm/lsh_index.py:publish_index``
implements, or run it against a real filesystem layer (HDFS,
OneZone, EFS). This is single-writer maintenance (like
``merge_by_key``): do not run it concurrently with a writer on the
same partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from trisk_datawrangle_spark.sources.incremental import (
    _walk_partition_dirs,
)


def _sibling(jvm, leaf_str: str, prefix: str):
    parent, name = leaf_str.rstrip("/").rsplit("/", 1)
    return jvm.org.apache.hadoop.fs.Path(f"{parent}/{prefix}{name}")


def recover_partition(spark: SparkSession, leaf_str: str) -> str | None:
    """Apply the module-docstring recovery rule for one leaf. Returns
    the action taken (None if there was nothing to recover)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    leaf = jvm.org.apache.hadoop.fs.Path(leaf_str)
    fs = leaf.getFileSystem(hconf)
    tmp = _sibling(jvm, leaf_str, ".compact-tmp-")
    trash = _sibling(jvm, leaf_str, ".compact-trash-")
    if fs.exists(trash):
        if fs.exists(leaf):
            fs.delete(trash, True)  # promotion completed, janitor died
            return "deleted-trash"
        fs.rename(tmp, leaf)  # tmp is complete once trash exists
        fs.delete(trash, True)
        return "promoted-tmp"
    if fs.exists(tmp):
        fs.delete(tmp, True)  # originals intact; abandon the attempt
        return "deleted-tmp"
    return None


def partition_file_stats(
    spark: SparkSession, path: str, partition_by: Sequence[str]
) -> list[dict]:
    """Per-partition file census: leaf path, file count, total bytes,
    smallest file — the input to the compaction decision (and a
    useful health report on its own)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    out = []
    for leaf in _walk_partition_dirs(fs, jvm, path, len(partition_by)):
        if leaf.getName().startswith((".", "_")):
            continue
        files = [
            st
            for st in fs.listStatus(leaf)
            if st.isFile() and not st.getPath().getName().startswith((".", "_"))
        ]
        if not files:
            continue
        sizes = [st.getLen() for st in files]
        out.append(
            {
                "leaf": leaf.toString(),
                "n_files": len(files),
                "bytes": sum(sizes),
                "min_file_bytes": min(sizes),
            }
        )
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: Sequence[str],
    target_bytes: int = 128 * 1024 * 1024,
    max_files: int = 4,
) -> dict:
    """Compact every partition of the parquet table at ``path`` whose
    file count exceeds ``max_files`` into ``ceil(bytes/target_bytes)``
    files, via the crash-safe directory-swap protocol in the module
    docstring (interrupted runs are recovered before the census, so
    re-entering after a crash is always safe). Healthy partitions are
    not read, not rewritten, not touched. Returns a report dict:
    partitions examined / compacted / recovered, files before/after.

    Scale notes: the decision pass is FS metadata only (one listStatus
    per leaf — no data read); each compacted partition is one
    column-complete read + coalesce write, independent and sequential
    here (parallelize across a driver thread pool if thousands of
    partitions need it — deliberately not done by default to bound
    FS load during production hours)."""
    import math

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)

    # recovery sweep BEFORE the census: an interrupted swap may have
    # left a leaf renamed away (trash-sibling present, leaf absent) —
    # walk the parent levels for compact markers and repair first
    recovered = 0
    depth = len(partition_by)
    parents = (
        [jvm.org.apache.hadoop.fs.Path(path)]
        if depth == 1
        else _walk_partition_dirs(fs, jvm, path, depth - 1)
    )
    for parent in parents:
        for st in fs.listStatus(parent):
            name = st.getPath().getName()
            for pref in (".compact-trash-", ".compact-tmp-"):
                if name.startswith(pref):
                    leaf_str = f"{parent.toString()}/{name[len(pref):]}"
                    if recover_partition(spark, leaf_str):
                        recovered += 1

    stats = partition_file_stats(spark, path, partition_by)
    report = {
        "examined": len(stats),
        "compacted": 0,
        "recovered": recovered,
        "files_before": 0,
        "files_after": 0,
    }
    for s in stats:
        report["files_before"] += s["n_files"]
        if s["n_files"] <= max_files:
            report["files_after"] += s["n_files"]
            continue
        leaf = jvm.org.apache.hadoop.fs.Path(s["leaf"])
        tmp = _sibling(jvm, s["leaf"], ".compact-tmp-")
        trash = _sibling(jvm, s["leaf"], ".compact-trash-")
        n_out = max(1, math.ceil(s["bytes"] / float(target_bytes)))
        # partition-column values live in the directory name, not the
        # files — read the leaf dir directly (no partition discovery)
        df = spark.read.parquet(s["leaf"])
        df.coalesce(n_out).write.mode("overwrite").parquet(
            tmp.toString()
        )
        n_new = len(
            [
                st
                for st in fs.listStatus(tmp)
                if st.isFile()
                and not st.getPath().getName().startswith((".", "_"))
            ]
        )
        # atomic swap: leaf -> trash, tmp -> leaf, drop trash
        fs.rename(leaf, trash)
        fs.rename(tmp, leaf)
        fs.delete(trash, True)
        report["compacted"] += 1
        report["files_after"] += n_new
    return report


def write_sized(
    df,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: Sequence[str] | None = None,
    sample_rows: int = 1000,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as parquet with output files sized toward
    ``target_bytes`` — the PREVENTION side of :func:`compact_partitions`
    (right-size at write time instead of compacting later).

    File count = ``ceil(estimated_bytes / target_bytes)`` where the
    estimate is row count × sampled average encoded-row size (a
    ``sample_rows``-row parquet encode in memory via Arrow — honest
    about compression, no full materialization). Partitioned writes
    repartition by the partition columns WITH a salt sized so each
    partition's files land near the target (files per partition =
    total files / distinct partitions, floored at 1). Returns the
    target file count. Estimation costs one count + one tiny sample;
    both reuse the input's lineage."""
    import io
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    n = df.count()
    if n == 0:
        df.write.mode(mode).parquet(path)
        return 1
    sample = df.limit(int(sample_rows)).toPandas()

    def encoded(frame) -> int:
        buf = io.BytesIO()
        pq.write_table(pa.Table.from_pandas(frame), buf)
        return buf.getbuffer().nbytes

    # difference of two encodes cancels the fixed parquet footer /
    # metadata cost that would otherwise inflate the per-row estimate
    head = max(1, len(sample) // 10)
    b_small, b_full = encoded(sample.head(head)), encoded(sample)
    per_row = max(1, (b_full - b_small) // max(1, len(sample) - head))
    est_bytes = n * per_row
    n_files = max(1, math.ceil(est_bytes / float(target_bytes)))
    if partition_by:
        n_parts = df.select(*partition_by).distinct().count()
        per_part = max(1, n_files // max(1, n_parts))
        salted = df.withColumn(
            "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(per_part))
        ).repartition(*partition_by, "__salt").drop("__salt")
        salted.write.mode(mode).partitionBy(*partition_by).parquet(path)
    else:
        df.repartition(n_files).write.mode(mode).parquet(path)
    return n_files
