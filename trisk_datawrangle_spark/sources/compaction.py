"""Small-file compaction for partitioned parquet tables.

The operational problem at 100 TB: incremental writers
(``merge_by_key``, streaming ``foreachBatch`` sinks, hourly appends)
leave partitions holding hundreds of KB-scale files. Scans then pay
one task + one open per file, the driver pays listing and footer
reads, and shuffles inherit the tiny-split skew. Compaction is the
janitor: rewrite ONLY the offending partitions into ~target-sized
files, leave healthy partitions' files untouched (so their cache/
mtime survive), and swap atomically enough that a concurrent reader
never sees a partially-compacted partition.

Swap protocol per partition (documented, not hidden): write to
``<leaf>/.compact-tmp`` inside the partition (hidden from Spark
scans: dot-prefixed), then move the old files to
``<leaf>/.compact-trash``, promote the tmp files, delete the trash.
A crash can leave a ``.compact-trash``/``.compact-tmp`` directory
behind (both invisible to readers — dot-dirs are skipped by the
parquet scanner) and at worst the partition keeps its ORIGINAL
files; promotion only happens after the tmp write fully succeeds.
``compact_partitions`` re-entered after a crash cleans both up.

This is single-writer maintenance (like ``merge_by_key``): do not
run it concurrently with a writer on the same partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from trisk_datawrangle_spark.sources.incremental import (
    _walk_partition_dirs,
)


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
    files. Healthy partitions are not read, not rewritten, not
    touched. Returns a report dict: partitions examined / compacted,
    files before / after.

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

    stats = partition_file_stats(spark, path, partition_by)
    report = {
        "examined": len(stats),
        "compacted": 0,
        "files_before": 0,
        "files_after": 0,
    }
    for s in stats:
        report["files_before"] += s["n_files"]
        if s["n_files"] <= max_files:
            report["files_after"] += s["n_files"]
            continue
        leaf = jvm.org.apache.hadoop.fs.Path(s["leaf"])
        tmp = jvm.org.apache.hadoop.fs.Path(s["leaf"] + "/.compact-tmp")
        trash = jvm.org.apache.hadoop.fs.Path(s["leaf"] + "/.compact-trash")
        # crash-recovery: stale dirs from an interrupted run
        for stale in (tmp, trash):
            if fs.exists(stale):
                fs.delete(stale, True)
        n_out = max(1, math.ceil(s["bytes"] / float(target_bytes)))
        # partition-column values live in the directory name, not the
        # files — read the leaf dir directly (no partition discovery)
        df = spark.read.parquet(s["leaf"])
        df.coalesce(n_out).write.mode("overwrite").parquet(
            tmp.toString()
        )
        new_files = [
            st.getPath()
            for st in fs.listStatus(tmp)
            if st.isFile() and not st.getPath().getName().startswith((".", "_"))
        ]
        # move originals to trash, promote, clean
        fs.mkdirs(trash)
        for st in fs.listStatus(leaf):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith((".", "_")):
                fs.rename(
                    st.getPath(),
                    jvm.org.apache.hadoop.fs.Path(
                        trash.toString() + "/" + name
                    ),
                )
        for p in new_files:
            fs.rename(
                p,
                jvm.org.apache.hadoop.fs.Path(
                    s["leaf"] + "/" + p.getName()
                ),
            )
        fs.delete(tmp, True)
        fs.delete(trash, True)
        report["compacted"] += 1
        report["files_after"] += len(new_files)
    return report
