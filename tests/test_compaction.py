"""Small-file compaction: content preserved exactly, offending
partitions shrink to the computed file count, healthy partitions'
files are physically untouched, crash leftovers are cleaned.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trisk_datawrangle_spark.sources.compaction import (
    compact_partitions,
    partition_file_stats,
)


def _files(leaf):
    return sorted(
        f for f in os.listdir(leaf)
        if not f.startswith((".", "_")) and f.endswith(".parquet")
    )


def _mk_table(spark, path):
    # partition a: 12 tiny files; partition b: 1 file (healthy)
    a = spark.range(0, 1200).select(
        F.col("id"), F.lit("a").alias("part"),
        (F.col("id") * 3).alias("v"),
    ).repartition(12)
    b = spark.range(2000, 2100).select(
        F.col("id"), F.lit("b").alias("part"),
        (F.col("id") * 3).alias("v"),
    ).coalesce(1)
    a.write.partitionBy("part").mode("overwrite").parquet(path)
    b.write.partitionBy("part").mode("append").parquet(path)


def test_compaction_preserves_rows_and_skips_healthy(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    before = {
        (r.id, r.part, r.v)
        for r in spark.read.parquet(path).collect()
    }
    healthy_before = _files(f"{path}/part=b")
    stats = {s["leaf"].split("part=")[1]: s
             for s in partition_file_stats(spark, path, ["part"])}
    assert stats["a"]["n_files"] == 12
    assert stats["b"]["n_files"] == 1

    rep = compact_partitions(
        spark, path, ["part"], target_bytes=10**9, max_files=4
    )
    assert rep["examined"] == 2
    assert rep["compacted"] == 1
    assert rep["files_before"] == 13
    assert rep["files_after"] == 2  # 1 compacted + 1 healthy

    after = {
        (r.id, r.part, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert after == before
    assert len(_files(f"{path}/part=a")) == 1
    # healthy partition: same file names, untouched
    assert _files(f"{path}/part=b") == healthy_before
    # no residue
    assert not os.path.exists(f"{path}/part=a/.compact-tmp")
    assert not os.path.exists(f"{path}/part=a/.compact-trash")


def test_compaction_recovers_from_stale_dirs(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    _mk_table(spark, path)
    before = spark.read.parquet(path).count()
    # simulate an interrupted previous run
    os.makedirs(f"{path}/part=a/.compact-tmp", exist_ok=True)
    os.makedirs(f"{path}/part=a/.compact-trash", exist_ok=True)
    with open(f"{path}/part=a/.compact-trash/junk.parquet", "w") as fh:
        fh.write("x")
    rep = compact_partitions(
        spark, path, ["part"], target_bytes=10**9, max_files=4
    )
    assert rep["compacted"] == 1
    assert spark.read.parquet(path).count() == before
    assert not os.path.exists(f"{path}/part=a/.compact-tmp")
    assert not os.path.exists(f"{path}/part=a/.compact-trash")


def test_compaction_respects_target_bytes(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    _mk_table(spark, path)
    total = sum(
        s["bytes"]
        for s in partition_file_stats(spark, path, ["part"])
        if "part=a" in s["leaf"]
    )
    # force ~3 output files
    rep = compact_partitions(
        spark, path, ["part"], target_bytes=total // 3 + 1, max_files=4
    )
    assert rep["compacted"] == 1
    assert 2 <= len(_files(f"{path}/part=a")) <= 3
    assert spark.read.parquet(path).filter("part = 'a'").count() == 1200
