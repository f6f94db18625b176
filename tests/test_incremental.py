"""Incremental merge semantics: upserts replace by key, append new
rows, and physically rewrite only the partitions the update batch
touches.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trisk_datawrangle_spark.sources.incremental import (
    merge_by_key,
    write_partitioned,
)


def _files(path, part):
    d = os.path.join(path, f"day={part}")
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_merge_by_key_upserts_and_prunes_partitions(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inc")) + "/t"
    base = spark.createDataFrame(
        [
            (1, "d1", 10.0),
            (2, "d1", 20.0),
            (3, "d2", 30.0),
            (4, "d3", 40.0),
        ],
        "id long, day string, v double",
    )
    write_partitioned(base, path, ["day"])
    untouched_before = _files(path, "d3")

    updates = spark.createDataFrame(
        [
            (2, "d1", 99.0),   # replaces id=2
            (5, "d2", 50.0),   # new row in existing partition
            (6, "d4", 60.0),   # brand-new partition
        ],
        "id long, day string, v double",
    )
    merge_by_key(spark, updates, path, keys=["id"], partition_by=["day"])

    got = {
        (r.id, r.day, r.v)
        for r in spark.read.parquet(path).select("id", "day", "v").collect()
    }
    assert got == {
        (1, "d1", 10.0),
        (2, "d1", 99.0),
        (3, "d2", 30.0),
        (4, "d3", 40.0),
        (5, "d2", 50.0),
        (6, "d4", 60.0),
    }
    # the untouched partition's files were not rewritten
    assert _files(path, "d3") == untouched_before


def test_merge_empty_batch_is_noop(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inc")) + "/t"
    base = spark.createDataFrame([(1, "d1", 1.0)], "id long, day string, v double")
    write_partitioned(base, path, ["day"])
    before = _files(path, "d1")
    merge_by_key(
        spark, base.filter(F.lit(False)), path, keys=["id"], partition_by=["day"]
    )
    assert _files(path, "d1") == before
    assert spark.read.parquet(path).count() == 1
