"""Z-order clustering: the measured claim — a 2-D selective query
prunes far more files under z-order layout than under a 1-D sort,
and content round-trips exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trisk_datawrangle_spark.sources.zorder import (
    file_minmax_boxes,
    files_pruned,
    write_zordered,
)

N_FILES = 16


def _data(spark):
    # 40k points, two independent uniform dims — the layout-neutral
    # worst case (any correlation makes z-order look even better)
    return (
        spark.range(0, 40_000)
        .select(
            F.col("id"),
            (F.xxhash64(F.col("id"), F.lit(1)) % 10_000).alias("x"),
            (F.xxhash64(F.col("id"), F.lit(2)) % 10_000).alias("y"),
        )
        .withColumn("x", F.abs("x"))
        .withColumn("y", F.abs("y"))
    )


def test_zorder_prunes_both_dims(spark, tmp_path):
    df = _data(spark)
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "x")
    write_zordered(df, zpath, ["x", "y"], n_files=N_FILES)
    # baseline: classic single-column range sort, same file count
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    zbox = file_minmax_boxes(zpath, ["x", "y"])
    xbox = file_minmax_boxes(xpath, ["x", "y"])
    assert len(zbox) == N_FILES and len(xbox) == N_FILES

    # selective box on BOTH dims: 10% x 10% of the space
    pred = {"x": (0, 999), "y": (0, 999)}
    z_hit, _ = files_pruned(zbox, pred)
    x_hit, _ = files_pruned(xbox, pred)
    # x-sorted layout prunes on x (~2 files survive) but EVERY
    # surviving file spans all of y; z-order confines both dims
    assert z_hit <= x_hit
    # y-only predicate: the case 1-D layout cannot skip at all
    pred_y = {"y": (0, 999)}
    zy_hit, _ = files_pruned(zbox, pred_y)
    xy_hit, _ = files_pruned(xbox, pred_y)
    assert xy_hit == N_FILES  # 1-D sort: zero skipping on y
    assert zy_hit <= N_FILES // 2, (zy_hit, [b["y"] for b in zbox])


def test_zorder_roundtrip_exact(spark, tmp_path):
    df = _data(spark)
    zpath = str(tmp_path / "z2")
    write_zordered(df, zpath, ["x", "y"], n_files=8)
    before = {(r.id, r.x, r.y) for r in df.collect()}
    after = {
        (r.id, r.x, r.y) for r in spark.read.parquet(zpath).collect()
    }
    assert after == before
