"""Mergeable sketch aggregates: distinct counts that fold like sums.

Exact COUNT(DISTINCT) does not roll up — the hour-grain distinct
counts of a day cannot be added (users repeat across hours). HLL
sketches fix that: each bucket keeps a fixed-size (2^lg_k registers)
sketch column, and coarser grains ``hll_union_agg`` the finer
sketches — the union of sketches IS the sketch of the union, so the
estimate at any grain is identical to sketching the raw rows
directly. That turns the non-additive aggregate into a rollup-ladder
resident (see operators/rollup.py) at a few KB per bucket instead of
a per-bucket distinct-set shuffle over 100 TB.

All functions are JVM-side (Datasketches HLL via
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
no Python in the hot path. Estimates carry the usual HLL relative
error (~1.04/sqrt(2^lg_k); ~1.6% at the default lg_k=12).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.rollup import (
    GRAIN_ORDER,
    fold_ladder,
    route_grain,
)


def hll_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    distinct_col: str = "user_id",
    grains: Sequence[str] = GRAIN_ORDER,
    lg_k: int = 12,
) -> dict[str, DataFrame]:
    """Build the sketch ladder: raw rows are sketched once at the
    finest grain; every coarser grain unions the previous grain's
    sketches (the same :func:`fold_ladder` scaffolding as the additive
    rollups — only the aggregates differ). Returns {grain:
    DataFrame(bucket, *group_cols, sketch)}.
    """
    return fold_ladder(
        events,
        ts_col,
        group_cols,
        grains,
        [F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch")],
        [F.hll_union_agg("sketch").alias("sketch")],
    )


def hll_range_distinct(
    rollups: dict[str, DataFrame],
    start,
    end,
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Approximate distinct count over [start, end) from the routed
    grain: union the covered buckets' sketches per group, estimate
    once at the end."""
    g = route_grain(start, end, list(rollups))
    r = rollups[g].filter(
        (F.col("bucket") >= F.lit(start)) & (F.col("bucket") < F.lit(end))
    )
    return (
        r.groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn(
            "approx_distinct", F.hll_sketch_estimate("sketch").cast("long")
        )
        .drop("sketch")
    )


def cms_sketch(df: DataFrame, col: str, eps: float = 1e-4,
               confidence: float = 0.99, seed: int = 42) -> bytes:
    """Count-Min sketch of a column as bytes: the ``count_min_sketch``
    SQL aggregate builds and merges per-partition sketches JVM-side
    (mergeable like the HLL ladder — the merged sketch IS the sketch
    of the union), and only the final KB-scale binary reaches the
    driver. Width ``ceil(e/eps)`` counters × depth ``ceil(ln(1/(1-
    confidence)))`` rows; estimates never undercount and overcount by
    ≤ eps·N with probability ≥ confidence."""
    row = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("__cms")
    ).head()
    return bytes(row["__cms"])


def cms_estimate(spark, sketch: bytes, values) -> dict:
    """Point-frequency estimates from a serialized Count-Min sketch —
    driver-side on the tiny binary (the distributed work already
    happened in :func:`cms_sketch`). Strings hash as their UTF-8
    bytes, matching how the SQL aggregate added them."""
    cms = _cms_read(spark, sketch)
    return {v: cms.estimateCount(v) for v in values}


def _cms_read(spark, sketch: bytes):
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    )


def cms_total(spark, sketch: bytes) -> int:
    """Total item count folded into a serialized Count-Min sketch —
    the N in the eps·N overcount guarantee."""
    return int(_cms_read(spark, sketch).totalCount())
