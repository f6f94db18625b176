"""Time-bucketed aggregation over event streams (batch or streaming).

``tumbling_agg`` is written against the batch DataFrame API but the
identical expression tree is valid under Structured Streaming:
``spark.readStream...`` → same transformations → ``writeStream`` with
``withWatermark(ts_col, delay)`` prepended for late-data bounds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregation: one row per (window, groups).

    In batch mode ``F.window`` bucketing is a plain projection before
    the aggregate — no special machinery. Pass ``watermark`` when the
    input is a stream to bound state."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
