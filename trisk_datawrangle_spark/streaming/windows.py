"""Time-bucketed aggregation over event streams (batch or streaming).

Every helper is written against the DataFrame API so the identical
expression tree runs in batch (``spark.read``) and under Structured
Streaming (``spark.readStream`` → same transformations →
``writeStream``). For streams, pass ``watermark`` so state stays
bounded: tumbling/sliding windows emit finalized buckets once the
watermark passes the window end, and stateful dedup can drop seen-key
state past the horizon.

The reference pipeline is batch-only (SURVEY.md §2.12); these exist
because a 100 TB training-data pipeline ingests event/telemetry
streams, and the engine's time-bucketing must not fork into a second
code path to do so.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        from trisk_datawrangle_spark.operators.temporal import (
            _with_ts_watermarkable,
        )

        # Spark 4 reads tz-less parquet as TIMESTAMP_NTZ, which
        # withWatermark rejects; relabel to TIMESTAMP first.
        return _with_ts_watermarkable(df, ts_col).withWatermark(
            ts_col, watermark
        )
    return df


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
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregation (each event lands in
    duration/slide buckets — the fan-out is a projection, state is
    bounded by the watermark)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregation (``F.session_window``): windows
    close after ``gap`` of inactivity per group. Streaming requires a
    watermark (session state cannot be bounded without one)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Exactly-once-per-key filtering. On a stream with a watermark,
    ``dropDuplicatesWithinWatermark`` keeps per-key state only inside
    the lateness horizon (unbounded dedup state is the classic
    streaming OOM); in batch it degrades to a plain dropDuplicates."""
    keys = list(key_cols)
    if df.isStreaming:
        if ts_col is None or watermark is None:
            # one given or NEITHER: both fall back to unbounded-state
            # dropDuplicates on a stream — the exact OOM this guard
            # exists to prevent
            raise ValueError(
                "stream_dedup on a stream needs BOTH ts_col and watermark "
                "— a silent fallback to dropDuplicates would accumulate "
                "per-key state forever"
            )
        from trisk_datawrangle_spark.operators.temporal import (
            _with_ts_watermarkable,
        )

        return (
            _with_ts_watermarkable(df, ts_col)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return df.dropDuplicates(keys)


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: list | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach a (small, slowly-
    changing) dimension to an event stream before windowing. The
    static side is broadcast; under Structured Streaming, Spark
    re-plans the join each micro-batch, so a refreshed dimension
    table is picked up without restarting the query. The expression
    is identical on batch frames — the batch⇄stream parity contract
    the rest of this module follows.

    Scale shape: broadcast hash join, zero shuffle added to the
    stream side; keep the dimension under the broadcast threshold
    (or pre-filter its columns) — a big dimension belongs in a
    keyed stream-stream join instead."""
    return events.join(F.broadcast(dim), on, how)


def late_data_report(
    df: DataFrame,
    ts_col: str,
    arrival_cols,
    horizon_seconds: int,
    key_cols: Sequence[str],
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-key late-data accounting, replayed on batch data: a row is
    "late" when its event time trails the running max event time seen
    so far (per ``key_cols``, in ``arrival_cols`` order) by more than
    ``horizon_seconds``. Returns per-``group_cols`` totals:
    ``(n_events, n_late, max_late_seconds)`` — the observability
    report you run BEFORE picking a production watermark.

    Contract: this is a LOWER BOUND on what a real
    ``withWatermark(horizon)`` stream would drop. Spark's watermark
    is GLOBAL — the max event time across ALL keys, advanced at
    micro-batch boundaries — so a quiet key's stragglers can be
    dropped by a busy key's progress, which a per-key running max
    cannot see. The per-key formulation is deliberate: it measures
    each key's OWN out-of-orderness (the input to choosing a
    horizon) and parallelizes, where a faithful global replay would
    serialize the scan on one arrival-ordered task.

    ``arrival_cols`` should pin a TOTAL order (end with a unique id)
    — ties in arrival order would otherwise make frame membership,
    and therefore the counts, partition-order-dependent. Lateness
    arithmetic is exact integer microseconds; one window shuffle on
    the key."""
    from pyspark.sql import Window

    from trisk_datawrangle_spark.operators.temporal import _epoch_micros

    if isinstance(arrival_cols, str):
        arrival_cols = [arrival_cols]
    # shared NTZ-safe epoch helper (operators/temporal.py) — the
    # Spark-4 TIMESTAMP_NTZ cast workaround lives in ONE place
    us = _epoch_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in arrival_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run_max = F.max(us).over(w)
    late_by = (run_max - us) / F.lit(1_000_000)
    flagged = df.select(
        *group_cols,
        (late_by > F.lit(float(horizon_seconds))).alias("__late"),
        late_by.alias("__late_by"),
    )
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("__late")).alias("n_late"),
        F.round(F.max(F.when(F.col("__late"), F.col("__late_by"))), 0)
        .cast("long")
        .alias("max_late_seconds"),
    )
