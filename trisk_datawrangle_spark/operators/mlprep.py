"""Feature-preparation operators for training pipelines: quantile
binning (ntile bucketing with a pinned tiebreak) and per-group
standardization (z-scores) computed from EXACT integer/decimal
moments.

Both are the classic preprocessing steps (discretize a skewed
numeric, standardize within a group) re-expressed so the result is a
pure function of the data:

- ``quantile_bins`` pins the NTILE order with the id column, so rows
  tied on the value land in the same bucket on every run/engine;
- ``group_zscore`` aggregates cents (exact BIGINT) and squared cents
  (exact DECIMAL(38) — Spark decimal sums and DuckDB's int128 sums
  are both exact and order-independent), then derives mean/variance
  in ONE fixed double expression. No float is ever summed across
  rows, so the scores are bit-identical on any partitioning — the
  money-column exact-cents trick (SURVEY §7.4) extended to second
  moments.

Scale shape: one shuffle each (the window partition / the group
aggregate); the per-group moments frame is group-cardinality-sized
and broadcasts back onto the fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    group_cols=None,
    id_col: str | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency (quantile) bucketing: ``NTILE(n_bins)`` over
    the value within each group. ``id_col`` (strongly recommended)
    breaks value ties deterministically — without it NTILE's bucket
    boundary among tied rows depends on partition order.

    Scale shape: one shuffle on the group key. WITHOUT ``group_cols``
    the window is unpartitioned — Spark moves the ENTIRE dataset to a
    single task (it warns "No Partition Defined for Window
    operation"); that is fine for small frames but a single-executor
    sort at corpus scale — for a global equal-frequency binning at
    scale, bin against exact/approx percentile BOUNDS instead (the
    :func:`winsorize` aggregate shape: tiny bounds frame broadcast
    back, no global sort)."""
    order = [F.col(value_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy(*order)
    return df.withColumn(out_col, F.ntile(n_bins).over(w))


def group_zscore(
    df: DataFrame,
    value_col: str,
    group_cols,
    id_col: str,
    round_to: int = 6,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group standardization from exact moments: values are fixed
    to integer cents, the group's Σc (BIGINT-exact) and Σc²
    (DECIMAL(38)-exact) are aggregated order-independently, and
    ``z = (c - mean) / stddev_pop`` is one deterministic double
    expression over those exact integers. Groups with zero variance
    (or a single row) get NULL.

    Returns ``(id_col, *group_cols, out_col)``."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    stats = (
        df.select(*group_cols, cents.alias("__c"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__c").alias("__s"),
            F.sum(
                (F.col("__c").cast("decimal(38,0)") * F.col("__c"))
            ).alias("__q"),
        )
    )
    joined = df.select(id_col, *group_cols, cents.alias("__c")).join(
        F.broadcast(stats), list(group_cols)
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    var = F.col("__q").cast("double") / n - mean * mean
    z = (F.col("__c").cast("double") - mean) / F.sqrt(var)
    return joined.select(
        id_col,
        *group_cols,
        F.when(
            (F.col("__n") > 1) & (var > 0), F.round(z, round_to)
        ).alias(out_col),
    )


def rolling_stats(
    df: DataFrame,
    value_col: str,
    key_cols,
    order_cols,
    window_rows: int = 3,
    out_prefix: str = "roll",
) -> DataFrame:
    """Trailing-window feature engineering: per key, the rolling
    count / sum / mean of the last ``window_rows`` rows (current
    included) in ``order_cols`` order — the classic "user's recent
    activity" feature. The frame is ROWS-based with a pinned total
    order (pass an id as the last order col), so membership is
    deterministic; sums ride exact integer cents and the mean is the
    exactly-rounded quotient — no float aggregation.

    Adds ``{prefix}_n``, ``{prefix}_sum``, ``{prefix}_mean``.
    Scale shape: one shuffle (the window partition); state per task
    is the ``window_rows`` frame, constant memory."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(cents).over(w)
    return (
        df.withColumn(f"{out_prefix}_n", n)
        .withColumn(
            f"{out_prefix}_sum", (s.cast("double") / F.lit(100.0))
        )
        .withColumn(
            f"{out_prefix}_mean",
            F.round(
                s.cast("double") / n.cast("double") / F.lit(100.0), 6
            ),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols,
    id_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    round_to: int = 6,
    out_col: str = "clipped",
) -> DataFrame:
    """Per-group winsorization: clip the value into its group's
    [lower_q, upper_q] exact-percentile band — the standard
    outlier-taming step before scaling/regression. Exact
    (interpolating) percentiles match DuckDB's ``quantile_cont``
    bit-for-bit on the same doubles (the a4 parity contract), so the
    clipped values are oracle-checkable.

    Scale shape: one group aggregate (exact percentile is a
    single-pass partial aggregate) broadcast back onto the scan —
    no extra fact shuffle. For 100 TB rollups where 0.1% rank error
    is fine, swap the bounds to ``percentile_approx`` (the a13
    sketch path) — same plan shape, bounded memory."""
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(lower_q)).alias("__lo"),
        F.percentile(value_col, F.lit(upper_q)).alias("__hi"),
    )
    return (
        df.select(id_col, *group_cols, F.col(value_col).alias("__v"))
        .join(F.broadcast(bounds), list(group_cols))
        .select(
            id_col,
            *group_cols,
            F.round(
                F.least(F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi")),
                round_to,
            ).alias(out_col),
        )
    )
