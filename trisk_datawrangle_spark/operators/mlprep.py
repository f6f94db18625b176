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
  (exact DECIMAL — Spark decimal sums and DuckDB's int128 sums are
  both exact and order-independent), then derives mean/variance in
  ONE fixed double expression. No float is ever summed across rows,
  so the scores are bit-identical on any partitioning — the
  money-column exact-cents trick (SURVEY §7.4) extended to second
  moments.

NULL/NaN policy (uniform across the module): missing values are
never fabricated into numbers — a NULL or NaN input value yields a
NULL feature (bin / zscore / clipped; an unguarded
``round(NaN*100).cast(long)`` would score NaN as $0.00 non-ANSI and
crash with CAST_OVERFLOW under ANSI), and aggregate denominators
count only the rows that contributed to the numerator. NULL GROUP KEYS form their
own group (joins are null-safe), so dirty rows are standardized
against each other instead of silently vanishing from the output.

Scale shape: one shuffle each (the window partition / the group
aggregate); the per-group moments frame is group-cardinality-sized
and broadcasts back onto the fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _present(value_col: str):
    """The value as double where it is an actual number; NULL for
    NULL and NaN (both mean "missing" here)."""
    v = F.col(value_col).cast("double")
    return F.when(v.isNotNull() & ~F.isnan(v), v)


def _cents(value_col: str):
    """Exact integer cents, NULL for NULL/NaN inputs."""
    return F.round(_present(value_col) * 100).cast("long")


def _null_safe_join(left: DataFrame, right: DataFrame, keys) -> DataFrame:
    """Inner join matching NULL keys to NULL keys (a plain equi-join
    evaluates NULL = NULL as NULL and silently drops every row whose
    group key is missing). Drops the right side's key columns."""
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    out = left.join(right, cond)
    for k in keys:
        out = out.drop(right[k])
    return out


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

    Rows with a NULL value are excluded from the NTILE frame and get
    a NULL bin — otherwise Spark's nulls-first sort would dump every
    missing value into bin 1 (and DuckDB's nulls-last would dump them
    into bin n: a silent cross-engine divergence on dirty data).

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
    v = F.col(value_col).cast("double")
    present = v.isNotNull() & ~F.isnan(v)
    binned = df.filter(present).withColumn(
        out_col, F.ntile(n_bins).over(w)
    )
    missing = df.filter(~F.coalesce(present, F.lit(False))).withColumn(
        out_col, F.lit(None).cast("int")
    )
    return binned.unionByName(missing)


def group_zscore(
    df: DataFrame,
    value_col: str,
    group_cols,
    id_col: str,
    round_to: int = 6,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group standardization from exact moments: values are fixed
    to integer cents; the group's n (non-null rows), Σc (BIGINT), min
    and Σc² (DECIMAL) are aggregated order-independently; and
    ``z = (c - mean) / stddev_pop`` is one deterministic double
    expression over those exact integers. Groups with zero variance
    (or a single contributing row) and rows with NULL values get a
    NULL score.

    Cancellation guard: the variance is computed from MIN-SHIFTED
    moments — ``Σd, Σd²`` for ``d = c - min(c)`` derived exactly in
    decimal arithmetic from the raw sums — so the double subtraction
    cancels against the group's SPREAD, not its magnitude (naive
    ``E[c²] - mean²`` loses all precision for large-mean,
    small-variance groups: cents ~1e9 squared already exhausts a
    double's 2⁻⁵² resolution).

    Returns ``(id_col, *group_cols, out_col)``."""
    cents = _cents(value_col)
    stats = (
        df.select(*group_cols, cents.alias("__c"))
        .groupBy(*group_cols)
        .agg(
            F.count("__c").alias("__n"),  # rows that contribute
            F.sum("__c").alias("__s"),
            F.min("__c").alias("__m"),
            F.sum(
                (F.col("__c").cast("decimal(20,0)") * F.col("__c"))
            ).alias("__q"),
        )
    )
    joined = _null_safe_join(
        df.select(id_col, *group_cols, cents.alias("__c")),
        F.broadcast(stats),
        list(group_cols),
    )
    n_l = F.col("__n")
    n = n_l.cast("double")
    md = F.col("__m").cast("decimal(20,0)")
    sd_dec = F.col("__s").cast("decimal(20,0)") - md * n_l
    sq_dec = (
        F.col("__q")
        - F.lit(2).cast("decimal(20,0)") * md * F.col("__s")
        + md * md * n_l
    )
    mean_d = sd_dec.cast("double") / n
    var = sq_dec.cast("double") / n - mean_d * mean_d
    z = (
        (F.col("__c") - F.col("__m")).cast("double") - mean_d
    ) / F.sqrt(var)
    return joined.select(
        id_col,
        *group_cols,
        F.when(
            (n_l > 1) & (var > 0), F.round(z, round_to)
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

    ``{prefix}_n`` counts the CONTRIBUTING (non-null) values in the
    frame — the same denominator the mean uses — so a window of all
    NULLs reports n=0 and NULL sum/mean instead of a deflated mean.

    Adds ``{prefix}_n``, ``{prefix}_sum``, ``{prefix}_mean``.
    Scale shape: one shuffle (the window partition); state per task
    is the ``window_rows`` frame, constant memory."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    cents = _cents(value_col)
    n = F.count(cents).over(w)
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
    clipped values are oracle-checkable. A NULL value stays NULL —
    Spark's null-skipping ``greatest/least`` would otherwise
    fabricate the lower bound for missing data.

    Scale shape: one group aggregate (exact percentile is a
    single-pass partial aggregate) broadcast back onto the scan —
    no extra fact shuffle. For 100 TB rollups where 0.1% rank error
    is fine, swap the bounds to ``percentile_approx`` (the a13
    sketch path) — same plan shape, bounded memory."""
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(_present(value_col), F.lit(lower_q)).alias("__lo"),
        F.percentile(_present(value_col), F.lit(upper_q)).alias("__hi"),
    )
    joined = _null_safe_join(
        df.select(id_col, *group_cols, _present(value_col).alias("__v")),
        F.broadcast(bounds),
        list(group_cols),
    )
    return joined.select(
        id_col,
        *group_cols,
        F.when(
            F.col("__v").isNotNull(),
            F.round(
                F.least(
                    F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi")
                ),
                round_to,
            ),
        ).alias(out_col),
    )


def ewma_bounded(
    df: DataFrame,
    value_col: str,
    order_cols,
    partition_cols,
    alpha: float = 0.3,
    lags: int = 16,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average with a bounded lookback:
    ``ewma_t = Σ_{j=0}^{lags-1} α(1−α)^j · x_{t−j}`` (missing lags
    contribute 0 — the head of each series warms up, the standard
    truncated-EWMA convention).

    Why bounded + explicit: the textbook recursive form needs
    sequential per-row state (no parallel window evaluates it), and
    an unbounded weight trick ``(1−α)^{−i}`` overflows. A FIXED lag
    chain is one window per partition key (keyed shuffle only), whole
    -stage codegen, and — because the weighted terms are summed in a
    fixed expression order with literal coefficients — bit-exact
    across engines and partitionings, so it can be oracle-gated
    without float tolerance. Truncation error is bounded by
    ``(1−α)^lags`` (0.7¹⁶ ≈ 0.3%% of a stationary signal)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    terms = None
    for j in range(lags):
        coef = alpha * (1.0 - alpha) ** j
        t = F.coalesce(F.lag(value_col, j).over(w), F.lit(0.0)) * F.lit(coef)
        terms = t if terms is None else terms + t
    return df.withColumn(out_col, terms)
