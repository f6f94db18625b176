"""Aggregate expression helpers (SURVEY.md §2.4).

Every helper is a native Catalyst aggregate (partial/map-side combine
happens automatically) — no UDAFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def median(col: str | Column) -> Column:
    """Exact median (A4) — all financial-indicator averaging in the
    reference is median-based
    (prepare_prewrangled_financial_data_stress_test.R:73-76).

    Uses the *exact* ``percentile`` (interpolating, matches R
    ``stats::median`` for both odd and even n), not
    ``percentile_approx``: oracle parity beats the sketch's speed here,
    and Spark's exact percentile is still a single-pass partial
    aggregate. For 100 TB rollups where a 0.1% error is fine, swap in
    ``F.percentile_approx(col, 0.5, 10000)``.
    """
    return F.percentile(_c(col), 0.5)


def median_approx(col: str | Column, accuracy: int = 10000) -> Column:
    """Scale-path median: the t-digest-style ``percentile_approx``
    sketch — mergeable partial aggregates with bounded memory per
    group, where the exact percentile keeps every group's values.

    Rank error ≤ n/``accuracy`` per group (≤0.01% at the default), at
    a fixed sketch size regardless of group cardinality. Use for
    100 TB rollups; keep :func:`median` where oracle/bit parity
    matters. Property-tested to land between the exact 49th and 51st
    percentiles (tests/test_aggregate_properties.py)."""
    return F.percentile_approx(_c(col), 0.5, F.lit(accuracy))


def sum_or_null(col: str | Column) -> Column:
    """``.sum_or_all_nans`` (A2, prepare_abcd_stress_test_input.R:8-14):
    sum ignoring NULLs, but NULL (not 0) when every input is NULL.

    This is exactly Spark's native ``sum`` — R needed a workaround
    because ``sum(x, na.rm=TRUE)`` over all-NA returns 0; SQL doesn't.
    Kept as a named wrapper so call sites document the contract.
    """
    return F.sum(_c(col))


def arg_min(value: str | Column, order: str | Column) -> Column:
    """Value at the minimum of ``order`` (A11-adjacent; grouped-first
    semantics with an explicit order key, SURVEY.md §7.4)."""
    return F.min_by(_c(value), _c(order))


def arg_max(value: str | Column, order: str | Column) -> Column:
    return F.max_by(_c(value), _c(order))


def bool_any(cond: Column) -> Column:
    """``any(cond)`` per group (A9) as a 0-row-safe aggregate."""
    return F.coalesce(F.max(F.when(cond, True).otherwise(False)), F.lit(False))


def bool_all(cond: Column) -> Column:
    return F.coalesce(F.min(F.when(cond, True).otherwise(False)), F.lit(True))


def collect_sorted_csv(col: str | Column, sep: str = ",") -> Column:
    """Deterministic ``collect_list`` → string (A10,
    rename_geographies.R:55-57 + run_workflow.R:171-174): collect,
    sort, concat. Sorting makes the result order-independent — plain
    ``collect_list`` order is a partitioning artifact and must never
    leak into output (SURVEY.md §7.4)."""
    return F.concat_ws(sep, F.sort_array(F.collect_list(_c(col))))
