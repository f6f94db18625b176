"""Scalar expression helpers (SURVEY.md §2.8).

All helpers return Catalyst ``Column`` expressions — they stay inside
whole-stage codegen and never drop to Python per-row execution.
"""

from __future__ import annotations

import operator
from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def recode(col: str | Column, mapping: Mapping, default=None) -> Column:
    """``case_when``-style value recode (F1) — the reference's single
    most common operation (~25 blocks, e.g. scenario/technology
    renames at prepare_scenario_data.R:440-485).

    ``default=None`` keeps the original value (dplyr
    ``.default = col``); pass ``F.lit(x)`` / a Column for a constant.
    """
    c = _c(col)
    expr = None
    for old, new in mapping.items():
        branch = F.when(c == F.lit(old), F.lit(new))
        expr = branch if expr is None else expr.when(c == F.lit(old), F.lit(new))
    if expr is None:
        return c
    if default is None:
        return expr.otherwise(c)
    return expr.otherwise(default if isinstance(default, Column) else F.lit(default))


def safe_div(num: str | Column, den: str | Column, on_zero=None) -> Column:
    """Division with an explicit zero-denominator policy (F14).

    R yields ``Inf``/``NaN`` on x/0 and 0/0; Spark yields NULL. The
    reference's capacity-factor clamps
    (prepare_prewrangled_capacity_factors.R:473-488) are re-expressed
    here as an explicit predicate so the semantics are engine-
    independent: when ``den == 0`` (or NULL) return ``on_zero``
    (default NULL), else ``num / den``.
    """
    n, d = _c(num), _c(den)
    zero = F.lit(None) if on_zero is None else (
        on_zero if isinstance(on_zero, Column) else F.lit(on_zero)
    )
    return F.when(d.isNull() | (d == 0), zero).otherwise(n / d)


def replace_na(col: str | Column, value) -> Column:
    """``tidyr::replace_na`` (F11) as an expression (df.fillna needs
    whole-frame scope; this composes per-column)."""
    c = _c(col)
    return F.coalesce(c, value if isinstance(value, Column) else F.lit(value))


def unite(sep: str, *cols: str | Column) -> Column:
    """``tidyr::unite`` (R4): join columns into one string key, e.g.
    ``scenario = paste(model, scenario, sep="_")``
    (prepare_scenario_data.R:501)."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def any_null(cols: Sequence[str | Column]) -> Column:
    """``filter_all(any_vars(is.na(.)))`` predicate (P6,
    prepare_scenario_data.R:238)."""
    return reduce(operator.or_, [_c(c).isNull() for c in cols])


def all_null(cols: Sequence[str | Column]) -> Column:
    return reduce(operator.and_, [_c(c).isNull() for c in cols])


def row_sum(cols: Sequence[str | Column]) -> Column:
    """Row-wise across-column sum (F13,
    prepare_prewrangled_financial_data_stress_test.R:492-495)."""
    return reduce(operator.add, [_c(c) for c in cols])


def exact_cents_sum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent exact sum of a fixed-point-ish double column.

    Doubles sum non-associatively, so a distributed sum differs in the
    last ulps between partitionings (and between engines). For money
    columns with ``scale`` decimal digits, summing
    ``round(x * 10^scale)`` as BIGINT is exact and associative; divide
    back at the end. Used wherever the engine must be bit-reproducible
    across cluster sizes (and against the DuckDB oracle).
    """
    mult = 10 ** scale
    return (
        F.sum(F.round(_c(col) * mult).cast("long")) / F.lit(float(mult))
    )


class UNIT:
    """Unit-conversion constants used by the reference's price/capacity
    pipelines (F10, prepare_price_data_long.R:38-52,297-299,709-717;
    prepare_prewrangled_capacity_factors.R:100-103,566-569)."""

    BARREL_TO_GJ = 0.16
    MBTU_TO_GJ = 0.9478171203
    USD_MWH_TO_USD_GJ = 1.0 / 3.6
    TWH_TO_GW_YEAR = 1000.0 / (24 * 365)
    TWH_TO_GW_LEAP = 1000.0 / (24 * 365.25)
    EJ_TO_GW = 31.68808781
    # GJ per tonne of coal, derived from the reference's own chain:
    # 1 MWh = 0.122835 tonne (prepare_price_data_long.R:706) and
    # 1 MWh = 3.6 GJ → 1 tonne = 3.6/0.122835 ≈ 29.307 GJ
    COAL_TONNE_TO_GJ = 3.6 / 0.122835
    GAS_MBTU_FACTOR = 1.0 / 0.03414368
