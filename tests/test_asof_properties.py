"""Hypothesis property test: ``join_asof`` against pandas
``merge_asof`` — an independent third implementation of backward
as-of semantics — on randomized keyed event sets. One Spark job per
example is too slow, so each example is a single multi-key frame and
one Spark round-trip checks every key at once."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trisk_datawrangle_spark.operators.temporal import join_asof

# per key: left timestamps (ints as epoch seconds) and right
# (timestamp, value) observations — duplicates across sides allowed,
# duplicate right timestamps excluded (tie choice is implementation-
# defined in pandas; our contract pins it, pandas' doesn't)
key_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=8),
    st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=8,
             unique=True),
)


def _pd_asof(left_ts, right_obs, tolerance):
    """pandas merge_asof on one key's rows."""
    lt = pd.DataFrame({"ts": sorted(left_ts)})
    rt = pd.DataFrame(
        {
            "ts": pd.array([t for t, _ in right_obs], dtype="int64"),
            "v": pd.array([v for _, v in right_obs], dtype="float64"),
        }
    ).sort_values("ts")
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(lt, rt, on="ts", direction="backward", **kw)
    return dict(zip(m["ts"], m["v"]))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.dictionaries(st.integers(0, 6), key_strategy, min_size=1, max_size=5))
def test_join_asof_matches_pandas_merge_asof(spark, keyed):
    left_rows, right_rows = [], []
    for k, (lts, rts) in keyed.items():
        left_rows += [(k, t) for t in lts]
        right_rows += [(k, t, float(k * 1000 + t)) for t in rts]
    left = spark.createDataFrame(left_rows, "k long, ts long")
    right = (
        spark.createDataFrame(right_rows, "k long, ts long, v double")
        if right_rows
        else spark.createDataFrame([], "k long, ts long, v double")
    )
    for tolerance in (None, 50):
        got = {
            (r.k, r.ts): r.v_asof
            for r in join_asof(
                left, right, on=["k"], right_cols=["v"],
                tolerance_seconds=tolerance,
            ).collect()
        }
        # every left row appears exactly once (left-join cardinality,
        # even with duplicate left timestamps — they collapse to the
        # same (k, ts) result key)
        assert set(got) == {(k, t) for k, t, in left_rows}
        for k, (lts, rts) in keyed.items():
            expected = _pd_asof(lts, [(t, float(k * 1000 + t)) for t in rts], tolerance)
            for t, v in expected.items():
                g = got[(k, t)]
                if pd.isna(v):
                    assert g is None, (k, t, g)
                else:
                    assert g == v, (k, t, g, v)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(  # points: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=30,
    ),
    st.lists(  # intervals: (key, start, length>=0)
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 120)),
        min_size=0, max_size=15,
    ),
    st.sampled_from([7, 60, 200]),  # bucket width in seconds
)
def test_interval_join_matches_naive_definition(spark, points, spans, bucket):
    """The bucketed equi-join must equal the BETWEEN definition for
    any bucket grain — including intervals far longer or shorter than
    the bucket, zero-length intervals, and boundary-exact points."""
    from trisk_datawrangle_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)],
        "pid long, k long, ts long",
    )
    ivs = spark.createDataFrame(
        [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(spans)]
        or [(0, -1, 0, 0)],  # sentinel key no point uses, when empty
        "iid long, k long, start long, end long",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pts, ivs, on=["k"], ts_col="ts", start_col="start",
            end_col="end", bucket_seconds=bucket,
        ).collect()
    }
    expected = {
        (pi, ii)
        for pi, (pk, pt) in enumerate(points)
        for ii, (ik, s, ln) in enumerate(spans)
        if pk == ik and s <= pt <= s + ln
    }
    assert got == expected


def _pd_asof_dir(left_ts, right_obs, tolerance, direction):
    lt = pd.DataFrame({"ts": sorted(left_ts)})
    rt = pd.DataFrame(
        {
            "ts": pd.array([t for t, _ in right_obs], dtype="int64"),
            "v": pd.array([v for _, v in right_obs], dtype="float64"),
        }
    ).sort_values("ts")
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(lt, rt, on="ts", direction=direction, **kw)
    return dict(zip(m["ts"], m["v"]))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(st.integers(0, 6), key_strategy, min_size=1, max_size=4),
    st.sampled_from(["forward", "nearest"]),
    st.sampled_from([None, 50]),
)
def test_join_asof_directions_match_pandas(spark, keyed, direction, tolerance):
    """forward/nearest against pandas merge_asof (both pin the same
    tie rule: equidistant nearest matches resolve backward)."""
    left_rows, right_rows = [], []
    for k, (lts, rts) in keyed.items():
        left_rows += [(k, t) for t in lts]
        right_rows += [(k, t, float(k * 1000 + t)) for t in rts]
    left = spark.createDataFrame(left_rows, "k long, ts long")
    right = (
        spark.createDataFrame(right_rows, "k long, ts long, v double")
        if right_rows
        else spark.createDataFrame([], "k long, ts long, v double")
    )
    got = {
        (r.k, r.ts): r.v_asof
        for r in join_asof(
            left, right, on=["k"], right_cols=["v"],
            tolerance_seconds=tolerance, direction=direction,
        ).collect()
    }
    assert set(got) == {(k, t) for k, t in left_rows}
    for k, (lts, rts) in keyed.items():
        expected = _pd_asof_dir(
            lts, [(t, float(k * 1000 + t)) for t in rts], tolerance, direction
        )
        for t, v in expected.items():
            g = got[(k, t)]
            if pd.isna(v):
                assert g is None, (direction, k, t, g)
            else:
                assert g == v, (direction, k, t, g, v)
