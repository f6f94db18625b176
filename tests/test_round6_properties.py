"""Property tests for the round-6 primitives: the PNG/JPEG header
parse round-trips arbitrary dimensions, fk_orphans agrees with a
brute-force Python model on arbitrary key data, and the grouped
partition predicate is equivalent to the naive tuple filter."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    w=st.integers(min_value=0, max_value=2**31 - 1),
    h=st.integers(min_value=0, max_value=2**31 - 1),
    tail=st.binary(max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_png_header_roundtrip(w, h, tail):
    from trisk_datawrangle_spark.llm.multimodal import (
        PNG_SIG,
        parse_image_dims,
    )

    png = (
        PNG_SIG
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"
        + tail
    )
    assert parse_image_dims(png) == (w, h, "png")


@given(
    w=st.integers(min_value=0, max_value=65535),
    h=st.integers(min_value=0, max_value=65535),
    pad=st.binary(min_size=0, max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_jpeg_sof_roundtrip(w, h, pad):
    """SOF0 after an arbitrary-length APP segment still parses; the
    parser walks segment lengths, not fixed offsets."""
    from trisk_datawrangle_spark.llm.multimodal import parse_image_dims

    app = b"\xff\xe1" + (2 + len(pad)).to_bytes(2, "big") + pad
    sof = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03"
        + b"\x00" * 9
    )
    assert parse_image_dims(b"\xff\xd8" + app + sof) == (w, h, "jpeg")


@given(
    child=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.sampled_from("abc")),
        ),
        max_size=25,
    ),
    parent=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from("abc")), max_size=10
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fk_orphans_matches_python_model(spark, child, parent):
    from trisk_datawrangle_spark.operators.quality import fk_orphans

    cdf = spark.createDataFrame(child, "k int, g string") if child else (
        spark.createDataFrame([], "k int, g string")
    )
    pdf = spark.createDataFrame(parent, "k int, g string") if parent else (
        spark.createDataFrame([], "k int, g string")
    )
    got = {
        (r.k, r.g): r.orphan_rows
        for r in fk_orphans(cdf, pdf, ["k", "g"]).collect()
    }
    pset = set(parent)
    model: dict = {}
    for t in child:
        if t[0] is None or t[1] is None:  # MATCH SIMPLE: NULL exempt
            continue
        if t not in pset:
            model[t] = model.get(t, 0) + 1
    assert got == model


@given(
    tuples=st.sets(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["1", "2", "3"])),
            st.one_of(st.none(), st.sampled_from(["x", "y"])),
        ),
        min_size=1,
        max_size=6,
    ),
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(1, 4)),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        ),
        min_size=1,
        max_size=20,
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_partition_filter_equals_naive_tuple_membership(
    spark, tuples, rows
):
    """The grouped-IN/balanced-or predicate selects exactly the rows
    whose string-normalized partition tuple is in the set — same
    contract as the naive per-tuple OR it replaced (incl. NULLs and
    typed numeric columns)."""
    from trisk_datawrangle_spark.sources.incremental import (
        _partition_filter,
    )

    df = spark.createDataFrame(rows, "a int, b string")
    flt = df.filter(_partition_filter(tuples, ["a", "b"], df.schema))
    got = {(r.a, r.b) for r in flt.collect()}
    want = {
        (a, b)
        for a, b in rows
        if (None if a is None else str(a), b) in tuples
    }
    assert got == want
