"""Property tests for round-7 numeric operators: EWMA lag chain vs a
reference fold, int8 quantization error bound, DSIR weight identity.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.decomposition import (
    scalar_quantize_roundtrip,
)
from trisk_datawrangle_spark.operators.mlprep import ewma_bounded

_series = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6,
        allow_nan=False, allow_infinity=False,
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(_series)
def test_ewma_matches_reference_fold(spark, xs):
    alpha, lags = 0.3, 16
    rows = [(i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i long, v double").withColumn(
        "g", F.lit(1)
    )
    out = {
        r.i: r.ewma
        for r in ewma_bounded(
            df, "v", ["i"], ["g"], alpha=alpha, lags=lags
        ).collect()
    }
    for t in range(len(xs)):
        ref = sum(
            alpha * (1 - alpha) ** j * xs[t - j]
            for j in range(min(lags, t + 1))
        )
        assert abs(out[t] - ref) <= 1e-6 * max(1.0, abs(ref)), t


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
                width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=20,
    )
)
def test_sq8_error_bound(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = scalar_quantize_roundtrip(df, bits=8).collect()
    # per-dim reconstruction error <= half a quantization step
    spans = [
        max(v[d] for v in vecs) - min(v[d] for v in vecs)
        for d in range(4)
    ]
    for r in out:
        orig = vecs[r.vec_id]
        for d in range(4):
            step = (spans[d] if spans[d] > 0 else 1.0) / 255.0
            assert abs(r.sq[d] - orig[d]) <= step / 2 + 1e-6, (
                r.vec_id, d, r.sq[d], orig[d], step,
            )


def test_dsir_identical_docs_identical_weights(spark):
    from trisk_datawrangle_spark.llm.sampling import dsir_importance_weights

    rows = [(i, "alpha beta gamma delta", "t" if i < 3 else "r")
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_importance_weights(
        df, F.col("source") == "t", buckets=32
    ).collect()
    ws = {r.logweight for r in out}
    assert len(ws) == 1  # identical text => identical weight, any source


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=4, max_size=14),
    st.integers(min_value=0, max_value=1000),
)
def test_verify_row_and_array_forms_agree(spark, sizes, seed):
    """Both exact-verification strategies must produce identical
    pairs on arbitrary corpora (clones, shared prefixes, disjoint
    docs) and arbitrary candidate sets."""
    import random

    from trisk_datawrangle_spark.llm.dedup import (
        _verify_candidates,
        _verify_candidates_arrays,
        shingle_hashes,
    )

    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(6 + n)))
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_hashes(df, "text", "doc_id", 3, distinct=True).cache()
    ids = [r[0] for r in rows]
    cand_rows = [
        (a, b) for a in ids for b in ids if a < b and rng.random() < 0.6
    ]
    if not cand_rows:
        cand_rows = [(ids[0], ids[-1])]
    cand = spark.createDataFrame(cand_rows, "id_a long, id_b long")
    for t in (0.1, 0.5, 0.9):
        rowf = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in _verify_candidates(sh, cand, t).collect()
        }
        arrf = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in _verify_candidates_arrays(sh, cand, t).collect()
        }
        assert rowf == arrf, (t, rowf ^ arrf)
    sh.unpersist()


def test_psi_detects_shift_and_null_case(spark):
    from trisk_datawrangle_spark.operators.quality import psi_drift

    a = spark.range(0, 4000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    same = spark.range(0, 4000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    shifted = spark.range(0, 4000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("v")
    )
    edges = [20.0, 40.0, 60.0, 80.0, 100.0, 120.0]
    psi_same = psi_drift(a, same, "v", edges).select("psi").first().psi
    psi_shift = psi_drift(a, shifted, "v", edges).select("psi").first().psi
    assert abs(psi_same) < 1e-6
    assert psi_shift > 0.25  # the standard 'shifted' threshold


def test_schema_drift_report(spark):
    from trisk_datawrangle_spark.operators.quality import (
        schema_drift_report,
    )

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, None, 2.0)], "id long, s string, v double"
    )
    b = spark.createDataFrame(
        [(1, 5, True), (2, 6, None)], "id long, v int, flag boolean"
    )
    rep = {r.column: r for r in schema_drift_report(a, b).collect()}
    assert rep["s"].status == "dropped"
    assert rep["flag"].status == "added"
    assert rep["v"].status == "retyped"
    assert rep["id"].status == "unchanged"
    assert rep["s"].null_rate_a == 0.5 and rep["s"].null_rate_b is None
    assert rep["flag"].null_rate_b == 0.5
