"""Decomposition stack: the Arrow-batch gramian must agree with the
relational (oracle-gated) covariance, and PCA must behave like PCA —
orthonormal components, descending explained variance, projection
matching numpy done locally on the collected data.
"""

from __future__ import annotations

import numpy as np

from trisk_datawrangle_spark.llm.decomposition import (
    embedding_covariance,
    gramian_map_reduce,
    pca_components,
    pca_project,
)
from trisk_datawrangle_spark.sources.readers import load_tables


def _embs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def test_gramian_matches_relational_covariance(spark, sf_dir):
    df = _embs(spark, sf_dir)
    rel = {
        (r.i, r.j): r.cov for r in embedding_covariance(df).collect()
    }
    n, mean, cov = gramian_map_reduce(df)
    assert n == df.count()
    d = cov.shape[0]
    for (i, j), v in rel.items():
        # quantized-exact vs float gramian: agree to the product
        # quantum (1e-8) scaled by n
        assert abs(cov[i - 1, j - 1] - v) < 1e-6, (i, j)
    assert len(rel) == d * (d + 1) // 2


def test_gramian_partition_invariant(spark, sf_dir):
    df = _embs(spark, sf_dir)
    _, m1, c1 = gramian_map_reduce(df.repartition(1))
    _, m8, c8 = gramian_map_reduce(df.repartition(8, "vec_id"))
    assert np.allclose(m1, m8, atol=1e-12)
    assert np.allclose(c1, c8, atol=1e-12)


def test_pca_components_properties(spark, sf_dir):
    df = _embs(spark, sf_dir)
    mean, comps, ev = pca_components(df, k=8)
    # orthonormal rows
    assert np.allclose(np.dot(comps, comps.T), np.eye(8), atol=1e-9)
    # descending explained variance, all non-negative
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert ev[-1] >= -1e-9
    # agrees with numpy PCA on the collected matrix (sign-fixed)
    X = np.stack([r.embedding for r in df.collect()]).astype(np.float64)
    covL = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(covL)
    order = np.argsort(vals)[::-1][:8]
    ref = vecs[:, order].T
    for r in range(8):
        m = np.argmax(np.abs(ref[r]))
        if ref[r, m] < 0:
            ref[r] = -ref[r]
    assert np.allclose(np.abs(np.sum(comps * ref, axis=1)), 1.0, atol=1e-6)


def test_pca_project_variance_concentrates(spark, sf_dir):
    df = _embs(spark, sf_dir)
    out = pca_project(df, k=4).select("vec_id", "pca").collect()
    P = np.stack([r.pca for r in out])
    assert P.shape[1] == 4
    var = P.var(axis=0, ddof=1)
    # projected variances are the top eigenvalues, in order
    _, _, ev = pca_components(df, k=4)
    assert np.allclose(var, ev, rtol=1e-6)
    # projection is centered
    assert np.allclose(P.mean(axis=0), 0.0, atol=1e-9)
