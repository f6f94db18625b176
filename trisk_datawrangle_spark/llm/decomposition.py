"""Embedding decomposition: distributed covariance/gramian and PCA
projection — the dimensionality-reduction step in front of ANN
indexes and SemDeDup-style clustering (project 1024-d model
embeddings to 64-d before IVF training, whiten before cosine).

Scale shape (the part that matters at 100 TB): the only distributed
work is accumulating the d×d gramian — a fixed-size, map-side-
combinable reduction (``mapInPandas`` partial ``Xᵀ X`` per Arrow
batch, then one global sum over d² keys). Eigendecomposition happens
on the DRIVER over the d×d matrix (d ≤ a few thousand — KBs to MBs,
never data-sized), and the projection back out is a broadcast
matmul. No iterative distributed passes, no collect of row data —
the same two-tier split as ``llm/clustering.py`` (cluster-scale
reduce, driver-scale linear algebra).

Two gramian implementations, one contract:

- :func:`embedding_covariance` — relational posexplode/self-join
  form; exact, oracle-expressible in ANSI SQL (the catalog gate).
- :func:`gramian_map_reduce` — Arrow-batched ``np.dot`` partial
  sums; the throughput path (d² floats per PARTITION instead of d²
  rows per INPUT ROW). Property-tested equal to the relational form
  (float tolerance — summation order differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dims(df: DataFrame, vec_col: str) -> DataFrame:
    """(id-cols…, i, x) positional long form of an array column —
    1-based dimension index to match SQL ``generate_series``."""
    return df.select(
        "*", F.posexplode(vec_col).alias("__p", "x")
    ).withColumn("i", F.col("__p") + 1).drop("__p", vec_col)


#: quantization scales for the order-independent covariance: raw
#: values and pairwise products round to these units before the
#: integer sums (the v1_label_centroids idiom — exact BIGINT
#: aggregation, so the result is a pure function of the SET of rows,
#: not the summation order; the oracle reproduces it bit-exactly).
_MEAN_SCALE = 1_000_000.0
_PROD_SCALE = 100_000_000.0


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Sample covariance of an ``array<float>`` column as a long
    (i, j, cov) table for the upper triangle ``i ≤ j``:
    ``cov_ij = (Σ x_i·x_j − Σx_i·Σx_j / n) / (n − 1)``.

    Order-independent by construction: per-row values and products
    quantize to integer units (1e-6 / 1e-8) before the sums, so every
    aggregate is an exact BIGINT and the double math that follows
    operates on identical operands in any engine or partitioning —
    the correctness-gate form. Relational shape: one posexplode, a
    self-join keyed by row id (d²/2 pair rows per input row — fine at
    probe scale; use :func:`gramian_map_reduce` when d² per row is
    real money and float-tail nondeterminism is acceptable)."""
    dims = _dims(df.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("__id"), "i", F.col("x").cast("double").alias("x")
    )
    a = dims.select("__id", F.col("i").alias("i"), F.col("x").alias("xa"))
    b = dims.select("__id", F.col("i").alias("j"), F.col("x").alias("xb"))
    prods = (
        a.join(b, "__id")
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.round(F.col("xa") * F.col("xb") * _PROD_SCALE, 0)
                .cast("long")
            ).alias("sxy_q"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    means = dims.groupBy("i").agg(
        F.sum(F.round(F.col("x") * _MEAN_SCALE, 0).cast("long")).alias("sx_q")
    )
    ma = means.select(F.col("i").alias("i"), F.col("sx_q").alias("sxa_q"))
    mb = means.select(F.col("i").alias("j"), F.col("sx_q").alias("sxb_q"))
    cov = (
        F.col("sxy_q") / F.lit(_PROD_SCALE)
        - (F.col("sxa_q") / F.lit(_MEAN_SCALE))
        * (F.col("sxb_q") / F.lit(_MEAN_SCALE))
        / F.col("n")
    ) / (F.col("n") - 1)
    return (
        prods.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select("i", "j", cov.alias("cov"))
    )


def gramian_map_reduce(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple:
    """(n, mean vector, covariance matrix) via Arrow-batched partial
    sums — the 100 TB gramian: each batch contributes
    ``(count, Σx, XᵀX)`` (d + d² floats, independent of batch rows),
    partials are summed per partition and the d²-sized final reduce
    lands on the driver. Returns numpy objects (driver-scale)."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "sx": [X.sum(axis=0).tolist()],
                    "sxx": [np.dot(X.T, X).ravel().tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partials, "n long, sx array<double>, sxx array<double>"
    ).collect()
    n = sum(p.n for p in parts)
    sx = np.sum([np.asarray(p.sx) for p in parts], axis=0)
    sxx = np.sum([np.asarray(p.sxx) for p in parts], axis=0)
    d = sx.shape[0]
    mean = sx / n
    cov = (sxx.reshape(d, d) - np.outer(sx, sx) / n) / (n - 1)
    return n, mean, cov


def pca_components(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple:
    """Top-``k`` principal components: distributed gramian →
    driver-side ``eigh`` on the d×d covariance. Deterministic sign
    convention: each component's largest-|entry| coordinate is made
    positive (eigh's sign is otherwise arbitrary). Returns
    (mean, components[k, d], explained_variance[k])."""
    import numpy as np

    _, mean, cov = gramian_map_reduce(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return mean, comps, vals[order]


def scalar_quantize_stats(df: DataFrame, vec_col: str = "embedding"):
    """Per-dimension (min, max) over an array<float> column — the
    scalar-quantization codebook. One posexplode + d-row aggregate
    (map-side combinable); the collected result is d pairs (KBs)."""
    dims = _dims(df.select(vec_col), vec_col)
    rows = (
        dims.groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("i")
        .collect()
    )
    return (
        [float(r.lo) for r in rows],
        [float(r.hi) for r in rows],
    )


def scalar_quantize_roundtrip(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "sq",
    bits: int = 8,
    stats=None,
) -> DataFrame:
    """Append the int-``bits`` scalar-quantized-then-dequantized
    reconstruction of ``vec_col`` — the vector a serving tier that
    stores int8 codes actually scores with (4× smaller than float32,
    16× smaller than float64; per-dim affine codec
    ``code = round((x−lo)/(hi−lo)·(2^bits−1))``). Deterministic: the
    codebook is exact min/max, codes are exact integers, and the
    reconstruction is the same float expression everywhere. The
    round-trip form (rather than raw codes) keeps the downstream
    scorer unchanged — candidate generation runs on ``out_col``,
    exact rescoring on the original vectors, the same
    quantize→route→rescore contract as IVF-PQ (s5/s6/s7)."""
    lo, hi = stats if stats is not None else scalar_quantize_stats(
        df, vec_col
    )
    levels = float((1 << bits) - 1)
    los = F.array(*[F.lit(v) for v in lo])
    spans = F.array(
        *[F.lit((h - l) if h > l else 1.0) for l, h in zip(lo, hi)]
    )
    code = F.zip_with(
        F.col(vec_col),
        los,
        lambda x, l: x.cast("double") - l,
    )
    code = F.zip_with(
        code, spans, lambda d, s: F.round(d / s * levels, 0)
    )
    recon = F.zip_with(
        code, spans, lambda c, s: c / levels * s
    )
    recon = F.zip_with(recon, los, lambda d, l: d + l)
    return df.withColumn(out_col, recon)


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append a ``k``-dim PCA projection of ``vec_col`` (centered,
    deterministic component signs). The components ride the closure
    as a k×d literal (KBs) — a broadcast matmul per Arrow batch, no
    shuffle at all: the projection is a map."""
    import numpy as np
    import pandas as pd

    mean, comps, _ = pca_components(df, k, vec_col)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, {out_col} array<double>"
    mean_l = mean.copy()
    comps_l = comps.copy()

    def project(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = np.dot(X - mean_l, comps_l.T)
            out = pdf.copy()
            out[out_col] = [row.tolist() for row in P]
            yield out

    return df.mapInPandas(project, schema)
