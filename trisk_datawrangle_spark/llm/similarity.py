"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(|queries|·|corpus|),
fine when the query side is small enough to broadcast. Scale path:
random-hyperplane LSH bucketing — corpus is hashed once, probes only
touch matching buckets (optionally multi-probe neighboring buckets).

Dot products are pure Catalyst expressions (``zip_with`` +
``aggregate``), computed in double regardless of storage precision.
For very wide vectors move the same contract to a vectorized Pandas
UDF over numpy — keep the column contract identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    a, b = _c(a), _c(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query side,
    cross join, window-rank per query. Returns
    (query_id, neighbor_id, cosine, rank). Self-matches excluded.

    Scale: |corpus| × |queries| similarity evaluations, all JVM-side;
    norms are precomputed per side (not per pair)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(vec_col).alias("__qn"),
    )
    # parallelize the corpus side (the |corpus|·|queries| dot products
    # are the cost center; a single input file = a single task otherwise)
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, id_col
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = pairs.withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python —
    tiny, shipped as literals into the plan)."""
    planes = []
    state = seed
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            # xorshift-ish LCG, deterministic across platforms
            state = (state * 6364136223846793005 + 1442695040888963407) % (2 ** 64)
            u = ((state >> 11) % (2 ** 32)) / 2 ** 32
            vec.append(math.cos(2 * math.pi * u))  # symmetric around 0
        planes.append(vec)
    return planes


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH: bucket =
    sign-bit string of ``n_planes`` projections; candidates = same
    bucket; exact cosine + rank within candidates.

    The corpus-side bucketing is one projection pass; the join is on
    the bucket key, so work scales with bucket occupancy (2^planes
    buckets) instead of |corpus|·|queries|. Recall < 1 by design —
    raise recall with multi-probe (flip one bit) or more tables."""
    planes = _hyperplanes(dim, n_planes)

    def bucket(vec: Column) -> Column:
        bits = []
        for plane in planes:
            lit = F.array(*[F.lit(x) for x in plane])
            proj = F.aggregate(
                F.zip_with(vec, lit, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
        bucket(_c(vec_col)).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(vec_col).alias("__qn"),
        bucket(_c(vec_col)).alias("__bucket"),
    )
    pairs = c.join(F.broadcast(q), "__bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path brute-force cosine top-k: numpy matmul over Arrow
    batches instead of per-element Catalyst expressions.

    The expression form (:func:`cosine_topk`) evaluates ``zip_with``/
    ``aggregate`` on the interpreted path — fine for thousands of
    vectors, ~100× too slow for millions. Here each corpus partition
    computes a (batch × queries) GEMM against the broadcast query
    matrix and emits only its local top-k per query; the global
    window then ranks |partitions|·k candidates per query instead of
    |corpus|. Same output contract as :func:`cosine_topk` (float
    summation order differs in the last ulps — compare with
    tolerance, not hashes).
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    def topk_partition(batches):
        ids, mat, norms = bq.value
        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_ids = pdf[id_col].to_numpy()
            c_norm = np.linalg.norm(c_mat, axis=1)
            # (corpus_batch × queries) cosine matrix in one GEMM
            sims = (c_mat @ mat.T) / np.outer(c_norm, norms)
            out_q, out_n, out_c = [], [], []
            for j in range(len(ids)):
                col = sims[:, j]
                mask = c_ids != ids[j]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                take = min(k, len(cand_idx))
                top = cand_idx[np.argpartition(-col[cand_idx], take - 1)[:take]]
                out_q.extend([ids[j]] * len(top))
                out_n.extend(c_ids[top])
                out_c.extend(col[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    part = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, id_col
    ).mapInPandas(
        topk_partition, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
