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
