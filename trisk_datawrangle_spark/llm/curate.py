"""Corpus curation pipeline — the standard LLM training-data chain
composed from the engine's operators:

    lang-id → quality gate → exact dedup (keep canonical) →
    near-dup removal (MinHash-LSH) → token accounting

Two entry points: :func:`curate_exact` is fully deterministic and
SQL-expressible (oracle-checkable); :func:`curate` adds the near-dup
stage — MinHash-LSH candidates *verified with exact n-gram Jaccard*,
so its output is deterministic and oracle-checkable too (the internal
hashing only decides how cheaply the exact answer is found).

Scale shape: one shuffle for the exact-dedup groupBy, one id-keyed
shuffle inside the LSH stage; the quality/lang columns are pure
projections fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.dedup import minhash_lsh_dedup_pairs
from trisk_datawrangle_spark.llm.text import (
    lang_id,
    quality_score,
    token_count,
)


def curate_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.6,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Deterministic curation: language filter, quality gate, exact
    dedup keeping the lowest id per distinct content. Returns the
    surviving docs with (lang, quality, n_tokens) columns."""
    # NOTE (r13, measured and rejected): the gate filter on these
    # derived columns is predicate-pushed below the projection, so the
    # interpreted lang-id + quality chains run twice per row. A
    # nondeterministic pushdown barrier (monotonically_increasing_id
    # in the projection) fixes that for the isolated scan (measured
    # 1.22 -> 0.80 s at sf0.1, identical rows) but LOSES in the
    # composites that consume the gated frame from several branches
    # (c4 5.0 -> 7.0 s, w4 4.5/5.3 -> 5.7/5.4 interleaved): the
    # nondeterministic projection defeats subtree reuse across
    # branches, which costs more than the saved evaluation.
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        lang_id(text_col).alias("lang"),
        F.round(quality_score(text_col), 6).alias("quality"),
        token_count(text_col, mode="ws").alias("n_tokens"),
    )
    gated = scored.filter(
        F.col("lang").isin(*langs) & (F.col("quality") >= min_quality)
    )
    canonical = gated.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("lang").alias("lang"),
        F.first("quality").alias("quality"),
        F.first("n_tokens").alias("n_tokens"),
    )
    return canonical.select("doc_id", "lang", "quality", "n_tokens")


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.6,
    langs: tuple[str, ...] = ("en",),
    near_dup_jaccard: float = 0.8,
) -> DataFrame:
    """Full curation: :func:`curate_exact` plus near-dup removal —
    of every exact-verified near-dup pair (true n-gram Jaccard ≥
    ``near_dup_jaccard``, candidates from MinHash-LSH at 32×2
    banding), the higher id is dropped (canonical-keeps-lowest, the
    same policy as exact dedup)."""
    # stage boundary: kept feeds the survivor semi-join AND the final
    # anti-join — uncached, the scan→score→gate→dedup subtree runs
    # twice. The cached frame is post-dedup metadata (no text column).
    kept = curate_exact(df, text_col, id_col, min_quality, langs).cache()
    survivors = df.join(
        kept.select("doc_id"),
        df[id_col] == kept["doc_id"],
        "left_semi",
    )
    pairs = minhash_lsh_dedup_pairs(
        survivors, text_col, id_col, num_hashes=64, bands=32,
        threshold=near_dup_jaccard,
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return kept.join(drop, "doc_id", "left_anti")


def cluster_canonical(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    pair_tier: str = "lsh",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Collapse near-dup clusters to one canonical document each —
    the highest ``quality_score`` wins, ties to the smaller id.
    Returns ``(cluster_id, canonical_id, quality)``.

    ``pair_tier`` (default ``"lsh"``, the candidate-bounded 100 TB
    path — see :func:`~trisk_datawrangle_spark.llm.dedup
    .near_dup_pairs`) picks the pair-graph strategy; the exhaustive
    quadratic join is ``pair_tier="exact"``, opt-in for oracle
    gating (r7 verdict #2: the scale-killer must not be the named
    default)."""
    from pyspark.sql import Window

    from trisk_datawrangle_spark.llm.components import (
        dedup_clusters_pipeline,
    )

    clustered = dedup_clusters_pipeline(
        df, text_col, id_col, n=n, threshold=threshold,
        pair_tier=pair_tier, num_hashes=num_hashes, bands=bands,
    )
    scored = clustered.join(
        df.select(
            id_col, F.round(quality_score(text_col), 6).alias("quality")
        ),
        id_col,
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), id_col
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "cluster_id", F.col(id_col).alias("canonical_id"), "quality"
        )
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions=None,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: collapse the near-dup
    pair graph to connected components, then hash-split on the
    CLUSTER id — every member of a near-dup family lands in the same
    split, so no document can leak an almost-identical copy of a test
    document into train (the standard dedup-aware split; splitting on
    the raw doc id does not have this property).

    Returns ``(doc_id, cluster_id, split)`` for every document.
    Scale shape: the component loop is the documented driver-loop
    island (llm/components.py — one join+agg per round, checkpointed);
    the split itself is a pure projection, no extra shuffle."""
    from trisk_datawrangle_spark.llm.components import dedup_clusters
    from trisk_datawrangle_spark.llm.sampling import deterministic_split

    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    clustered = dedup_clusters(docs, pairs, id_col=id_col)
    return deterministic_split(clustered, "cluster_id", fractions, seed)


def curate_to_splits(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.6,
    langs: tuple[str, ...] = ("en",),
    near_dup_jaccard: float = 0.8,
    contamination_ngram: int = 4,
    fractions=None,
    seed: int = 7,
) -> DataFrame:
    """The complete corpus-build chain, end to end:

        lang-id -> quality gate -> exact dedup -> near-dup removal
        -> benchmark decontamination -> deterministic split
        -> per-split accounting

    i.e. :func:`curate` (the c2 chain) composed with
    :func:`~trisk_datawrangle_spark.llm.dedup.contamination_overlap`
    (drop any surviving doc sharing a word n-gram with the eval set)
    and :func:`~trisk_datawrangle_spark.llm.sampling
    .deterministic_split`. Returns one row per split:
    ``(split, n_docs, total_tokens, min_id, max_id)``.

    Every stage is deterministic (near-dup candidates are
    exact-verified), so the whole chain is SQL-expressible and
    oracle-checkable. Scale shape: the c2 chain's shuffles plus one
    broadcast join (eval grams) and one final tiny aggregate — no new
    shuffle beyond the stages' own."""
    from trisk_datawrangle_spark.llm.dedup import contamination_overlap
    from trisk_datawrangle_spark.llm.sampling import deterministic_split

    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    # stage boundary: kept feeds BOTH the contamination semi-join and
    # the final anti-join — uncached, the whole curate() subtree
    # (including the LSH near-dup stage) would execute twice. The
    # cached frame is per-doc metadata only (no text), tiny at any
    # scale; on a cluster this is the natural checkpoint between the
    # dedup and decontamination stages.
    kept = curate(
        df, text_col, id_col, min_quality, langs, near_dup_jaccard
    ).cache()
    # curate()'s output id column is always named "doc_id"; df's may
    # not be — join on the caller's id_col explicitly
    kept_ids = kept.select("doc_id")
    survivors = df.join(
        kept_ids, df[id_col] == kept_ids["doc_id"], "left_semi"
    )
    contaminated = contamination_overlap(
        survivors,
        benchmark,
        text_col,
        id_col,
        n=contamination_ngram,
    ).select(F.col(id_col).alias("doc_id"))
    clean = kept.join(contaminated, "doc_id", "left_anti")
    split = deterministic_split(clean, "doc_id", fractions, seed)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
