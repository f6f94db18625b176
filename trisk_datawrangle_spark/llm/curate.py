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
