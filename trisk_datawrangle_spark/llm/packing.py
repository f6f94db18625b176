"""Token-budget sequence packing: assign documents to fixed-budget
training sequences without driver-side loops.

True first-fit bin packing is sequential state; the scalable
relational form is streaming chunking — within a shard, documents in
a deterministic order accumulate token counts, and a document joins
pack ``floor(cum_before / budget)``. Packs can overflow the budget by
at most one document (the straddler), which training pipelines accept
(the alternative — closing the pack early — wastes the same tokens on
the other side of the boundary).

Sharding is what makes it distribute: the cumulative sum windows over
``shard_cols`` (a hash shard, a language, a source), so no global
ordering or single-partition window exists anywhere. Pack identity is
(shard…, pack_id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Add ``pack_id`` (per-shard) and ``pack_cum_tokens`` to ``df``.

    ``order_col`` pins the accumulation order (ties are not allowed to
    matter: use a unique id). ``pack_id = floor(cum_before / budget)``
    — greedy sequential packing: a document is assigned to the pack
    its FIRST token lands in, so a document longer than ``budget``
    shares its pack with whatever preceded it in that pack and then
    occupies the skipped pack ids its overflow spans (pack ids stay
    monotone but not contiguous). Callers needing oversized docs
    isolated should split or truncate them first
    (:func:`chunk_documents`)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn("pack_cum_tokens", cum).withColumn(
        "pack_id",
        F.floor((F.col("pack_cum_tokens") - F.col(token_col)) / budget).cast(
            "long"
        ),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows —
    the context-window chunking step that precedes embedding or
    training-example generation (stride < window ⇒ ``window-stride``
    tokens of overlap so no boundary-spanning content is lost).

    Output: (``id_col``, chunk_id, chunk_text, n_chunk_tokens), one
    row per chunk; chunk ``i`` covers word positions
    ``[i*stride, i*stride + window)``. A document with ``n`` words
    yields ``ceil(max(n - window, 0) / stride) + 1`` chunks (empty
    documents yield none) — every word is covered and the last chunk
    is the only short one.

    Scale shape: pure projection + ``posexplode`` — no shuffle, no
    Python, whole-stage codegen end to end. The per-row words array
    is built with ``split`` + ``array_remove`` (both native codegen
    expressions; no interpreted lambda HOF on the hot path), chunks
    are ``slice`` + ``concat_ws``. At 100 TB this is embarrassingly
    parallel and scan-bound."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # the chunk-count formula assumes overlapping or exact tiling;
        # a gap (stride > window) silently drops the words between
        # windows AND emits a phantom empty trailing chunk
        raise ValueError(
            f"stride ({stride}) > window ({window}) leaves words "
            "uncovered — use stride <= window"
        )
    words = F.array_remove(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), ""
    )
    n = F.size(words)
    n_chunks = (F.ceil(F.greatest(n - window, F.lit(0)) / stride) + 1).cast(
        "int"
    )
    # guard: Spark's sequence(0, stop) infers step -1 when stop < 0,
    # so an unguarded empty doc would yield chunks [0, -1] instead of
    # none — emit an empty array explicitly for wordless documents
    spine = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks - 1)
    )
    out = (
        df.select(
            F.col(id_col),
            words.alias("__ws"),
            F.posexplode(spine).alias("chunk_id", "__i"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(
                " ",
                F.slice(F.col("__ws"), F.col("chunk_id") * stride + 1, window),
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__ws"), F.col("chunk_id") * stride + 1, window)
            ).cast("long").alias("n_chunk_tokens"),
        )
    )
    return out


def cdc_chunk_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_words: int = 20,
    portable_hash: bool = False,
) -> DataFrame:
    """Content-defined chunking (the FastCDC idea at word
    granularity): a word STARTS a new chunk when a hash of the word
    itself hits ``1/avg_words`` of the hash space — boundaries are a
    pure function of content, so inserting or deleting words only
    re-chunks the affected neighborhood while every downstream chunk
    re-aligns (fixed-size chunking shifts EVERY later boundary: one
    edit near the front invalidates a whole document's block-dedup
    fingerprints; d10's fixed chunks are the contrast case).

    Output: (id, chunk_idx, n_words, chunk_hash, chunk_text) — the
    block-dedup fingerprint table; expected chunk length is
    ``avg_words`` words, and identical word runs anywhere in any
    document produce identical chunk hashes.

    Plan shape: the shared gram builder at n=1 (codegen posexplode),
    one cumulative-boundary window per doc, one (id, chunk) hash
    aggregate with sort_array reassembly (the d10 trick — order
    recovered from carried positions, never from collect order).
    Two shuffles total, both on the doc id.

    ``portable_hash`` switches the boundary/fingerprint hash from
    xxhash64 (fast, JVM) to an md5-derived value (bit-identical in
    DuckDB — what the catalog oracle uses); boundary STATISTICS are
    identical, exact boundaries differ between the two modes."""
    from pyspark.sql import Window

    if avg_words <= 0:
        raise ValueError(f"avg_words must be positive, got {avg_words}")

    # positions carried from the split (the shared gram builder drops
    # them) — they key both the boundary window and the reassembly
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("pos", "w"),
    ).filter(F.col("w") != "")
    if portable_hash:
        hx = F.md5(F.col("w"))
        wval = F.conv(F.substring(hx, 1, 13), 16, 10).cast("long")
    else:
        wval = F.xxhash64(F.col("w"))
    boundary = (F.pmod(wval, F.lit(avg_words)) == 0).cast("int")
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = words.select(
        "id", "pos", "w", F.sum(boundary).over(win).alias("chunk_idx")
    )
    rebuilt = (
        chunked.groupBy("id", "chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "w"))
                    ),
                    lambda s: s["w"],
                ),
            ).alias("chunk_text"),
        )
    )
    return rebuilt.select(
        F.col("id").alias(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "n_words",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
        "chunk_text",
    )
