"""Perceptual image hashing (dHash) over the real pixel decoders —
image-level near-duplicate detection for multimodal corpora, the
visual analogue of the text dedup ladder.

dHash (difference hash — public technique, e.g. Krawetz 2013):
nearest-neighbor resample the decoded image to a (HASH_W+1)×HASH_H
grid, integer-grayscale each cell (ITU-R BT.601 weights, exact
integer division), and emit one bit per horizontal neighbor
comparison — 64 bits at the default 8×8. Every step is integer
arithmetic on top of :func:`multimodal.resample_nearest`'s floor
indexing, so a SQL oracle replays the hash bit-for-bit (the m9
catalog entry does exactly that).

Why it works as dedup: global photometric edits (brightness shift,
re-encode, light recompression) preserve neighbor ORDER, so
variants collapse to the same 64-bit key — then duplicate grouping
is one hash-groupBy (the d1 exact-dedup shape, scale-free), with
``bit_count(xor)`` hamming refinement for the near-miss band (the
d4 SimHash machinery applies unchanged).

Cost tier: the decode runs in the Arrow-batched ``mapInPandas``
media kernel; everything after the hash column exists is plain JVM
relational algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: comparison grid: HASH_W horizontal comparisons per row over
#: HASH_W+1 sampled columns, HASH_H rows -> HASH_W*HASH_H bits.
HASH_W = 8
HASH_H = 8


def gray601(r: int, g: int, b: int) -> int:
    """Integer BT.601 luma: (299r + 587g + 114b) // 1000 — exact
    floor division, so a uniform +1 on every channel moves the luma
    by exactly +1 (no float rounding), which is what makes
    brightness-shift invariance of the COMPARISONS provable."""
    return (299 * r + 587 * g + 114 * b) // 1000


def dhash_bits(
    width: int, height: int, channels: int, pixels: bytes
) -> int:
    """64-bit dHash of raw row-major pixels as a SIGNED 64-bit int
    (two's-complement wrap, matching Spark/DuckDB BIGINT). Gray for
    1/2-channel images is the first channel; 3/4-channel images use
    BT.601 on r,g,b (alpha ignored)."""
    from trisk_datawrangle_spark.llm.multimodal import (
        resample_nearest,
    )

    gw, gh = HASH_W + 1, HASH_H
    small = resample_nearest(
        width, height, channels, pixels, gw, gh
    )

    def gray(ox: int, oy: int) -> int:
        at = (oy * gw + ox) * channels
        if channels >= 3:
            return gray601(small[at], small[at + 1], small[at + 2])
        return small[at]

    h = 0
    for oy in range(HASH_H):
        for ox in range(HASH_W):
            if gray(ox + 1, oy) > gray(ox, oy):
                h |= 1 << (oy * HASH_W + ox)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def perceptual_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash) for every payload the real decoders accept —
    rows whose payload does not decode are DROPPED (an undecodable
    image has no perceptual content to dedup; count them upstream
    via decode_metadata's ``ok`` flag if the loss rate matters).
    Downstream grouping is caller-side relational algebra:
    ``groupBy("dhash")`` for exact perceptual dup groups,
    ``bit_count(id_a.dhash ^ id_b.dhash)`` for the hamming band."""
    import pandas as pd

    from trisk_datawrangle_spark.llm.multimodal import decode_pixels

    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    )

    def hashes(batches):
        for pdf in batches:
            ids, hs = [], []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[payload_col]
            ):
                decoded = decode_pixels(bytes(payload))
                if decoded is None:
                    continue
                ids.append(int(doc_id))
                hs.append(dhash_bits(*decoded))
            yield pd.DataFrame({"doc_id": ids, "dhash": hs})

    return df.select(id_col, payload_col).mapInPandas(
        hashes, "doc_id long, dhash long"
    )


def hamming_band_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    blocks: int = 8,
    key_blocks: int = 4,
    max_hamming: int = 4,
) -> DataFrame:
    """Near-duplicate pairs over 64-bit hashes within hamming
    ``max_hamming`` — the block-combination scheme of Manku, Jain &
    Das Sarma, "Detecting Near-Duplicates for Web Crawling" (WWW
    2007), for images whose edits flip a FEW dHash bits
    (crop-resistant it is not; brightness/re-encode edits are, and
    small local edits land within a few bits).

    Split each hash into ``blocks`` equal slices and key candidates
    on every ``key_blocks``-subset of slices concatenated
    (C(blocks, key_blocks) composite keys — 70 of 32 bits each at
    the (8, 4) default). GUARANTEED recall for d <= blocks -
    key_blocks (pigeonhole: d flipped bits dirty at most d blocks,
    leaving >= key_blocks clean ones whose subset-key matches);
    the constructor refuses a ``max_hamming`` above that bound, so
    the verified output is never silently partial. Exact
    ``bit_count(xor) <= max_hamming`` verifies every candidate.

    Why not 4 plain 16-bit bands (the first-cut shape): a 16-bit
    bucket space makes expected candidates n^2/65536 PER BAND —
    measured 42x per 10x data at sf10 (495 s) before this rewrite.
    The 32-bit composite keys put the collision term at
    70·n^2/2^32 — ~4600x fewer spurious candidates — and banding
    runs over DISTINCT HASH VALUES, not rows, so hash-degenerate
    corpora (blank images, boilerplate frames) collapse to one node
    per value before the join instead of exploding inside it; doc
    pairs expand back through two hash-equi joins at the end, sized
    by the TRUE duplicate structure.

    Returns (id_a, id_b, hamming) with ``id_a < id_b``, one row per
    pair (min hamming when an id carries several hashes). Scale
    shape: distinct -> explode x70 -> ONE (combo, key) equi-join ->
    JVM popcount filter -> two hash-equi expansion joins + one
    keyed min — no Python, nothing quadratic in rows."""
    from itertools import combinations

    from pyspark.sql import functions as F

    if 64 % blocks:
        raise ValueError(
            f"hamming_band_pairs: blocks ({blocks}) must divide 64"
        )
    if not 1 <= key_blocks < blocks:
        raise ValueError(
            f"hamming_band_pairs: key_blocks ({key_blocks}) must be "
            f"in [1, blocks)"
        )
    if max_hamming > blocks - key_blocks:
        raise ValueError(
            f"hamming_band_pairs: recall is only guaranteed to "
            f"hamming {blocks - key_blocks} at ({blocks}, "
            f"{key_blocks}); raise blocks or lower max_hamming "
            f"rather than silently missing pairs"
        )
    width = 64 // blocks
    mask = (1 << width) - 1
    combos = list(combinations(range(blocks), key_blocks))

    hv = df.select(F.col(hash_col).alias("h")).distinct()

    def block(b: int):
        return F.shiftrightunsigned(F.col("h"), b * width).bitwiseAND(
            F.lit(mask)
        )

    key_cols = []
    for combo in combos:
        k = F.lit(0).cast("long")
        for j, b in enumerate(combo):
            k = k + block(b).cast("long") * F.lit(
                1 << (j * width)
            ).cast("long")
        key_cols.append(k)
    banded = hv.select(
        "h", F.posexplode(F.array(*key_cols)).alias("combo", "key")
    )
    a = banded.select(F.col("h").alias("h_a"), "combo", "key")
    b = banded.select(F.col("h").alias("h_b"), "combo", "key")
    vcand = (
        a.join(b, ["combo", "key"])
        .where(F.col("h_a") <= F.col("h_b"))
        .select("h_a", "h_b")
        .distinct()
    )
    vpairs = vcand.select(
        "h_a",
        "h_b",
        F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        .cast("int")
        .alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
    # expand hash-value pairs back to doc pairs: least/greatest
    # orients ids regardless of the value-level h_a <= h_b order,
    # and the keyed min dedups the both-order rows an equal-hash
    # value pair produces (plus multi-hash ids)
    da = df.select(
        F.col(id_col).alias("ia"), F.col(hash_col).alias("h_a")
    )
    db = df.select(
        F.col(id_col).alias("ib"), F.col(hash_col).alias("h_b")
    )
    return (
        vpairs.join(da, "h_a")
        .join(db, "h_b")
        .where(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").cast("int").alias("hamming"))
    )
