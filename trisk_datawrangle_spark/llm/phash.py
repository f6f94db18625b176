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
    bands: int = 4,
    max_hamming: int = 4,
) -> DataFrame:
    """Banded hamming near-duplicate pairs over 64-bit hashes — the
    d3/d4 LSH idiom applied to hamming space, for images whose edits
    flip a FEW dHash bits (crop-resistant it is not; brightness/
    re-encode edits are, and small local edits land within a few
    bits). Slice each hash into ``bands`` contiguous
    ``64/bands``-bit slices; two hashes agreeing on >= 1 slice
    become a candidate pair; exact ``bit_count(xor)`` verifies
    ``<= max_hamming``.

    Recall bound (pigeonhole, documented not hidden): a pair at
    hamming d < ``bands`` is GUARANTEED caught — d differing bits
    cannot touch all ``bands`` slices; at d >= bands a pair whose
    flipped bits spread across every slice is missed. The default
    (4, 4) misses only the measure-zero corner d == 4 with one flip
    per slice.

    Returns (id_a, id_b, hamming) with ``id_a < id_b``, one row per
    pair. Scale shape: explode to ``bands`` rows per image, ONE
    equi-join on (band, bucket) — the 16-bit bucket space keeps
    expected collision fan-in at n/65536 per bucket per band — then
    a distinct and a JVM popcount filter; no Python, nothing
    quadratic unless the corpus is hash-degenerate (same discipline
    as d3: candidates are bounded by real agreement, not by n^2)."""
    from pyspark.sql import functions as F

    if 64 % bands:
        raise ValueError(
            f"hamming_band_pairs: bands ({bands}) must divide 64"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    banded = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.col(hash_col), b * width
                    ).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("h").alias("h_a"),
        "band", "bucket",
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("h").alias("h_b"),
        "band", "bucket",
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    verified = cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        .cast("int")
        .alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
    # one row per (id_a, id_b) even when an id appears with SEVERAL
    # hashes (re-ingested image): the distinct above keys on hashes
    # too, so without this reduce a duplicate id would emit the same
    # pair once per hash combination — min = the closest evidence
    return verified.groupBy("id_a", "id_b").agg(
        F.min("hamming").cast("int").alias("hamming")
    )
