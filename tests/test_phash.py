"""Perceptual hashing correctness (llm/phash.py): brightness-shift
invariance (the provable kind — integer luma moves exactly +1),
content sensitivity, signed-64 wrap, and the undecodable-drop
contract of the Spark op."""

from __future__ import annotations

import pytest

from trisk_datawrangle_spark.llm.multimodal import encode_png
from trisk_datawrangle_spark.llm.phash import dhash_bits, gray601


def _px(w, h, f):
    return bytes(
        f(x, y, c) for y in range(h) for x in range(w) for c in range(4)
    )


def test_brightness_shift_invariance():
    w, h = 19, 13
    base = _px(w, h, lambda x, y, c: (37 * x + 23 * y + 5 * c) % 255)
    plus1 = bytes(v + 1 for v in base)
    assert dhash_bits(w, h, 4, base) == dhash_bits(w, h, 4, plus1)


def test_content_sensitivity():
    w, h = 16, 16
    a = _px(w, h, lambda x, y, c: (37 * x + 23 * y) % 255)
    b = _px(w, h, lambda x, y, c: (37 * (w - 1 - x) + 23 * y) % 255)
    ha, hb = dhash_bits(w, h, 4, a), dhash_bits(w, h, 4, b)
    assert ha != hb
    # mirrored gradient flips (nearly) every comparison
    assert bin((ha ^ hb) & ((1 << 64) - 1)).count("1") > 32


def test_signed_wrap_matches_bigint():
    # a hash with bit 63 set must come back negative (BIGINT range)
    w, h = 9, 8
    # strictly increasing in x everywhere -> all 64 bits set -> -1
    inc = _px(w, h, lambda x, y, c: x * 20)
    assert dhash_bits(w, h, 4, inc) == -1


def test_gray_is_bt601_integer():
    assert gray601(255, 255, 255) == 255
    assert gray601(0, 0, 0) == 0
    assert gray601(100, 100, 100) == 100
    # +1 on every channel moves luma by exactly +1 (floor-exact)
    for r, g, b in [(3, 200, 90), (254, 0, 17), (11, 12, 13)]:
        assert gray601(r + 1, g + 1, b + 1) == gray601(r, g, b) + 1


def test_grayscale_single_channel_path():
    w, h = 12, 10
    gray = bytes(
        (7 * x + 3 * y) % 255 for y in range(h) for x in range(w)
    )
    got = dhash_bits(w, h, 1, gray)
    assert isinstance(got, int)
    assert -(1 << 63) <= got < (1 << 63)


def test_perceptual_hashes_drops_undecodable(spark):
    from trisk_datawrangle_spark.llm.phash import perceptual_hashes

    good = encode_png(
        8, 8, 4, _px(8, 8, lambda x, y, c: (31 * x + 17 * y) % 255)
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = perceptual_hashes(df).collect()
    assert [r.doc_id for r in rows] == [1]


def test_dedup_composes_relationally(spark):
    """Brightness variants collapse to one hash group via a plain
    groupBy — the d1 exact-dedup plan on the perceptual key."""
    from pyspark.sql import functions as F

    from trisk_datawrangle_spark.llm.phash import perceptual_hashes

    rows = []
    for k in range(6):
        base = _px(
            14, 11, lambda x, y, c, k=k: (k * 41 + 13 * x + 29 * y) % 250
        )
        rows.append((2 * k, bytearray(encode_png(14, 11, 4, base))))
        rows.append(
            (2 * k + 1,
             bytearray(encode_png(14, 11, 4, bytes(v + 2 for v in base))))
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    groups = (
        perceptual_hashes(df)
        .groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # every twin pair shares a hash: no group smaller than 2
    assert all(g.n >= 2 for g in groups)
    assert sum(g.n for g in groups) == 12


def test_hamming_band_pairs_semantics(spark):
    """Manku block-combination near-dup pairing: GUARANTEED recall
    to hamming blocks-key_blocks (incl. the worst spread), verify
    threshold enforced, pair dedup, id_a < id_b orientation."""
    from trisk_datawrangle_spark.llm.phash import hamming_band_pairs

    h0 = 0xF123456789ABCDEF - (1 << 64)  # signed wrap, negative
    rows = [
        (0, h0),
        (1, h0 ^ 0b11),          # hamming 2, one block touched
        (2, h0 ^ (1 << 17) ^ (1 << 33) ^ (1 << 49)),  # 3, 3 blocks
        (3, h0 ^ 0x1F),          # hamming 5: candidate, fails verify
        # hamming 4 spread over four DISTINCT blocks — the old
        # 4x16-bit scheme's documented pigeonhole miss; the (8, 4)
        # combination keys are GUARANTEED to catch it
        (4, h0 ^ (1 << 1) ^ (1 << 17) ^ (1 << 33) ^ (1 << 49)),
        (5, 0x7EDCBA9876543210),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_band_pairs(df, max_hamming=4).collect()
    }
    assert got[(0, 1)] == 2     # guaranteed: d <= blocks-key_blocks
    assert got[(0, 2)] == 3
    assert (0, 3) not in got    # candidate, d=5 > max_hamming
    assert got[(0, 4)] == 4     # worst spread: now guaranteed
    assert (1, 2) not in got    # d(1,2) = 5 > max_hamming
    # orientation + dedup: every key ordered, no duplicates possible
    assert all(a < b for a, b in got)
    # unrelated hash pairs with nothing
    assert not any(5 in k for k in got)


def test_hamming_band_pairs_equal_hashes_and_orientation(spark):
    """Equal hashes pair (hamming 0) via the value self-pair; doc
    pairs orient id_a < id_b even when the id order opposes the
    hash order; duplicate ids reduce to min hamming."""
    from trisk_datawrangle_spark.llm.phash import hamming_band_pairs

    h_small, h_big = 100, 1 << 40
    rows = [
        (9, h_small),           # id order opposes hash order:
        (3, h_big ^ 0b1),       # (3, 9) must still surface if close
        (7, h_big),
        (8, h_big),             # exact twin of 7
        (8, h_big ^ 0b11),      # duplicate id, second hash
    ]
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_band_pairs(df, max_hamming=4).collect()
    }
    assert got[(7, 8)] == 0      # exact pair via the value self-pair
    assert got[(3, 7)] == 1
    assert got[(3, 8)] == 1      # min over 8's two hashes (1 vs 2+1)
    assert (3, 9) not in got     # far apart — but orientation held:
    assert all(a < b for a, b in got)


def test_hamming_band_pairs_rejects_bad_params(spark):
    import pytest as _pytest

    from trisk_datawrangle_spark.llm.phash import hamming_band_pairs

    df = spark.createDataFrame([(1, 0)], "doc_id long, dhash long")
    with _pytest.raises(ValueError):
        hamming_band_pairs(df, blocks=5)  # 64 % 5 != 0
    with _pytest.raises(ValueError):
        hamming_band_pairs(df, blocks=8, key_blocks=8)
    with _pytest.raises(ValueError):
        # recall guarantee impossible: refuse, never silently miss
        hamming_band_pairs(df, blocks=8, key_blocks=4, max_hamming=5)
