"""Baseline JPEG codec correctness (llm/jpeg.py): encode→decode
roundtrips within DCT-quantization tolerance across color modes,
subsampling, restart markers, odd geometries, and hostile content;
malformed / non-baseline streams are rejected, never mis-decoded.

No image library exists in this container, so the in-repo encoder is
the fixture source — it emits the T.81 Annex K tables every real
camera ships, and the decoder is written against the spec, not
against the encoder (marker walk, Huffman build, zigzag, IDCT, and
color transform are all independent code paths; the tests pin the
numeric agreement between them)."""

from __future__ import annotations

import numpy as np
import pytest

from trisk_datawrangle_spark.llm.jpeg import decode_jpeg, encode_jpeg


def _gradient(w, h, ch):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, ch), dtype=np.uint8)
    for c in range(ch):
        img[..., c] = np.clip(60 + 3 * xx + 2 * yy + 20 * c, 0, 255)
    return img


def _noise(w, h, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def _roundtrip(img, **kw):
    h, w, ch = img.shape
    payload = encode_jpeg(w, h, ch, img.tobytes(), **kw)
    got = decode_jpeg(payload)
    assert got is not None
    gw, gh, gch, px = got
    assert (gw, gh, gch) == (w, h, ch)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
    return dec.astype(int), payload


@pytest.mark.parametrize(
    "w,h,ch", [(16, 16, 3), (24, 17, 3), (8, 8, 1), (33, 9, 1),
               (7, 5, 3), (1, 1, 1), (1, 1, 3)]
)
def test_roundtrip_gradient_tight(w, h, ch):
    img = _gradient(w, h, ch)
    dec, _ = _roundtrip(img, quality=92)
    assert np.abs(dec - img.astype(int)).max() <= 4


def test_roundtrip_noise_bounded():
    """Worst-case content: full-range noise. The error bound is the
    quantization table's coarsest step at q=95 — a wrong zigzag,
    Huffman code, or predictor would blow past it by hundreds."""
    img = _noise(32, 32, 1, seed=3)
    dec, _ = _roundtrip(img, quality=95)
    assert np.abs(dec - img.astype(int)).max() <= 16


def test_roundtrip_420_subsampled():
    img = _gradient(37, 22, 3)
    dec, payload = _roundtrip(img, quality=92, subsampling="420")
    assert np.abs(dec - img.astype(int)).max() <= 8
    # the stream genuinely declares 2x2 luma sampling (SOF comp 1
    # factors byte 0x22), so the decoder's MCU/upsample path ran
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11] == 0x22
    # at sizes where MCU padding is amortized, 4:2:0 must be smaller
    big = _gradient(128, 96, 3)
    _, p420 = _roundtrip(big, quality=92, subsampling="420")
    _, p444 = _roundtrip(big, quality=92)
    assert len(p420) < len(p444)


def test_roundtrip_restart_markers():
    img = _gradient(64, 48, 3)
    dec, payload = _roundtrip(img, quality=90, restart_interval=3)
    assert np.abs(dec - img.astype(int)).max() <= 8
    # RSTn markers really are in the stream
    assert any(
        payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7
        for i in range(len(payload) - 1)
    )


def test_roundtrip_restart_with_420():
    img = _gradient(48, 33, 3)
    dec, _ = _roundtrip(
        img, quality=90, subsampling="420", restart_interval=2
    )
    assert np.abs(dec - img.astype(int)).max() <= 10


def test_dc_prediction_chain():
    """A constant image encodes every DC as diff 0 after the first
    block — decode must reproduce the constant exactly everywhere,
    proving the DC predictor resets/carries correctly."""
    img = np.full((40, 56, 3), 113, dtype=np.uint8)
    dec, _ = _roundtrip(img, quality=90)
    assert np.abs(dec - 113).max() <= 2


def test_rejects_malformed_and_non_baseline():
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"junk") is None
    assert decode_jpeg(b"\xff\xd8") is None
    # malformed SOF2 (truncated frame header) refused, never raises
    assert decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05aaa") is None
    # malformed SOF0 with a lying segment length: same guard
    assert decode_jpeg(b"\xff\xd8\xff\xc0\x00\x05aaa") is None
    # truncated mid-entropy: decode fails loudly (None), no crash
    img = _gradient(32, 32, 3)
    payload = encode_jpeg(32, 32, 3, img.tobytes())
    assert decode_jpeg(payload[: len(payload) // 2]) is None


def test_byte_stuffing_survives():
    """High-entropy content at high quality produces 0xFF bytes in
    the entropy stream, which the writer must stuff and the reader
    unstuff — a miss desyncs the whole stream."""
    img = _noise(24, 24, 3, seed=11)
    payload = encode_jpeg(24, 24, 3, img.tobytes(), quality=97)
    assert b"\xff\x00" in payload  # stuffing actually occurred
    got = decode_jpeg(payload)
    assert got is not None and got[:3] == (24, 24, 3)


def test_decode_pixels_dispatches_jpeg():
    from trisk_datawrangle_spark.llm.multimodal import decode_pixels

    img = _gradient(12, 10, 3)
    got = decode_pixels(encode_jpeg(12, 10, 3, img.tobytes()))
    assert got is not None and got[:3] == (12, 10, 3)


def test_resize_media_resamples_jpeg(spark):
    from trisk_datawrangle_spark.llm.multimodal import resize_media

    img = _gradient(16, 12, 3)
    payload = encode_jpeg(16, 12, 3, img.tobytes(), quality=92)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    out = resize_media(df, width=4, height=4).collect()[0]
    assert (out.src_width, out.src_height) == (16, 12)
    assert out.byte_len == 4 * 4 * 3
    # JPEG in, PNG out: the resampled pixels round-trip losslessly
    from trisk_datawrangle_spark.llm.multimodal import decode_png

    assert out.out_fmt == "png"
    decoded = decode_png(bytes(out.payload))
    assert decoded is not None and decoded[:3] == (4, 4, 3)


# ------------------------------------------------- progressive (SOF2)


def _pattern_img(w, h, ch, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (xx * 3 + yy * 5) % 256
    img = np.stack([(base + 40 * i) % 256 for i in range(ch)], -1)
    return ((img + rng.randint(0, 60, img.shape)) % 256).astype(
        np.uint8
    ).tobytes()


@pytest.mark.parametrize(
    "w,h,ch,sub,q",
    [
        (16, 16, 3, "444", 85),
        (8, 8, 1, "444", 85),
        (24, 16, 3, "420", 75),
        (17, 9, 3, "444", 92),
        (33, 25, 3, "420", 60),
        (7, 5, 1, "444", 50),
    ],
)
def test_progressive_bit_exact_vs_baseline(w, h, ch, sub, q):
    """The SA scan script carries every coefficient bit, so decoding
    the progressive stream must reproduce the BASELINE decode of the
    same pixels exactly — any error in spectral-selection bands,
    EOB-run handling, correction bits, or the DC point transform
    shows up as a pixel diff."""
    from trisk_datawrangle_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    px = _pattern_img(w, h, ch)
    base = decode_jpeg(encode_jpeg(w, h, ch, px, quality=q,
                                   subsampling=sub))
    prog_payload = encode_jpeg_progressive(
        w, h, ch, px, quality=q, subsampling=sub
    )
    prog = decode_jpeg(prog_payload)  # decode_jpeg dispatches SOF2
    assert prog is not None and base is not None
    assert prog[:3] == base[:3] == (w, h, ch)
    assert prog[3] == base[3]


def test_progressive_dispatches_through_decode_pixels():
    from trisk_datawrangle_spark.llm.jpeg import (
        encode_jpeg_progressive,
    )
    from trisk_datawrangle_spark.llm.multimodal import (
        decode_pixels,
        parse_image_dims,
    )

    px = _pattern_img(16, 8, 3)
    payload = encode_jpeg_progressive(16, 8, 3, px, quality=90)
    assert parse_image_dims(payload) == (16, 8, "jpeg")
    got = decode_pixels(payload)
    assert got is not None and got[:3] == (16, 8, 3)


def test_progressive_multiblock_eob_run():
    """Handcrafted stream using an EOBn>0 symbol (EOB run spanning
    several blocks) — our encoder caps runs at one block (Annex K
    tables carry no EOBn codes), but real progressive files use
    them, so the decoder's run accounting is gated here: 32x8 gray,
    one AC scan; block 0 gets coefficient +1 at k=1, EOB1+extra
    covers blocks 0(tail)-2, plain EOB closes block 3."""
    from trisk_datawrangle_spark.llm.jpeg import decode_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(
            2, "big"
        ) + body

    d = bytearray(b"\xff\xd8")
    d += seg(0xDB, bytes([0]) + bytes([99] * 64))
    d += seg(
        0xC2,
        bytes([8]) + (8).to_bytes(2, "big") + (32).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    # AC table: codes 00->0x01 (run0,size1), 01->0x10 (EOB1),
    # 10->0x00 (EOB)
    d += seg(
        0xC4,
        bytes([0x10]) + bytes([0, 3] + [0] * 14)
        + bytes([0x01, 0x10, 0x00]),
    )
    d += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    # bits: 00 1 (coef +1 at k=1) | 01 1 (EOB1, extra=1 -> run 3:
    # this block's tail + blocks 1-2) | 10 (EOB block 3) = 0x2E
    d += b"\x2e"
    d += b"\xff\xd9"
    got = decode_jpeg(bytes(d))
    assert got is not None
    w, h, ch, px = got
    assert (w, h, ch) == (32, 8, 1)
    import numpy as np

    img = np.frombuffer(px, np.uint8).reshape(8, 32)
    # blocks 1-3 covered by EOB runs: flat 128 (DC never scanned)
    assert (img[:, 8:] == 128).all()
    # block 0 carries the AC coefficient: must deviate from flat
    assert (img[:, :8] != 128).any()


def test_progressive_truncated_returns_none():
    from trisk_datawrangle_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    px = _pattern_img(16, 16, 3)
    payload = encode_jpeg_progressive(16, 16, 3, px)
    assert decode_jpeg(payload[: len(payload) // 2]) is None
    # truncation INSIDE the last entropy segment: scans before it
    # already accumulated coefficients; the decoder must refuse (the
    # refinement scan cannot complete) — and never raise
    assert decode_jpeg(payload[:-3]) is None


def test_progressive_resize_media_real_path(spark):
    from trisk_datawrangle_spark.llm.jpeg import (
        encode_jpeg_progressive,
    )
    from trisk_datawrangle_spark.llm.multimodal import (
        decode_png,
        resize_media,
    )

    px = _pattern_img(16, 12, 3)
    payload = encode_jpeg_progressive(16, 12, 3, px, quality=92)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    out = resize_media(df, width=4, height=4).collect()[0]
    assert out.out_fmt == "png"
    assert (out.src_width, out.src_height) == (16, 12)
    decoded = decode_png(bytes(out.payload))
    assert decoded is not None and decoded[:3] == (4, 4, 3)
