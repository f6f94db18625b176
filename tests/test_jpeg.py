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
    # progressive SOF2 refused, not mis-decoded
    assert decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05aaa") is None
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
