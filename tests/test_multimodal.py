"""Multimodal plumbing semantics: the Spark-side contracts (schema,
Arrow batch shape, determinism across partition layouts) are real even
though the media decode itself is a deterministic stub.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.multimodal import (
    decode_metadata,
    extract_features,
    frame_sample_plan,
    resize_media,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(1, "hello world"), (2, "x" * 2000), (3, ""), (4, "héllo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return with_binary_payload(df, "text", "payload")


def test_decode_metadata_real_fields(spark, payloads):
    out = {r.doc_id: r for r in decode_metadata(payloads).collect()}
    assert out[1].byte_len == 11
    assert out[1].sha256 == hashlib.sha256(b"hello world").hexdigest()
    assert out[3].byte_len == 0
    # utf-8 payload: é is 2 bytes
    assert out[4].byte_len == 6
    # text bytes are not an image: stub dims, fmt unknown, ok False
    assert all(
        (not r.ok) and r.fmt == "unknown" and r.width >= 16 and r.height >= 16
        for r in out.values()
    )


def test_parse_image_dims_real_headers():
    """The header parser reads genuine PNG/JPEG/GIF bytes — spec
    structures built by hand, no media lib involved."""
    from trisk_datawrangle_spark.llm.multimodal import (
        PNG_SIG,
        parse_image_dims,
    )

    png = (
        PNG_SIG
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + (640).to_bytes(4, "big")
        + (480).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    assert parse_image_dims(png) == (640, 480, "png")

    # JPEG: SOI, APP0 (JFIF stanza), SOF0 with height=333 width=222
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big")
        + b"\x08" + (333).to_bytes(2, "big") + (222).to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    assert parse_image_dims(jpeg) == (222, 333, "jpeg")

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    assert parse_image_dims(gif) == (320, 200, "gif")

    assert parse_image_dims(b"plain text") is None
    assert parse_image_dims(b"") is None
    assert parse_image_dims(PNG_SIG + b"\x00\x00") is None  # truncated


def test_png_payload_roundtrips_through_decoder(spark):
    """png_payload builds bytes parse_image_dims reads back — the
    construct/parse pair must agree on the wire format."""
    from trisk_datawrangle_spark.llm.multimodal import (
        parse_image_dims,
        png_payload,
        with_binary_payload,
    )

    df = spark.createDataFrame(
        [(1, "body", 700, 25)], "doc_id long, text string, w int, h int"
    ).withColumn("payload", png_payload("text", "w", "h"))
    raw = bytes(df.select("payload").head()["payload"])
    assert parse_image_dims(raw) == (700, 25, "png")
    assert raw.endswith(b"body")
    meta = decode_metadata(df, "doc_id", "payload").head()
    assert (meta.width, meta.height, meta.fmt, meta.ok) == (700, 25, "png", True)


def test_resize_truncates_and_pads_exactly(spark, payloads):
    out = {r.doc_id: r for r in resize_media(payloads, 4, 8).collect()}
    assert all(r.byte_len == 32 and r.width == 4 and r.height == 8 for r in out.values())
    assert all(r.out_fmt == "raw" for r in out.values())
    # short payload zero-padded, long payload truncated
    assert bytes(out[1].payload) == b"hello world" + b"\0" * 21
    assert bytes(out[2].payload) == b"x" * 32
    assert bytes(out[3].payload) == b"\0" * 32


def test_extract_features_unit_norm_and_stable(spark, payloads):
    import numpy as np

    a = {r.vec_id: np.array(r.embedding) for r in extract_features(payloads, dim=16).collect()}
    b = {
        r.vec_id: np.array(r.embedding)
        for r in extract_features(payloads.repartition(5), dim=16).collect()
    }
    assert set(a) == {1, 2, 3, 4}
    for k in a:
        assert np.allclose(np.linalg.norm(a[k]), 1.0, atol=1e-5)
        # partition-layout independent
        assert np.allclose(a[k], b[k])
    # distinct payloads → distinct embeddings (sha-derived)
    assert not np.allclose(a[1], a[2])


def test_features_compose_with_ann(spark, payloads):
    from trisk_datawrangle_spark.llm.similarity import cosine_topk

    emb = extract_features(payloads, dim=16)
    res = cosine_topk(emb, emb, k=1)
    rows = res.collect()
    # every vector gets exactly one nearest non-self neighbor
    assert sorted(r.query_id for r in rows) == [1, 2, 3, 4]
    assert all(r.neighbor_id != r.query_id for r in rows)


def test_frame_sample_fanout(spark, payloads):
    out = frame_sample_plan(payloads, every_n=5)
    counts = {
        r.doc_id: r.n for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # 11 bytes / 5 → 2 frames; an EMPTY payload yields NO rows (a
    # phantom frame 0 for a zero-byte video breaks per-frame decodes)
    assert counts[1] == 2
    assert counts[2] == 400
    assert 3 not in counts


# ------------------------------------------------------- real pixels


def _pattern(w, h, ch, seed=0):
    return bytes(
        (seed + 3 * x + 5 * y + 7 * c) % 256
        for y in range(h) for x in range(w) for c in range(ch)
    )


def test_png_encode_decode_roundtrip_all_color_types():
    from trisk_datawrangle_spark.llm.multimodal import (
        decode_png,
        encode_png,
    )

    for ch in (1, 2, 3, 4):
        for w, h in ((1, 1), (3, 2), (16, 9), (40, 7)):
            px = _pattern(w, h, ch, seed=w * h)
            got = decode_png(encode_png(w, h, ch, px))
            assert got == (w, h, ch, px), (w, h, ch)


def test_png_decode_reverses_every_filter_type():
    """encode_png writes filter 0 only, so build streams with
    filters 1-4 by hand (filter forward per spec §9) and require the
    decoder to reverse each exactly."""
    import struct
    import zlib

    from trisk_datawrangle_spark.llm.multimodal import (
        PNG_SIG,
        decode_png,
    )

    w, h, ch = 5, 4, 3
    px = _pattern(w, h, ch, seed=9)
    stride = w * ch

    def filt(ftype, line, prev):
        out = bytearray([ftype])
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            out.append((line[i] - pred) & 0xFF)
        return bytes(out)

    for ftypes in ([1, 2, 3, 4], [4, 3, 2, 1], [0, 4, 0, 4]):
        raw = bytearray()
        prev = bytearray(stride)
        for y, ftype in zip(range(h), ftypes):
            line = px[y * stride:(y + 1) * stride]
            raw += filt(ftype, line, prev)
            prev = line

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(
                    ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
                )
            )

        payload = (
            PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert decode_png(payload) == (w, h, ch, px), ftypes


def test_png_decode_rejects_non_decodable():
    from trisk_datawrangle_spark.llm.multimodal import (
        PNG_SIG,
        decode_png,
    )

    assert decode_png(b"junk") is None
    # the header-only fixture (text as pixel bytes) is NOT silently
    # decoded — zlib fails, the caller falls back
    fixture = (
        PNG_SIG + b"\x00\x00\x00\x0dIHDR"
        + (16).to_bytes(4, "big") + (16).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00"
        + b"some text pixels"
    )
    assert decode_png(fixture) is None


def test_resample_nearest_identity_and_downscale():
    from trisk_datawrangle_spark.llm.multimodal import resample_nearest

    w, h, ch = 6, 4, 2
    px = _pattern(w, h, ch)
    assert resample_nearest(w, h, ch, px, w, h) == px
    # 2x downscale picks every other pixel (floor division index)
    small = resample_nearest(w, h, ch, px, 3, 2)
    for oy in range(2):
        for ox in range(3):
            for c in range(ch):
                assert small[(oy * 3 + ox) * ch + c] == px[
                    ((oy * 2) * w + ox * 2) * ch + c
                ]


def test_resize_media_really_resamples_valid_png(spark):
    from trisk_datawrangle_spark.llm.multimodal import (
        encode_png,
        resample_nearest,
        resize_media,
    )

    w, h, ch = 10, 6, 4
    px = _pattern(w, h, ch, seed=3)
    payload = encode_png(w, h, ch, px)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    out = resize_media(df, width=4, height=4).collect()[0]
    assert (out.src_width, out.src_height) == (w, h)
    assert out.byte_len == 4 * 4 * ch
    assert out.out_fmt == "png"
    # output is a spec-valid PNG carrying exactly the resampled pixels
    from trisk_datawrangle_spark.llm.multimodal import decode_png

    assert decode_png(bytes(out.payload)) == (
        4, 4, ch, resample_nearest(w, h, ch, px, 4, 4)
    )


# ----------------------------------------------------------- GIF LZW


def _lzw_encode_literal(indices, min_code_size):
    """Minimal spec-valid LZW stream: emit every pixel as a LITERAL
    code at width min_code_size+1, with a CLEAR before the table
    would force a width change — decoders must handle the resets."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    bits = []

    def emit(code):
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    next_code = eoi + 1
    for ix in indices:
        emit(ix)
        # each literal-after-prev adds one table entry on the
        # decoder side; reset before the decoder's width would grow
        next_code += 1
        if next_code >= (1 << width) - 1:
            emit(clear)
            next_code = eoi + 1
    emit(eoi)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i:i + 8]):
            byte |= b << j
        data.append(byte)
    return bytes(data)


def _gif_payload(w, h, palette, indices, interlaced=False,
                 min_code_size=None):
    import math

    n = len(palette) // 3
    gct_bits = max(1, math.ceil(math.log2(n)))
    mcs = min_code_size or max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (gct_bits - 1), 0, 0])
    out += palette + b"\x00" * (3 * ((1 << gct_bits) - n))
    # a comment extension block — decoders must skip it
    out += b"\x21\xfe\x05hello\x00"
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0])
    out += bytes([mcs])
    data = _lzw_encode_literal(indices, mcs)
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_palette_and_skip_extension():
    from trisk_datawrangle_spark.llm.multimodal import decode_gif

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    w, h = 5, 3
    indices = [(x + y) % 4 for y in range(h) for x in range(w)]
    got = decode_gif(_gif_payload(w, h, palette, indices))
    assert got is not None
    gw, gh, ch, px = got
    assert (gw, gh, ch) == (w, h, 3)
    for i, ix in enumerate(indices):
        assert px[i * 3:i * 3 + 3] == palette[ix * 3:ix * 3 + 3]


def test_gif_decode_interlaced_deweave():
    from trisk_datawrangle_spark.llm.multimodal import decode_gif

    palette = bytes(
        b for v in range(8) for b in (v * 30, 255 - v * 30, v)
    )
    w, h = 4, 11  # >8 rows so all four interlace passes occur
    indices = [(3 * x + y) % 8 for y in range(h) for x in range(w)]
    # interlaced storage order: rows 0,8 / 4 / 2,6,10 / 1,3,5,7,9
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = []
    for y in order:
        stored.extend(indices[y * w:(y + 1) * w])
    got = decode_gif(
        _gif_payload(w, h, palette, stored, interlaced=True)
    )
    assert got is not None
    gw, gh, ch, px = got
    assert (gw, gh, ch) == (w, h, 3)
    for i, ix in enumerate(indices):
        assert px[i * 3:i * 3 + 3] == palette[ix * 3:ix * 3 + 3]


def test_gif_decode_rejects_truncated_and_header_only():
    from trisk_datawrangle_spark.llm.multimodal import decode_gif

    palette = bytes([1, 2, 3, 4, 5, 6])
    good = _gif_payload(3, 2, palette, [0, 1, 0, 1, 0, 1])
    assert decode_gif(good) is not None
    assert decode_gif(good[:20]) is None
    assert decode_gif(b"GIF89a" + b"\x03\x00\x02\x00\x00\x00\x00") is None


def test_resize_media_resamples_gif_too(spark):
    from trisk_datawrangle_spark.llm.multimodal import (
        decode_gif,
        resample_nearest,
        resize_media,
    )

    palette = bytes([250, 0, 0, 0, 250, 0, 0, 0, 250, 120, 120, 120])
    w, h = 8, 6
    indices = [(x // 2 + y // 3) % 4 for y in range(h) for x in range(w)]
    payload = _gif_payload(w, h, palette, indices)
    _, _, _, px = decode_gif(payload)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    out = resize_media(df, width=4, height=3).collect()[0]
    assert (out.src_width, out.src_height) == (w, h)
    assert out.byte_len == 4 * 3 * 3
    assert out.out_fmt == "png"
    from trisk_datawrangle_spark.llm.multimodal import decode_png

    assert decode_png(bytes(out.payload)) == (
        4, 3, 3, resample_nearest(w, h, 3, px, 4, 3)
    )


def test_gif_decode_code_width_growth():
    """A literal stream with NO mid-stream clears forces the decoder
    to grow the code width in lockstep with its table — the variable-
    width path the clear-heavy encoder never exercises."""
    from trisk_datawrangle_spark.llm.multimodal import decode_gif

    palette = bytes([10, 0, 0, 0, 10, 0, 0, 0, 10, 7, 7, 7])
    w, h = 10, 6  # 60 pixels: table passes 8 and 16 -> width 3->4->5
    indices = [(x * 3 + y) % 4 for y in range(h) for x in range(w)]
    mcs, clear, eoi = 2, 4, 5
    width, bits = mcs + 1, []

    def emit(code):
        nonlocal width
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    next_code = eoi + 1
    first = True
    for ix in indices:
        emit(ix)
        if first:
            first = False
        else:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    emit(eoi)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i:i + 8]):
            byte |= b << j
        data.append(byte)
    out = bytearray(b"GIF89a" + w.to_bytes(2, "little")
                    + h.to_bytes(2, "little") + bytes([0x81, 0, 0])
                    + palette + b"\x2c" + b"\x00\x00\x00\x00"
                    + w.to_bytes(2, "little") + h.to_bytes(2, "little")
                    + b"\x00" + bytes([mcs]))
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    got = decode_gif(bytes(out))
    assert got is not None
    gw, gh, ch, px = got
    assert (gw, gh, ch) == (w, h, 3)
    for i, ix in enumerate(indices):
        assert px[i * 3:i * 3 + 3] == palette[ix * 3:ix * 3 + 3]
