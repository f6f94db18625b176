"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch
shape, partition sizing. Since r8 ALL THREE image formats decode
real pixels, stdlib(+numpy)-only: :func:`decode_png` inflates IDAT
(zlib) and reverses all five scanline filters (spec §9, incl.
Paeth) with :func:`encode_png` writing spec-valid streams (true
CRCs); :func:`decode_gif` LZW-decodes the first frame (variable
code width, interlace de-weave, palette lookup); ``llm/jpeg.py``
decodes baseline JPEG (Huffman + vectorized IDCT, 4:4:4/4:2:0/
4:2:2, restart markers, byte unstuffing) and encodes it for
roundtrip testing. Audio and video are real too, in their own
modules: ``llm/audio.py`` (RIFF/PCM WAV codec, m6-gated) and
``llm/video.py`` (AVI/MJPEG container walk + per-frame JPEG
decode, m7-gated). Progressive JPEG (SOF2) decodes for real too
since r9 (``llm/jpeg.py`` Annex G path, m8-gated).
:func:`resize_media` genuinely resamples (nearest-neighbor) any
payload :func:`decode_pixels` accepts and re-encodes the result as
a spec-valid PNG; the truncate/pad fallback is reserved for
genuinely undecodable bytes (arithmetic-coded JPEG, 12-bit,
non-image payloads).

Scale notes: media rows are fat (MBs) — ``mapInPandas`` streams Arrow
batches so memory stays bounded by batch size, not partition size;
set ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 64)
for media tables, and size input partitions by bytes
(``spark.sql.files.maxPartitionBytes``), never by row count.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len int, sha256 string, width int, height int, "
    "fmt string, ok boolean"
)

#: PNG file signature (public spec, RFC 2083 §12.11).
PNG_SIG = b"\x89PNG\r\n\x1a\n"


def with_binary_payload(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of a string
    column; in production: the raw media bytes read from object
    storage)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "utf-8"))


def png_payload(
    text_col: str, width_col, height_col
) -> "F.Column":
    """A REAL PNG byte stream as a Column: signature + IHDR chunk
    (big-endian dims, 8-bit RGBA, zeroed CRC — parsed, not
    validated) followed by the text bytes as stand-in pixel data.
    Built entirely from JVM expressions (hex assembly → to_binary),
    so test fixtures get genuinely parseable image headers without
    any media library — and a SQL oracle can reconstruct the exact
    bytes (unhex of the same hex assembly)."""
    def be32(c) -> "F.Column":
        return F.lpad(F.hex(F.col(c) if isinstance(c, str) else c), 8, "0")

    header_hex = F.concat(
        F.lit(PNG_SIG.hex().upper()),   # signature
        F.lit("0000000D49484452"),      # IHDR length=13 + type
        be32(width_col),
        be32(height_col),
        F.lit("0806000000"),            # bit depth 8, color 6, c/f/i
        F.lit("00000000"),              # CRC (unchecked by parsers)
    )
    return F.concat(
        F.to_binary(header_hex, F.lit("hex")),
        F.encode(F.col(text_col), "utf-8"),
    )


#: Bytes per pixel for the PNG color types the real decoder handles
#: (spec §11.2.2: 0=gray, 2=RGB, 4=gray+alpha, 6=RGBA; 8-bit only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """REAL PNG pixel decode, stdlib-only (PNG spec / RFC 2083):
    walk the chunk stream, concatenate IDAT, ``zlib.decompress``,
    then reverse the per-scanline filter (types 0 None / 1 Sub /
    2 Up / 3 Average / 4 Paeth — spec §9). Returns
    ``(width, height, channels, raw_pixels)`` with ``raw_pixels``
    row-major, ``channels`` bytes per pixel, or None when the
    payload is not a decodable 8-bit non-interlaced PNG (bad
    signature, non-zlib pixel data — e.g. the header-only test
    fixtures — 16-bit, palette, or interlaced streams).

    Driver-side cost note: this is a per-row Python kernel — it runs
    ONLY inside Arrow-batched ``mapInPandas`` workers on fat media
    rows where per-byte Python work is the task anyway (same tier as
    a PIL call), never in a row-at-a-time Spark UDF."""
    import zlib

    if len(payload) < 45 or payload[:8] != PNG_SIG:
        return None
    pos, width, height, depth, ctype, interlace = 8, 0, 0, 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos:pos + 4], "big")
        ctag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            return None
        if ctag == b"IHDR":
            if clen != 13:
                return None
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, ctype = body[8], body[9]
            interlace = body[12]
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc
    if (
        not width or not height or depth != 8 or interlace != 0
        or ctype not in _PNG_CHANNELS or not idat
    ):
        return None
    ch = _PNG_CHANNELS[ctype]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        return None
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            return None
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)


def encode_png(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Spec-valid PNG encode, stdlib-only: filter 0 scanlines,
    one zlib IDAT, REAL crc32 on every chunk — the exact inverse of
    :func:`decode_png` (roundtrip property-tested). ``channels``
    picks the color type (1 gray / 2 gray+alpha / 3 RGB / 4 RGBA)."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"encode_png: {len(pixels)} pixel bytes != "
            f"{stride}*{height}"
        )
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride]
        for y in range(height)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """REAL GIF pixel decode, stdlib-only (GIF89a spec): logical
    screen descriptor, global/local color table, LZW-decompressed
    index stream of the FIRST image, palette lookup to RGB,
    interlace de-weave when flagged. Returns
    ``(width, height, 3, rgb_pixels)`` row-major, or None when the
    payload is not a decodable GIF (bad signature, missing color
    table, truncated/invalid LZW). Same cost tier as
    :func:`decode_png` — per-row Python for Arrow-batched media
    kernels only."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = payload[10]
    gct_size = 2 << (flags & 0x07)
    pos = 13
    gct = None
    if flags & 0x80:
        gct = payload[pos:pos + 3 * gct_size]
        if len(gct) < 3 * gct_size:
            return None
        pos += 3 * gct_size
    # skip extension blocks to the first image descriptor
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x2C:  # image descriptor
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x3B:  # trailer before any image
            return None
        else:
            return None
    if pos + 10 > len(payload) or payload[pos] != 0x2C:
        return None
    iw = int.from_bytes(payload[pos + 5:pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7:pos + 9], "little")
    iflags = payload[pos + 9]
    pos += 10
    table = gct
    if iflags & 0x80:  # local color table
        lct_size = 2 << (iflags & 0x07)
        table = payload[pos:pos + 3 * lct_size]
        if len(table) < 3 * lct_size:
            return None
        pos += 3 * lct_size
    if table is None or not iw or not ih:
        return None
    interlaced = bool(iflags & 0x40)
    if pos >= len(payload):
        return None
    min_code_size = payload[pos]
    pos += 1
    if not 2 <= min_code_size <= 11:
        return None
    data = bytearray()
    while pos < len(payload) and payload[pos]:
        n = payload[pos]
        data += payload[pos + 1:pos + 1 + n]
        pos += 1 + n
    # LZW decode (spec appendix F): variable code width, CLEAR
    # resets the table, EOI ends the stream
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def fresh_table():
        return {i: bytes([i]) for i in range(clear)}

    table_d = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    need = iw * ih
    while len(out) < need:
        code = read_code(width)
        if code is None:
            return None
        if code == clear:
            table_d = fresh_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table_d.get(code)
            if entry is None:
                return None
        elif code in table_d:
            entry = table_d[code]
            table_d[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table_d[next_code] = entry
            next_code += 1
        else:
            return None
        out.extend(entry)
        if next_code == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) < need:
        return None
    idx = out[:need]
    if interlaced:
        rows = [idx[y * iw:(y + 1) * iw] for y in range(ih)]
        wove: list[list[int]] = [[] for _ in range(ih)]
        order = (
            list(range(0, ih, 8)) + list(range(4, ih, 8))
            + list(range(2, ih, 4)) + list(range(1, ih, 2))
        )
        for src_row, dst_y in enumerate(order):
            wove[dst_y] = rows[src_row]
        idx = [p for row in wove for p in row]
    n_colors = len(table) // 3
    px = bytearray(iw * ih * 3)
    for i, ci in enumerate(idx):
        if ci >= n_colors:
            return None
        px[i * 3:i * 3 + 3] = table[ci * 3:ci * 3 + 3]
    return iw, ih, 3, bytes(px)


def decode_pixels(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """Dispatch to the real pixel decoders this engine ships — PNG
    (:func:`decode_png`), GIF (:func:`decode_gif`), baseline JPEG
    and progressive JPEG (``llm/jpeg.py`` — stdlib+numpy
    Huffman/DCT, 4:4:4/4:2:0, restart markers, Annex G progressive
    scans) — returning ``(width, height, channels, raw_pixels)`` or
    None for payloads none of them accept (arithmetic-coded or
    12-bit JPEG, audio, video — swap in PIL / pyav at this one call
    site)."""
    got = decode_png(payload) or decode_gif(payload)
    if got is not None:
        return got
    if len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        from trisk_datawrangle_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload)
    return None


def resample_nearest(
    width: int, height: int, channels: int, pixels: bytes,
    new_w: int, new_h: int,
) -> bytes:
    """Nearest-neighbor resample of raw row-major pixels — the real
    kernel :func:`resize_media` applies to decodable payloads.
    Pure-python but O(out_pixels); vectorize with numpy if media
    resizing ever becomes the hot stage (the Arrow batch boundary
    does not change)."""
    out = bytearray(new_w * new_h * channels)
    for oy in range(new_h):
        sy = min(oy * height // new_h, height - 1)
        src_row = sy * width * channels
        dst_row = oy * new_w * channels
        for ox in range(new_w):
            sx = min(ox * width // new_w, width - 1)
            s = src_row + sx * channels
            d = dst_row + ox * channels
            out[d:d + channels] = pixels[s:s + channels]
    return bytes(out)


def parse_image_dims(payload: bytes) -> tuple[int, int, str] | None:
    """Pure-Python image header parse — REAL metadata, no media
    libs: PNG IHDR (spec §11.2.2), JPEG SOF0-SOF3 frame headers
    (ITU T.81 §B.2.2), GIF87a/89a logical screen descriptor.
    Returns (width, height, fmt), or None for unrecognized bytes."""
    if (
        len(payload) >= 24
        and payload[:8] == PNG_SIG
        and payload[12:16] == b"IHDR"
    ):
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
            "png",
        )
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload) and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seglen < 2:
                break
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                    "jpeg",
                )
            i += 2 + seglen
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
            "gif",
        )
    return None


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Fallback for payloads :func:`parse_image_dims` does not
    recognize (this container ships no full decoders): deterministic
    fake dimensions from the payload hash — stable, testable
    plumbing a real decoder (PIL / pyav) would replace."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024


def decode_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode/feature-extract over Arrow batches (``mapInPandas``).

    Emits (id, byte_len, sha256, width, height, fmt, ok). byte_len
    and sha256 are real; width/height/fmt come from the REAL header
    parse (:func:`parse_image_dims`) when the payload is a
    recognized image — ``ok`` is True exactly then — and fall back
    to the deterministic stub with ``fmt='unknown'`` otherwise."""
    import pandas as pd

    # fat binary rows + per-row Python decode: parallelism must come
    # from partitioning, not file splits (media files are few & large)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def meta(b: bytes) -> tuple[int, int, str, bool]:
        parsed = parse_image_dims(b)
        if parsed is not None:
            return (*parsed, True)
        return (*_decode_stub(b), "unknown", False)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # columnar (Series.map) rather than a python row loop:
            # per-row DataFrame indexing dominates at wide batches
            payloads = pdf[payload_col].map(bytes)
            dims = payloads.map(meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "fmt": dims.map(lambda t: t[2]),
                    "ok": dims.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_SCHEMA)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize over Arrow batches — REAL where the payload is real:
    a payload :func:`decode_pixels` accepts (PNG, GIF, baseline
    JPEG) is genuinely decoded, nearest-neighbor resampled to
    (width, height) (:func:`resample_nearest`) and RE-ENCODED as a
    spec-valid PNG (:func:`encode_png`) — normalized-format-out, the
    shape a thumbnail/training-res stage actually emits
    (``out_fmt='png'``, ``byte_len = width*height*channels`` =
    the DECODED pixel bytes, the number downstream partition
    planning uses; the PNG's encoded size varies with content).
    Anything no shipped decoder accepts (arithmetic-coded JPEG,
    audio/video, header-only fixtures) takes the LABELED fallback —
    ``out_fmt='raw'``, a payload of exactly ``width*height`` bytes
    (truncate / zero-pad) — keeping the batch-shape contract
    testable without decoders for those formats.

    The Spark-side contract holds for both paths: binary-in/
    binary-out, output rows fatter or thinner than input by a known
    factor — so downstream partition sizing can be planned
    (``target_bytes ≈ rows × width × height × channels``). Keeps the
    input id for joining resized payloads back to source metadata,
    and carries the SOURCE dimensions parsed from the real image
    header (:func:`parse_image_dims`; NULL when the payload is not a
    recognized image) — a resample needs the source geometry, so the
    plumbing must prove it flows through."""
    import pandas as pd

    target = width * height

    def one(b: bytes) -> tuple[bytes, int, str]:
        px = decode_pixels(b)
        if px is not None:
            sw, sh, ch, raw = px
            resampled = resample_nearest(sw, sh, ch, raw, width, height)
            return (
                encode_png(width, height, ch, resampled),
                width * height * ch,
                "png",
            )
        return b[:target].ljust(target, b"\0"), target, "raw"

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf[payload_col].map(bytes)
            src = payloads.map(parse_image_dims)
            done = payloads.map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": done.map(lambda t: t[0]),
                    "width": width,
                    "height": height,
                    "byte_len": done.map(lambda t: t[1]).astype(
                        "int32"
                    ),
                    "src_width": src.map(
                        lambda t: t[0] if t else None
                    ).astype("Int32"),
                    "src_height": src.map(
                        lambda t: t[1] if t else None
                    ).astype("Int32"),
                    "out_fmt": done.map(lambda t: t[2]),
                }
            )

    out_schema = (
        "doc_id long, payload binary, width int, height int, "
        "byte_len int, src_width int, src_height int, out_fmt string"
    )
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    return df.select(id_col, payload_col).mapInPandas(resize, out_schema)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature extraction: payload → unit-norm ``array<float>``
    embedding, vectorized over Arrow batches.

    The STUB derives features from the sha256 digest (deterministic,
    library-free); a real extractor (CLIP / wav2vec) drops into the
    same contract. Output matches the ``embeddings`` table shape
    (id + ``array<float>``), so the result feeds the similarity
    stack directly — see ``ivf_topk`` / ``cosine_topk`` — letting
    dedup-by-embedding run end-to-end on multimodal corpora."""
    import numpy as np
    import pandas as pd

    if not 1 <= dim <= 32:
        raise ValueError("stub features come from a 32-byte digest")

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf[payload_col].map(bytes)
            mat = np.array(
                [
                    np.frombuffer(
                        hashlib.sha256(b).digest()[:dim], dtype=np.uint8
                    ).astype(np.float64)
                    - 127.5
                    for b in payloads
                ]
            )
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "embedding": [r.astype(np.float32) for r in mat],
                }
            )

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    return df.select(id_col, payload_col).mapInPandas(
        feats, "vec_id long, embedding array<float>"
    )


def frame_sample_plan(df: DataFrame, payload_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index
    list per payload; a real decoder would yield actual frames. The
    fan-out happens *after* repartitioning so one fat row never pins
    a task. Payloads shorter than ``every_n`` still sample frame 0
    (every non-empty video yields ≥1 frame); EMPTY payloads yield no
    rows — a phantom frame for a zero-byte video breaks downstream
    per-frame decodes."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    n_frames = (F.length(F.col(payload_col)) / every_n).cast("int")
    return df.filter(F.length(F.col(payload_col)) > 0).withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
    )
