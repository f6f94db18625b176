"""Baseline JPEG codec, stdlib + numpy only (ITU T.81 / JFIF public
spec) — the pixel tier behind ``multimodal.decode_pixels`` for JPEG
payloads.

Decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
full T.81 Annex G Huffman path: spectral selection, successive
approximation, EOB runs, interleaved/non-interleaved DC scans),
8-bit samples, 1- or 3-component scans, 4:4:4 / 4:2:0 / 4:2:2 (any
sampling the MCU grammar allows), restart markers, byte-stuffing.
Arithmetic coding and 12-bit precision return None — the caller
falls back to header geometry.

Encoder: 4:4:4/4:2:0 baseline with the T.81 Annex K example
quantization and Huffman tables (the tables virtually every
camera/library ships), quality-scaled per the public IJG recipe,
plus a progressive encoder emitting the standard libjpeg-style scan
script (decodes bit-exactly to the baseline coefficients). Exists so
both decoders are roundtrip-testable without any image library in
the container, and doubles as a real (if unoptimized) sink for raw
pixel columns.

Cost tier: per-row Python + numpy block math — the Arrow-batched
``mapInPandas`` media tier ONLY (same contract as a PIL call), never
a row-at-a-time Spark UDF. The DCT/IDCT is a vectorized numpy
matmul over all blocks at once; the entropy loop is per-symbol
Python, which is the honest cost of a pure-Python Huffman stream.
"""

from __future__ import annotations

#: T.81 Figure A.6 zig-zag order: zz[i] = (row, col) index in the
#: 8x8 block for the i-th coefficient of the serialized stream.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance / K.2 chrominance quantization tables
#: (natural order after de-zigzag below; stored here in zigzag).
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
    92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
    100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix():
    import numpy as np

    # orthonormal DCT-II basis: T @ block @ T.T = coefficients
    n = 8
    t = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            t[k, i] = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    t *= np.sqrt(2.0 / n)
    t[0] *= np.sqrt(0.5)
    return t


# ------------------------------------------------------------------ #
# decoder                                                             #
# ------------------------------------------------------------------ #


class _BitReader:
    """MSB-first entropy-stream reader with T.81 byte unstuffing
    (0xFF 0x00 -> 0xFF). Stops at any real marker; restart markers
    are consumed explicitly by the MCU loop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                    self.pos += 2
                else:
                    return self.nbits > 0  # real marker: stop
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        if self.nbits == 0:
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_to_marker(self) -> int | None:
        """Discard partial byte, expect an RSTn marker; return n or
        None."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return d[p + 1] - 0xD0
            p += 1
        return None


def _build_huff(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> value lookup per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        b = r.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        v = table.get((length, code))
        if v is not None:
            return v
    return None


def _extend(v: int, size: int) -> int:
    # T.81 F.12: receive+extend — a `size`-bit magnitude whose top
    # bit 0 means negative
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG to ``(width, height, channels,
    pixels)`` (channels 1 gray / 3 RGB, row-major bytes) or None if
    the stream is not a decodable baseline JPEG."""
    import numpy as np

    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None
        marker = d[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        seglen = int.from_bytes(d[pos + 2:pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > len(d):
            return None
        body = d[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(body):
                    return None
                if pq:
                    vals = [
                        int.from_bytes(body[i + 2 * j:i + 2 * j + 2],
                                       "big")
                        for j in range(64)
                    ]
                else:
                    vals = list(body[i:i + 64])
                i += n
                tbl = np.zeros(64)
                for j, z in enumerate(_ZIGZAG):
                    tbl[z] = vals[j]
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if len(vals) < n:
                    return None
                i += 17 + n
                tbl = _build_huff(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            prec = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if prec != 8 or nc not in (1, 3) or not w or not h:
                return None
            if len(body) < 6 + 3 * nc:
                return None
            comps = []
            for ci in range(nc):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                comps.append(
                    {
                        "id": cid,
                        "h": hv >> 4,
                        "v": hv & 0x0F,
                        "tq": body[8 + 3 * ci],
                    }
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:  # SOF2: hand the WHOLE stream to the
            # progressive path (separate state machine; the baseline
            # decoder above stays untouched)
            return decode_jpeg_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline, non-progressive frame types
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            if len(body) < 1:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None  # selectors + Ss/Se/AhAl must fit
            sel = {}
            for si in range(ns):
                sel[body[1 + 2 * si]] = (
                    body[2 + 2 * si] >> 4,
                    body[2 + 2 * si] & 0x0F,
                )
            scan_comps = []
            for c in frame["comps"]:
                if c["id"] not in sel:
                    return None
                td, ta = sel[c["id"]]
                if (
                    td not in huff_dc or ta not in huff_ac
                    or c["tq"] not in qt
                ):
                    return None
                scan_comps.append(
                    {**c, "dc": huff_dc[td], "ac": huff_ac[ta],
                     "q": qt[c["tq"]]}
                )
            return _decode_scan(
                d, pos + 2 + seglen, frame, scan_comps,
                restart_interval,
            )
        # APPn/COM/others: skip
        pos += 2 + seglen
    return None


def _decode_scan(d, pos, frame, comps, restart_interval):
    import numpy as np

    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        return None
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    r = _BitReader(d, pos)
    tmat = _dct_matrix()
    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8)))
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                if r.align_to_marker() is None:
                    return None
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(r, c, pred, ci)
                        if blk is None:
                            return None
                        deq = blk * c["q"]
                        px = tmat.T @ deq @ tmat  # inverse DCT
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        # upsample to full resolution (nearest — the common fast
        # path; swap bilinear here if smoother chroma is wanted)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, g.tobytes()
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=-1)
    rgb = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _decode_block(r, c, pred, ci):
    import numpy as np

    coef = np.zeros((8, 8))
    t = _huff_decode(r, c["dc"])
    if t is None or t > 11:
        return None
    bits = r.read_bits(t) if t else 0
    if bits is None:
        return None
    pred[ci] += _extend(bits, t)
    coef[0, 0] = pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(r, c["ac"])
        if rs is None:
            return None
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            return None
        bits = r.read_bits(size)
        if bits is None:
            return None
        z = _ZIGZAG[k]
        coef[z // 8, z % 8] = _extend(bits, size)
        k += 1
    return coef


# ------------------------------------------------------------------ #
# encoder                                                             #
# ------------------------------------------------------------------ #


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _enc_table(bits, values):
    """value -> (code, length) per T.81 C.2 (inverse of decode)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _scale_qt(zz_table, quality: int):
    import numpy as np

    # public IJG quality scaling
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    out = np.zeros(64, dtype=np.int32)
    for i, v in enumerate(zz_table):
        out[i] = min(255, max(1, (v * s + 50) // 100))
    return out


def _csize(v: int) -> int:
    a, n = abs(v), 0
    while a:
        a >>= 1
        n += 1
    return n


def encode_jpeg(
    width: int, height: int, channels: int, pixels: bytes,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encode (T.81 Annex K tables, IJG quality
    scaling). ``channels`` 1 (gray) or 3 (RGB row-major);
    ``subsampling`` "444" or "420" (2x2 chroma mean); a nonzero
    ``restart_interval`` writes DRI + RSTn markers every that many
    MCUs — primarily so the decoder's restart path is
    roundtrip-testable without an external encoder."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("encode_jpeg: channels must be 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError("encode_jpeg: subsampling must be 444/420")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"encode_jpeg: {len(pixels)} bytes != "
            f"{width}*{height}*{channels}"
        )
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[..., 0]]

    sub = subsampling == "420" and channels == 3
    if sub:
        # chroma planes: 2x2 mean at half resolution (pad to even)
        half = []
        for p in planes[1:]:
            pe = np.pad(
                p,
                ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                mode="edge",
            )
            half.append(
                (pe[0::2, 0::2] + pe[1::2, 0::2]
                 + pe[0::2, 1::2] + pe[1::2, 1::2]) / 4.0
            )
        planes = [planes[0]] + half
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1)] * channels

    qz_l = _scale_qt(_QT_LUMA, quality)
    qz_c = _scale_qt(_QT_CHROMA, quality)

    def nat(zz):
        out = np.zeros(64)
        for j, z in enumerate(_ZIGZAG):
            out[z] = zz[j]
        return out.reshape(8, 8)

    qmats = [nat(qz_l)] + [nat(qz_c)] * (channels - 1)
    tmat = _dct_matrix()
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    dc_tabs = [_enc_table(*_HT_DC_LUMA)] + [
        _enc_table(*_HT_DC_CHROMA)
    ] * (channels - 1)
    ac_tabs = [_enc_table(*_HT_AC_LUMA)] + [
        _enc_table(*_HT_AC_CHROMA)
    ] * (channels - 1)

    # pre-quantize every block of every plane on its MCU-aligned
    # grid (vectorized einsum DCT over all blocks at once)
    qblocks = []
    for p, qm, (fh, fv) in zip(planes, qmats, factors):
        gh, gw = mcus_y * fv * 8, mcus_x * fh * 8
        pad = np.pad(
            p,
            ((0, gh - p.shape[0]), (0, gw - p.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = pad.reshape(gh // 8, 8, gw // 8, 8).transpose(
            0, 2, 1, 3
        )
        coefs = np.einsum("ki,yxij,lj->yxkl", tmat, blocks, tmat)
        qblocks.append(np.rint(coefs / qm).astype(np.int64))

    wtr = _BitWriter()
    pred = [0] * channels

    def put_block(ci: int, blk) -> None:
        dc = int(blk[0, 0])
        diff = dc - pred[ci]
        pred[ci] = dc
        size = _csize(diff)
        code, length = dc_tabs[ci][size]
        wtr.write(code, length)
        if size:
            mag = diff if diff >= 0 else diff + (1 << size) - 1
            wtr.write(mag & ((1 << size) - 1), size)
        zz = [int(blk[z // 8, z % 8]) for z in _ZIGZAG[1:]]
        run = 0
        last_nz = -1
        for i, v in enumerate(zz):
            if v:
                last_nz = i
        for i in range(last_nz + 1):
            v = zz[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tabs[ci][0xF0]  # ZRL
                wtr.write(code, length)
                run -= 16
            size = _csize(v)
            code, length = ac_tabs[ci][(run << 4) | size]
            wtr.write(code, length)
            mag = v if v >= 0 else v + (1 << size) - 1
            wtr.write(mag & ((1 << size) - 1), size)
            run = 0
        if last_nz < 62:
            code, length = ac_tabs[ci][0x00]  # EOB
            wtr.write(code, length)

    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * channels
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        put_block(
                            ci,
                            qblocks[ci][my * fv + by, mx * fh + bx],
                        )
            mcu_count += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(
            2, "big"
        ) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in qz_l))
    if channels == 3:
        out += seg(0xDB, bytes([1]) + bytes(int(v) for v in qz_c))
    sof = bytearray([8])
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(channels)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))

    def dht(tc, th, tab):
        bits, vals = tab
        return seg(
            0xC4,
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals),
        )

    out += dht(0, 0, _HT_DC_LUMA) + dht(1, 0, _HT_AC_LUMA)
    if channels == 3:
        out += dht(0, 1, _HT_DC_CHROMA) + dht(1, 1, _HT_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytearray([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ #
# progressive (T.81 Annex G: spectral selection + successive         #
# approximation) — a SEPARATE path so the proven baseline decoder    #
# above is byte-for-byte untouched; shares the bit/Huffman helpers.  #
# ------------------------------------------------------------------ #


def decode_jpeg_progressive(payload: bytes):
    """Decode a progressive JPEG (SOF2, Huffman) to ``(width,
    height, channels, pixels)`` or None. Implements the full T.81
    §G.1.2 scan grammar: interleaved/non-interleaved DC first +
    refinement scans, per-component AC band scans with EOB-run
    coding, and AC successive-approximation refinement (correction
    bits, zero-history runs). Coefficients accumulate across scans
    in per-component block arrays; dequantization + IDCT run once at
    EOI. Arithmetic coding and 12-bit precision return None."""
    import numpy as np

    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coefs = None  # per comp: (blocks_y, blocks_x, 64) natural order
    restart_interval = 0
    pos = 2
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            return None
        if d[pos + 1] == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        marker = d[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI: reconstruct
            break
        if pos + 4 > len(d):
            return None
        seglen = int.from_bytes(d[pos + 2:pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > len(d):
            return None
        body = d[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT (same grammar as baseline)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                if i + n > len(body):
                    return None
                if pq:
                    vals = [
                        int.from_bytes(body[i + 2 * j:i + 2 * j + 2],
                                       "big")
                        for j in range(64)
                    ]
                else:
                    vals = list(body[i:i + 64])
                i += n
                tbl = np.zeros(64)
                for j, z in enumerate(_ZIGZAG):
                    tbl[z] = vals[j]
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if len(vals) < n:
                    return None
                i += 17 + n
                tbl = _build_huff(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC2:  # SOF2 progressive frame
            if len(body) < 6:
                return None
            prec = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if prec != 8 or nc not in (1, 3) or not w or not h:
                return None
            if len(body) < 6 + 3 * nc:
                return None
            comps = []
            for ci in range(nc):
                hv = body[7 + 3 * ci]
                comps.append(
                    {
                        "id": body[6 + 3 * ci],
                        "h": hv >> 4,
                        "v": hv & 0x0F,
                        "tq": body[8 + 3 * ci],
                    }
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
                return None
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            frame = {
                "w": w, "h": h, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "mcus_x": mcus_x, "mcus_y": mcus_y,
            }
            coefs = [
                np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64),
                    dtype=np.int64,
                )
                for c in comps
            ]
            # per-component DC predictors persist only within a scan
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # only SOF2 in this path
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — one progressive scan
            if frame is None or coefs is None:
                return None
            if len(body) < 1:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            scan = []
            for si in range(ns):
                cid = body[1 + 2 * si]
                td = body[2 + 2 * si] >> 4
                ta = body[2 + 2 * si] & 0x0F
                idx = next(
                    (i for i, c in enumerate(frame["comps"])
                     if c["id"] == cid),
                    None,
                )
                if idx is None:
                    return None
                scan.append((idx, td, ta))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            new_pos = _progressive_scan(
                d, pos + 2 + seglen, frame, coefs, scan,
                huff_dc, huff_ac, ss, se, ah, al,
                restart_interval,
            )
            if new_pos is None:
                return None
            pos = new_pos
            continue
        pos += 2 + seglen
    if frame is None or coefs is None:
        return None
    return _progressive_reconstruct(frame, coefs, qt)


def _progressive_scan(
    d, pos, frame, coefs, scan, huff_dc, huff_ac,
    ss, se, ah, al, restart_interval,
):
    """Run one SOS's entropy segment, accumulating into ``coefs``.
    Returns the byte position of the next marker, or None on a
    malformed stream. Grammar guards per T.81 §B.2.3/§G.1: DC scans
    have Ss=Se=0 and may interleave; AC scans are single-component
    with 1 <= Ss <= Se <= 63; refinement has Ah = Al + 1."""
    if ss == 0 and se != 0 and len(scan) > 1:
        return None  # interleaved scans must be DC-only
    if ss > se or se > 63 or (ss == 0) != (se == 0):
        return None
    if ss > 0 and len(scan) != 1:
        return None
    if ah and ah != al + 1:
        return None
    r = _BitReader(d, pos)
    comps = frame["comps"]
    if ss == 0:
        tabs = []
        for idx, td, ta in scan:
            if ah == 0 and td not in huff_dc:
                return None
            tabs.append(huff_dc.get(td))
        ok = _scan_dc(
            r, frame, coefs, scan, tabs, ah, al, restart_interval
        )
    else:
        idx, td, ta = scan[0]
        if ta not in huff_ac:
            return None
        ok = _scan_ac(
            r, frame, coefs, idx, huff_ac[ta], ss, se, ah, al,
            restart_interval,
        )
    if not ok:
        return None
    # skip to the next segment marker: stuffed FF 00 pairs and any
    # stray RSTn belong to the entropy region; FF FF fill bytes are
    # handled by the caller's fill-skip
    p = r.pos
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] not in (0x00,) and not (
            0xD0 <= d[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _scan_dc(r, frame, coefs, scan, tabs, ah, al, restart_interval):
    pred = [0] * len(scan)
    interleaved = len(scan) > 1

    def one_block(si, by, bx):
        idx = scan[si][0]
        blk = coefs[idx][by, bx]
        if ah == 0:
            t = _huff_decode(r, tabs[si])
            if t is None or t > 11:
                return False
            bits = r.read_bits(t) if t else 0
            if bits is None:
                return False
            pred[si] += _extend(bits, t)
            blk[0] = pred[si] << al
        else:
            bit = r.read_bit()
            if bit is None:
                return False
            if bit:
                blk[0] |= 1 << al
        return True

    if interleaved:
        mcu_count = 0
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    if r.align_to_marker() is None:
                        return False
                    for i in range(len(pred)):
                        pred[i] = 0
                for si, (idx, _, _) in enumerate(scan):
                    c = frame["comps"][idx]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            if not one_block(
                                si, my * c["v"] + by, mx * c["h"] + bx
                            ):
                                return False
                mcu_count += 1
        return True
    # non-interleaved DC: the component's own (unpadded) block grid
    idx = scan[0][0]
    c = frame["comps"][idx]
    cw = -(-frame["w"] * c["h"] // frame["hmax"])
    ch = -(-frame["h"] * c["v"] // frame["vmax"])
    bw, bh = -(-cw // 8), -(-ch // 8)
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                if r.align_to_marker() is None:
                    return False
                pred[0] = 0
            if not one_block(0, by, bx):
                return False
            count += 1
    return True


def _scan_ac(r, frame, coefs, idx, actab, ss, se, ah, al,
             restart_interval):
    c = frame["comps"][idx]
    cw = -(-frame["w"] * c["h"] // frame["hmax"])
    ch = -(-frame["h"] * c["v"] // frame["vmax"])
    bw, bh = -(-cw // 8), -(-ch // 8)
    eobrun = 0
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                if r.align_to_marker() is None:
                    return False
                eobrun = 0
            count += 1
            blk = coefs[idx][by, bx]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(r, actab)
                    if rs is None:
                        return False
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        extra = r.read_bits(run) if run else 0
                        if extra is None:
                            return False
                        eobrun = (1 << run) + extra - 1
                        break
                    k += run
                    if k > se:
                        return False
                    bits = r.read_bits(size)
                    if bits is None:
                        return False
                    blk[_ZIGZAG[k]] = _extend(bits, size) << al
                    k += 1
            else:
                eobrun = _refine_ac_block(
                    r, actab, blk, ss, se, al, eobrun
                )
                if eobrun is None:
                    return False
    return True


def _refine_ac_block(r, actab, blk, ss, se, al, eobrun):
    """AC successive-approximation refinement for ONE block
    (T.81 G.1.2.3): newly-significant coefficients arrive as
    ±(1<<Al) with a zero-history run length; already-significant
    ones consume correction bits; EOB runs cover whole blocks whose
    remaining coefficients only take correction bits. Returns the
    scan's EOB-run counter after this block (state owned by
    _scan_ac), or None on a malformed stream."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, actab)
            if rs is None:
                return None
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size:
                if size != 1:
                    return None  # refinement codes are ±1 only
                bit = r.read_bit()
                if bit is None:
                    return None
                val = p1 if bit else m1
            elif run != 15:
                extra = r.read_bits(run) if run else 0
                if extra is None:
                    return None
                eobrun = (1 << run) + extra
                break
            # advance over the band: correction bits on nonzero
            # history, count down `run` zero-history positions
            while k <= se:
                z = _ZIGZAG[k]
                if blk[z] != 0:
                    bit = r.read_bit()
                    if bit is None:
                        return None
                    if bit and not (blk[z] & p1):
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                blk[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if blk[z] != 0:
                bit = r.read_bit()
                if bit is None:
                    return None
                if bit and not (blk[z] & p1):
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_reconstruct(frame, coefs, qt):
    import numpy as np

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    tmat = _dct_matrix()
    out_planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]]  # natural-order flat 64
        arr = coefs[ci]  # (by, bx, 64) natural order
        nby, nbx = arr.shape[0], arr.shape[1]
        plane = np.zeros((nby * 8, nbx * 8))
        qm = q.reshape(8, 8)
        for by in range(nby):
            for bx in range(nbx):
                deq = arr[by, bx].astype(np.float64).reshape(8, 8) * qm
                # the LITERAL baseline-IDCT expression (_decode_scan):
                # byte-exact m8 parity must be structural, not a bet
                # on einsum and BLAS rounding identically
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    tmat.T @ deq @ tmat
                )
        plane = plane + 128.0
        ry = frame["vmax"] // c["v"]
        rx = frame["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, g.tobytes()
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=-1)
    rgb = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def encode_jpeg_progressive(
    width: int, height: int, channels: int, pixels: bytes,
    quality: int = 85,
    subsampling: str = "444",
) -> bytes:
    """Progressive JPEG encode (SOF2) with the standard
    libjpeg-style scan script — spectral selection AND successive
    approximation, so decoding every scan reproduces the baseline
    quantized coefficients BIT-EXACTLY (the m8 gate):

    - scan 1: DC of all components, interleaved, Al=1
    - luma AC 1-5 then 6-63 at Al=1; each chroma AC 1-63 at Al=1
    - DC refinement (Ah=1, Al=0), interleaved
    - per-component AC refinement 1-63 (Ah=1, Al=0)

    EOB runs are deliberately capped at one block (plain EOB per
    block) so the Annex K Huffman tables — which carry no EOBn>0
    symbols — stay valid; the decoder still handles arbitrary EOB
    runs from other encoders. Quantization, color transform, and
    block math mirror :func:`encode_jpeg` (duplicated on purpose:
    the proven baseline encoder stays byte-for-byte untouched)."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("encode_jpeg_progressive: channels 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError(
            "encode_jpeg_progressive: subsampling must be 444/420"
        )
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"encode_jpeg_progressive: {len(pixels)} bytes != "
            f"{width}*{height}*{channels}"
        )
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[..., 0]]
    sub = subsampling == "420" and channels == 3
    if sub:
        half = []
        for p in planes[1:]:
            pe = np.pad(
                p,
                ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                mode="edge",
            )
            half.append(
                (pe[0::2, 0::2] + pe[1::2, 0::2]
                 + pe[0::2, 1::2] + pe[1::2, 1::2]) / 4.0
            )
        planes = [planes[0]] + half
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1)] * channels

    qz_l = _scale_qt(_QT_LUMA, quality)
    qz_c = _scale_qt(_QT_CHROMA, quality)

    def nat(zz):
        out = np.zeros(64)
        for j, z in enumerate(_ZIGZAG):
            out[z] = zz[j]
        return out.reshape(8, 8)

    qmats = [nat(qz_l)] + [nat(qz_c)] * (channels - 1)
    tmat = _dct_matrix()
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    qblocks = []
    for p, qm, (fh, fv) in zip(planes, qmats, factors):
        gh, gw = mcus_y * fv * 8, mcus_x * fh * 8
        pad = np.pad(
            p,
            ((0, gh - p.shape[0]), (0, gw - p.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = pad.reshape(gh // 8, 8, gw // 8, 8).transpose(
            0, 2, 1, 3
        )
        coefs = np.einsum("ki,yxij,lj->yxkl", tmat, blocks, tmat)
        qblocks.append(np.rint(coefs / qm).astype(np.int64))

    dc_tabs = [_enc_table(*_HT_DC_LUMA)] + [
        _enc_table(*_HT_DC_CHROMA)
    ] * (channels - 1)
    ac_tabs = [_enc_table(*_HT_AC_LUMA)] + [
        _enc_table(*_HT_AC_CHROMA)
    ] * (channels - 1)

    # unpadded per-component block grids for the non-interleaved
    # AC scans (T.81: non-interleaved MCU = one block, no padding)
    comp_grid = []
    for fh, fv in factors:
        cw = -(-width * fh // hmax)
        ch = -(-height * fv // vmax)
        comp_grid.append((-(-ch // 8), -(-cw // 8)))

    def zz_of(blk):
        return [int(blk[z // 8, z % 8]) for z in _ZIGZAG]

    def dc_first_scan(wtr):
        pred = [0] * channels
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            dc = int(
                                qblocks[ci][my * fv + by,
                                            mx * fh + bx][0, 0]
                            ) >> 1  # Al=1 point transform
                            diff = dc - pred[ci]
                            pred[ci] = dc
                            size = _csize(diff)
                            code, length = dc_tabs[ci][size]
                            wtr.write(code, length)
                            if size:
                                mag = (
                                    diff if diff >= 0
                                    else diff + (1 << size) - 1
                                )
                                wtr.write(mag & ((1 << size) - 1), size)

    def dc_refine_scan(wtr):
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            dc = int(
                                qblocks[ci][my * fv + by,
                                            mx * fh + bx][0, 0]
                            )
                            wtr.write(dc & 1, 1)

    def ac_first_scan(wtr, ci, ss, se, al):
        bh, bw = comp_grid[ci]
        for by in range(bh):
            for bx in range(bw):
                zz = zz_of(qblocks[ci][by, bx])
                run = 0
                last_nz = -1
                vals = []
                for k in range(ss, se + 1):
                    v = zz[k]
                    a = (v if v >= 0 else -v) >> al
                    t = a if v >= 0 else -a
                    vals.append(t)
                    if t:
                        last_nz = k
                for k in range(ss, last_nz + 1):
                    t = vals[k - ss]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tabs[ci][0xF0]
                        wtr.write(code, length)
                        run -= 16
                    size = _csize(t)
                    code, length = ac_tabs[ci][(run << 4) | size]
                    wtr.write(code, length)
                    mag = t if t >= 0 else t + (1 << size) - 1
                    wtr.write(mag & ((1 << size) - 1), size)
                    run = 0
                if last_nz < se:
                    code, length = ac_tabs[ci][0x00]  # EOB (run of 1)
                    wtr.write(code, length)

    def ac_refine_scan(wtr, ci, ss, se, al):
        bh, bw = comp_grid[ci]
        for by in range(bh):
            for bx in range(bw):
                zz = zz_of(qblocks[ci][by, bx])
                absv = []
                eob = ss - 1  # position of last newly-significant
                for k in range(ss, se + 1):
                    a = (zz[k] if zz[k] >= 0 else -zz[k]) >> al
                    absv.append(a)
                    if a == 1:
                        eob = k
                run = 0
                buffered: list[int] = []
                for k in range(ss, se + 1):
                    t = absv[k - ss]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        code, length = ac_tabs[ci][0xF0]
                        wtr.write(code, length)
                        run -= 16
                        for b in buffered:
                            wtr.write(b, 1)
                        buffered = []
                    if t > 1:
                        buffered.append(t & 1)
                        continue
                    # newly significant: ±1 at this bit level
                    code, length = ac_tabs[ci][(run << 4) | 1]
                    wtr.write(code, length)
                    wtr.write(1 if zz[k] > 0 else 0, 1)
                    for b in buffered:
                        wtr.write(b, 1)
                    buffered = []
                    run = 0
                if run > 0 or buffered:
                    code, length = ac_tabs[ci][0x00]  # EOB run of 1
                    wtr.write(code, length)
                    for b in buffered:
                        wtr.write(b, 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(
            2, "big"
        ) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in qz_l))
    if channels == 3:
        out += seg(0xDB, bytes([1]) + bytes(int(v) for v in qz_c))
    sof = bytearray([8])
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(channels)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xC2, bytes(sof))

    def dht(tc, th, tab):
        bits, vals = tab
        return seg(
            0xC4,
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals),
        )

    out += dht(0, 0, _HT_DC_LUMA) + dht(1, 0, _HT_AC_LUMA)
    if channels == 3:
        out += dht(0, 1, _HT_DC_CHROMA) + dht(1, 1, _HT_AC_CHROMA)

    def sos(comp_ids_tabs, ss, se, ah, al):
        body = bytearray([len(comp_ids_tabs)])
        for cid, td, ta in comp_ids_tabs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(body))

    wtr = _BitWriter()
    all_dc = [
        (ci + 1, 0 if ci == 0 else 1, 0) for ci in range(channels)
    ]
    scans: list[tuple[bytes, "callable"]] = []
    scans.append((sos(all_dc, 0, 0, 0, 1), dc_first_scan))
    if channels == 1:
        bands = [(0, 1, 5), (0, 6, 63)]
    else:
        bands = [(0, 1, 5), (1, 1, 63), (2, 1, 63), (0, 6, 63)]
    for ci, ss, se in bands:
        ta = 0 if ci == 0 else 1
        scans.append(
            (
                sos([(ci + 1, 0, ta)], ss, se, 0, 1),
                lambda w, ci=ci, ss=ss, se=se: ac_first_scan(
                    w, ci, ss, se, 1
                ),
            )
        )
    scans.append((sos(all_dc, 0, 0, 1, 0), dc_refine_scan))
    for ci in range(channels):
        ta = 0 if ci == 0 else 1
        scans.append(
            (
                sos([(ci + 1, 0, ta)], 1, 63, 1, 0),
                lambda w, ci=ci: ac_refine_scan(w, ci, 1, 63, 0),
            )
        )
    for header, emit in scans:
        out += header
        wtr = _BitWriter()
        emit(wtr)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
