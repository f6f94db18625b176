"""Real AVI (RIFF) video-container plumbing with MJPEG frames,
stdlib-only — the video leg of the multimodal column family.

MJPEG-in-AVI is the simplest real-world video container: each frame
is a complete baseline JPEG (``llm/jpeg.py`` decodes it), and the
container is a RIFF chunk tree (``hdrl`` headers + ``movi`` frame
chunks + optional ``idx1`` index). That makes frame SAMPLING — the
operation a multimodal training pipeline actually runs (take every
Nth frame, decode, feature-extract) — implementable end to end with
no media library: walk the container, slice the frame bytes, decode
the sampled ones. Inter-coded codecs (H.264 etc.) are NOT shipped;
``decode_avi_frames`` returns None for them (fourcc differs) and a
real deployment drops pyav/ffmpeg into the same call sites.

Cost tier: identical to the image/audio decoders — per-row Python
inside Arrow-batched ``mapInPandas`` only.
"""

from __future__ import annotations


def encode_avi_mjpeg(
    width: int, height: int, fps: int, frames: list[bytes]
) -> bytes:
    """Spec-valid minimal AVI: RIFF('AVI ') with LIST hdrl (avih +
    one vids/MJPG stream) and LIST movi of '00dc' chunks, plus an
    idx1 index. ``frames`` are complete JPEG byte streams."""
    import struct

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + len(body).to_bytes(4, "little") + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to 'movi' kind tag
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + (0x10).to_bytes(4, "little")
        idx += off.to_bytes(4, "little")
        idx += len(f).to_bytes(4, "little")
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi_frames(
    payload: bytes,
) -> tuple[int, int, int, list[bytes]] | None:
    """REAL AVI parse: walk the RIFF tree, read avih geometry and
    frame timing, collect the movi frame chunks ('00dc'/'00db').
    Returns ``(width, height, fps, [frame bytes])`` or None for
    non-AVI / non-MJPEG / truncated payloads."""
    d = payload
    if len(d) < 24 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        return None
    width = height = 0
    fps = 0
    frames: list[bytes] = []
    mjpg = False

    def walk(pos: int, end: int) -> bool:
        nonlocal width, height, fps, mjpg
        while pos + 8 <= end:
            tag = d[pos:pos + 4]
            size = int.from_bytes(d[pos + 4:pos + 8], "little")
            body_end = pos + 8 + size
            if body_end > end:
                return False
            if tag == b"LIST":
                kind = d[pos + 8:pos + 12]
                if kind in (b"hdrl", b"strl", b"movi"):
                    if not walk(pos + 12, body_end):
                        return False
            elif tag == b"avih":
                if size >= 40:
                    usec = int.from_bytes(d[pos + 8:pos + 12],
                                          "little")
                    fps = 1_000_000 // usec if usec else 0
                    width = int.from_bytes(d[pos + 40:pos + 44],
                                           "little")
                    height = int.from_bytes(d[pos + 44:pos + 48],
                                            "little")
            elif tag == b"strh":
                if size >= 8 and d[pos + 8:pos + 12] == b"vids":
                    mjpg = d[pos + 12:pos + 16] in (b"MJPG", b"mjpg")
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(bytes(d[pos + 8:body_end]))
            pos = body_end + (size & 1)
        return True

    if not walk(12, min(len(d), 8 + int.from_bytes(d[4:8], "little"))):
        return None
    if not width or not height or not mjpg:
        return None
    return width, height, fps, frames


def sample_frames(
    payload: bytes, every_n: int = 2
) -> list[tuple[int, int, int, bytes]] | None:
    """Take every Nth frame (0, N, 2N, …) of an MJPEG AVI and
    DECODE it (``llm/jpeg.py``). Returns a list of
    ``(frame_idx, width, height, rgb_pixels)`` or None when the
    container or any sampled frame does not decode — a silent skip
    would hide corrupt frames from the pipeline."""
    from trisk_datawrangle_spark.llm.jpeg import decode_jpeg

    got = decode_avi_frames(payload)
    if got is None:
        return None
    _, _, _, frames = got
    out = []
    for i in range(0, len(frames), max(1, int(every_n))):
        dec = decode_jpeg(frames[i])
        if dec is None:
            return None
        w, h, ch, px = dec
        if ch == 1:  # normalize gray to RGB for a uniform contract
            px = b"".join(bytes([v, v, v]) for v in px)
        out.append((i, w, h, px))
    return out
