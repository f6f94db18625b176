"""Real WAV (RIFF/PCM) audio plumbing, stdlib-only — the audio leg
of the multimodal column family (``llm/multimodal.py``).

WAV is uncompressed, so unlike JPEG the full decode is exact integer
work: parse the RIFF chunk list, read ``fmt `` (PCM, 8/16-bit,
any channel count / sample rate), slice ``data`` into samples. That
makes the whole chain SQL-oracle-expressible — the catalog's audio
entry synthesizes deterministic PCM per doc, decodes it back, and
hash-gates exact integer sample statistics (the m5 idiom).

Feature extraction (RMS energy, zero-crossing count, peak) runs on
the decoded integer samples — the standard cheap audio-quality
signals a speech/music corpus build filters on before expensive
model scoring. Compressed codecs (MP3/FLAC/OGG) are NOT shipped —
``decode_wav`` returns None for them (their magic differs), and a
real deployment drops torchaudio/ffmpeg into the same
``mapInPandas`` call sites.

Cost tier: per-row Python + ``array`` module slicing inside
Arrow-batched ``mapInPandas`` only — same contract as the image
decoders.
"""

from __future__ import annotations


def encode_wav(
    sample_rate: int, channels: int, bits: int, samples: list[int]
) -> bytes:
    """Spec-valid RIFF/WAVE PCM encode (canonical 44-byte header).
    ``samples`` are interleaved integers: signed 16-bit or unsigned
    8-bit per the WAV convention."""
    import struct

    if bits not in (8, 16):
        raise ValueError("encode_wav: bits must be 8 or 16")
    if len(samples) % channels:
        raise ValueError("encode_wav: samples not frame-aligned")
    if bits == 8:
        frames = bytes(s & 0xFF for s in samples)
    else:
        frames = b"".join(
            struct.pack("<h", s) for s in samples
        )
    byte_rate = sample_rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    return (
        b"RIFF"
        + (36 + len(frames)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + struct.pack(
            "<HHIIHH", 1, channels, sample_rate, byte_rate,
            block_align, bits,
        )
        + b"data"
        + len(frames).to_bytes(4, "little")
        + frames
    )


def decode_wav(
    payload: bytes,
) -> tuple[int, int, int, list[int]] | None:
    """REAL WAV decode: walk the RIFF chunks (tolerating extra
    chunks like LIST/fact before data), require PCM (format tag 1),
    8- or 16-bit. Returns ``(sample_rate, channels, bits,
    interleaved samples)`` — 16-bit as signed ints, 8-bit as
    unsigned per the WAV convention — or None for anything else
    (compressed codecs, float PCM, truncated streams)."""
    import struct

    d = payload
    if len(d) < 44 or d[:4] != b"RIFF" or d[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(d):
        tag = d[pos:pos + 4]
        size = int.from_bytes(d[pos + 4:pos + 8], "little")
        body = d[pos + 8:pos + 8 + size]
        if len(body) < size:
            return None
        if tag == b"fmt ":
            if size < 16:
                return None
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
            break
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16) or not channels:
        return None
    if bits == 8:
        samples = list(data)
    else:
        n = len(data) // 2
        samples = list(
            struct.unpack(f"<{n}h", data[: 2 * n])
        )
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels]
    return rate, channels, bits, samples


def wav_stats(payload: bytes) -> dict | None:
    """Exact integer statistics of a PCM payload — the quality /
    accounting signals an audio corpus build gates on. All integers
    (sums, counts), so a SQL oracle can replay them exactly:
    ``n_samples`` (per channel), ``duration_ms`` (integer floor),
    ``sum_abs`` (sum |sample|), ``peak`` (max |sample|),
    ``zero_crossings`` (sign flips along channel 0, zeros carry the
    previous sign)."""
    got = decode_wav(payload)
    if got is None:
        return None
    rate, channels, bits, samples = got
    n = len(samples) // channels
    center = 128 if bits == 8 else 0
    ch0 = [samples[i * channels] - center for i in range(n)]
    sum_abs = sum(abs(s - center) for s in samples)
    peak = max((abs(s - center) for s in samples), default=0)
    zc = 0
    prev_sign = 0
    for s in ch0:
        sign = 1 if s > 0 else (-1 if s < 0 else prev_sign)
        if prev_sign and sign and sign != prev_sign:
            zc += 1
        if sign:
            prev_sign = sign
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n,
        "duration_ms": (n * 1000) // rate if rate else 0,
        "sum_abs": sum_abs,
        "peak": peak,
        "zero_crossings": zc,
    }
