"""WAV codec correctness (llm/audio.py): encode→decode roundtrips
are EXACT (PCM is lossless), extra RIFF chunks are tolerated,
malformed/compressed streams are rejected, and the integer stats
match a straightforward reference implementation."""

from __future__ import annotations

from trisk_datawrangle_spark.llm.audio import (
    decode_wav,
    encode_wav,
    wav_stats,
)


def test_roundtrip_exact_16bit_stereo():
    samples = [((i * 37) % 4001) - 2000 for i in range(2 * 75)]
    payload = encode_wav(16000, 2, 16, samples)
    got = decode_wav(payload)
    assert got == (16000, 2, 16, samples)


def test_roundtrip_exact_8bit_mono():
    samples = [(i * 11) % 256 for i in range(64)]
    payload = encode_wav(8000, 1, 8, samples)
    got = decode_wav(payload)
    assert got == (8000, 1, 8, samples)


def test_extra_chunks_tolerated():
    samples = [0, 100, -100, 50]
    payload = encode_wav(8000, 1, 16, samples)
    # splice a LIST chunk (odd size -> word alignment matters)
    # between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    got = decode_wav(spliced)
    assert got == (8000, 1, 16, samples)


def test_rejects_malformed():
    assert decode_wav(b"") is None
    assert decode_wav(b"RIFFxxxxWAVE") is None
    good = encode_wav(8000, 1, 16, [1, 2, 3, 4])
    assert decode_wav(good[:30]) is None
    # non-PCM format tag refused
    bad = bytearray(good)
    bad[20] = 3  # IEEE float tag
    assert decode_wav(bytes(bad)) is None
    # an MP3 magic is not a RIFF
    assert decode_wav(b"\xff\xfb\x90\x44" + b"\x00" * 100) is None


def test_wav_stats_reference():
    # ch0: +, -, 0(carries +... wait prev is -), +  / ch1 ignored
    # for zc
    frames = [(1000, 7), (-500, 7), (0, 7), (250, 7)]
    samples = [v for fr in frames for v in fr]
    st = wav_stats(encode_wav(8000, 2, 16, samples))
    assert st is not None
    assert st["n_samples"] == 4
    assert st["channels"] == 2
    assert st["duration_ms"] == 0  # 4 frames @ 8 kHz
    assert st["sum_abs"] == 1000 + 500 + 0 + 250 + 4 * 7
    assert st["peak"] == 1000
    # crossings on ch0: + -> - (1), - -> 0 (carries -), - -> + (2)
    assert st["zero_crossings"] == 2


def test_wav_stats_8bit_centering():
    # 8-bit is unsigned around 128: stats must center first
    samples = [128, 255, 0, 128]
    st = wav_stats(encode_wav(8000, 1, 8, samples))
    assert st["sum_abs"] == 0 + 127 + 128 + 0
    assert st["peak"] == 128
    # signs: 0(carry none), +, -, 0(carry -): one crossing
    assert st["zero_crossings"] == 1
