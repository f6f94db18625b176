"""AVI/MJPEG container correctness (llm/video.py): byte-exact frame
recovery, real JPEG decode of sampled frames, loud failure on
corrupt frames, rejection of non-AVI / non-MJPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from trisk_datawrangle_spark.llm.jpeg import decode_jpeg, encode_jpeg
from trisk_datawrangle_spark.llm.video import (
    decode_avi_frames,
    encode_avi_mjpeg,
    sample_frames,
)


def _frames(n, w=16, h=8):
    out = []
    for f in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(30 * f + 3 * xx + 2 * yy, 0, 255).astype(
            np.uint8
        )
        img = np.stack([img] * 3, axis=-1)
        out.append(encode_jpeg(w, h, 3, img.tobytes(), quality=90))
    return out


def test_container_roundtrip_byte_exact():
    frames = _frames(7)
    avi = encode_avi_mjpeg(16, 8, 24, frames)
    got = decode_avi_frames(avi)
    assert got is not None
    w, h, fps, fr = got
    assert (w, h, fps) == (16, 8, 24)
    assert fr == frames  # container adds nothing, loses nothing


def test_odd_sized_frames_word_aligned():
    # RIFF pads odd-length chunks; frames of odd byte length must
    # still come back exact
    frames = _frames(4)
    frames = [f + b"\x00" if len(f) % 2 == 0 else f for f in frames]
    avi = encode_avi_mjpeg(16, 8, 10, frames)
    got = decode_avi_frames(avi)
    assert got is not None and got[3] == frames


def test_sample_frames_decodes_real_pixels():
    frames = _frames(6)
    avi = encode_avi_mjpeg(16, 8, 10, frames)
    sampled = sample_frames(avi, every_n=3)
    assert [s[0] for s in sampled] == [0, 3]
    for idx, w, h, px in sampled:
        ref = decode_jpeg(frames[idx])
        assert (w, h) == (ref[0], ref[1])
        assert px == ref[3]  # identical to decoding the frame alone


def test_sample_frames_fails_loudly_on_corrupt_frame():
    frames = _frames(4)
    frames[2] = frames[2][: len(frames[2]) // 2]  # truncated JPEG
    avi = encode_avi_mjpeg(16, 8, 10, frames)
    assert sample_frames(avi, every_n=2) is None  # index 2 sampled
    # but sampling that skips the corrupt frame succeeds
    assert sample_frames(avi, every_n=4) is not None


def test_rejects_non_avi_and_non_mjpeg():
    assert decode_avi_frames(b"") is None
    assert decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE") is None
    frames = _frames(2)
    avi = bytearray(encode_avi_mjpeg(16, 8, 10, frames))
    i = avi.index(b"MJPG")  # strh fourcc comes first
    avi[i:i + 4] = b"H264"
    # strf also carries MJPG; flip it too so no vids/MJPG remains
    j = avi.index(b"MJPG", i + 4)
    avi[j:j + 4] = b"H264"
    assert decode_avi_frames(bytes(avi)) is None
