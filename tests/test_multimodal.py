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
