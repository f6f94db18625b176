"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch
shape, partition sizing — while the actual media decode is stubbed
(this environment ships no image/audio libraries). Swap
``_decode_stub`` for a real decoder (PIL / torchaudio / pyav) without
touching the plan.

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
    "doc_id long, byte_len int, sha256 string, width int, height int, ok boolean"
)


def with_binary_payload(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of a string
    column; in production: the raw media bytes read from object
    storage)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "utf-8"))


def _decode_stub(payload: bytes) -> tuple[int, int, bool]:
    """STUB for media decoding. Returns deterministic fake
    (width, height, ok). A real implementation would decode the image
    header; no media libs ship in this container, so the fake derives
    dimensions from the payload hash — stable, testable plumbing."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024, True


def decode_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode/feature-extract over Arrow batches (``mapInPandas``).

    Emits (id, byte_len, sha256, width, height, ok). The sha256 and
    byte_len are real; width/height come from the decode stub."""
    import pandas as pd

    # fat binary rows + per-row Python decode: parallelism must come
    # from partitioning, not file splits (media files are few & large)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # columnar (Series.map) rather than a python row loop:
            # per-row DataFrame indexing dominates at wide batches
            payloads = pdf[payload_col].map(bytes)
            dims = payloads.map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "ok": dims.map(lambda t: t[2]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, payload_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index
    list per payload; a real decoder would yield actual frames. Kept
    as a plan-shape demonstration: the fan-out happens *after*
    repartitioning by payload so one fat row never pins a task."""
    n_frames = (F.length(F.col(payload_col)) / every_n).cast("int")
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
    )
