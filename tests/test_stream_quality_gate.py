"""Streaming parity for the curation map ops: quality_score and the
PII scrub are pure row maps, so a file stream through them must
produce exactly the batch result — the property that lets the batch-
proven curation gates run unchanged inside a streaming ingest
(stream_dedup_ingest's handle() composes them per micro-batch).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.text import quality_score
from trisk_datawrangle_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def docs_stream_dir(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, ["documents"]).values()
    d = tempfile.mkdtemp(prefix="docs_stream_")
    # several files so the stream actually micro-batches
    docs.repartition(4).write.mode("overwrite").parquet(f"{d}/in")
    yield d, docs
    shutil.rmtree(d, ignore_errors=True)


def _run_append_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_quality_gate_matches_batch(spark, docs_stream_dir):
    d, docs = docs_stream_dir

    def gate(df):
        return df.select(
            "doc_id",
            F.round(quality_score("text"), 6).alias("quality"),
        ).filter(F.col("quality") >= 0.8)

    src = spark.readStream.schema(docs.schema).parquet(f"{d}/in")
    streamed = _run_append_stream(spark, gate(src), "t_quality_gate")
    s = {(r.doc_id, r.quality) for r in streamed.collect()}
    b = {(r.doc_id, r.quality) for r in gate(docs).collect()}
    assert s == b and len(s) > 0
    # the gate actually filters (not a tautology)
    assert len(b) < docs.count()


def test_stream_pii_scrub_matches_batch(spark, docs_stream_dir):
    from trisk_datawrangle_spark.llm.text import pii_scrub

    d, docs = docs_stream_dir
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact me at a@b.co or https://x.io/p 1.2.3.4"),
        ),
    )
    pdir = f"{d}/pii"
    planted.repartition(3).write.mode("overwrite").parquet(pdir)

    def gate(df):
        return df.select("doc_id", pii_scrub("text").alias("clean"))

    src = spark.readStream.schema(planted.schema).parquet(pdir)
    streamed = _run_append_stream(spark, gate(src), "t_pii_scrub")
    s = {(r.doc_id, r.clean) for r in streamed.collect()}
    b = {(r.doc_id, r.clean) for r in gate(planted).collect()}
    assert s == b and len(s) > 0
    assert all("a@b.co" not in t and "1.2.3.4" not in t for _, t in s)
