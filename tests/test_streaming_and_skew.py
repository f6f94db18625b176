"""Structured Streaming parity tests (the batch expression trees run
unchanged under readStream, with watermarks bounding state) and
skew-mitigation correctness (salted results == unsalted results)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.skew import salted_agg, salted_join
from trisk_datawrangle_spark.sources.readers import load_tables
from trisk_datawrangle_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    """Events parquet staged into a temp dir used as a file-stream
    source (micro-batched by availableNow)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    d = tempfile.mkdtemp(prefix="trisk_stream_")
    ev.write.mode("overwrite").parquet(f"{d}/in")
    yield d, ev
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_matches_batch(spark, events_stream_dir):
    d, ev = events_stream_dir
    src = spark.readStream.schema(ev.schema).parquet(f"{d}/in")
    aggs = [F.count(F.lit(1)).alias("n")]
    streamed = _run_stream(
        spark,
        tumbling_agg(src, "ts", "1 hour", ["event_type"], aggs, watermark="2 hours"),
        "t_tumbling",
    )
    batch = tumbling_agg(ev, "ts", "1 hour", ["event_type"], aggs)
    key = ["window_start", "event_type"]
    s = {tuple(str(r[k]) for k in key): r["n"] for r in streamed.collect()}
    b = {tuple(str(r[k]) for k in key): r["n"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_streaming_sliding_and_dedup(spark, events_stream_dir):
    d, ev = events_stream_dir
    src = spark.readStream.schema(ev.schema).parquet(f"{d}/in")
    slid = _run_stream(
        spark,
        sliding_agg(
            src, "ts", "2 hours", "1 hour", ["event_type"],
            [F.count(F.lit(1)).alias("n")], watermark="2 hours",
        ),
        "t_sliding",
    )
    batch = sliding_agg(
        ev, "ts", "2 hours", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )
    assert slid.count() == batch.count() > 0
    # stateful dedup: one output row per event_type, state bounded
    deduped = (
        stream_dedup(src, ["event_type"], "ts", watermark="1 hour")
        .writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    deduped.awaitTermination(120)
    got = spark.table("t_dedup")
    assert got.count() == ev.select("event_type").distinct().count()


def test_session_agg_batch(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = session_agg(
        ev, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    )
    # sessions partition each user's events completely
    assert (
        out.agg(F.sum("n")).collect()[0][0] == ev.count()
    )


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    plain = {
        r["l_returnflag"]: (r["n"], r["q"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["q"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("count", "l_quantity"), "q": ("sum", "l_quantity")},
            salt_buckets=16,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1])


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"m": ("median", "l_quantity")})


def test_salted_join_matches_plain(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    o, c = t["orders"], t["customer"]
    plain = (
        o.join(c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            o, c.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"],
            salt_buckets=8,
        )
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r["c_mktsegment"], r["n"]) for r in plain.collect()} == {
        (r["c_mktsegment"], r["n"]) for r in salted.collect()
    }


def test_stateful_running_totals_stream(spark, events_stream_dir):
    from trisk_datawrangle_spark.streaming.stateful import running_totals

    d, ev = events_stream_dir
    src = spark.readStream.schema(ev.schema).parquet(f"{d}/in")
    q = (
        running_totals(src, ["event_type"], "value")
        .writeStream.format("memory").queryName("t_state")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_state")
    # the last emission per key equals the batch fixpoint
    latest = {
        r["event_type"]: (r["n"], r["total"])
        for r in got.collect()  # availableNow: one batch → one row/key
    }
    expect = {
        r["event_type"]: (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(latest) == set(expect)
    for k in expect:
        assert latest[k][0] == expect[k][0]
        assert latest[k][1] == pytest.approx(expect[k][1])


def test_stateful_running_totals_batch_fallback(spark, sf_dir):
    from trisk_datawrangle_spark.streaming.stateful import running_totals

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = running_totals(ev, ["event_type"], "value")
    assert out.filter(F.col("finalized")).count() == 0
    assert out.count() == ev.select("event_type").distinct().count()


def test_salted_count_distinct_matches_plain(spark, sf_dir):
    from trisk_datawrangle_spark.operators.skew import salted_count_distinct

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    plain = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        r.event_type: r.n_distinct
        for r in salted_count_distinct(
            ev, ["event_type"], "user_id", salt_buckets=7
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_streaming_session_matches_batch(spark, events_stream_dir):
    """Session windows under Structured Streaming (watermarked, as
    state-bounding requires) produce the same sessions as the batch
    tree — the last window family without a streaming parity check."""
    d, ev = events_stream_dir
    src = spark.readStream.schema(ev.schema).parquet(f"{d}/in")
    aggs = [F.count(F.lit(1)).alias("n")]
    streamed = _run_stream(
        spark,
        session_agg(
            src, "ts", "30 minutes", ["user_id"], aggs, watermark="2 hours"
        ),
        "t_session",
    )
    batch = session_agg(ev, "ts", "30 minutes", ["user_id"], aggs)
    key = ["user_id", "window_start", "window_end"]
    s = {tuple(str(r[k]) for k in key): r["n"] for r in streamed.collect()}
    b = {tuple(str(r[k]) for k in key): r["n"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_stream_static_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-static enrichment: the dimension join + tumbling agg
    produces identical per-(window, nation) counts whether the events
    arrive as a batch frame or a file stream."""
    from trisk_datawrangle_spark.streaming.windows import (
        stream_static_enrich,
    )

    d, ev = events_stream_dir
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    dim = (
        t["customer"]
        .join(
            t["nation"],
            t["customer"].c_nationkey == t["nation"].n_nationkey,
            "left",
        )
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("n_name").alias("nation"),
        )
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    src = spark.readStream.schema(ev.schema).parquet(f"{d}/in")
    streamed = _run_stream(
        spark,
        tumbling_agg(
            stream_static_enrich(src, dim, "user_id"),
            "ts",
            "1 hour",
            ["nation"],
            aggs,
            watermark="2 hours",
        ),
        "t_stream_static",
    )
    batch = tumbling_agg(
        stream_static_enrich(ev, dim, "user_id"),
        "ts",
        "1 hour",
        ["nation"],
        aggs,
    )
    key = ["window_start", "nation"]
    s = {tuple(str(r[k]) for k in key): r["n"] for r in streamed.collect()}
    b = {tuple(str(r[k]) for k in key): r["n"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_late_data_report_counts_only_beyond_horizon(spark, sf_dir):
    """e12: every flagged row really trails its user's running max by
    more than the horizon — cross-checked against a driver-side
    replay of the same per-user scan."""
    from trisk_datawrangle_spark.streaming.windows import late_data_report

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    rep = {
        r.event_type: (r.n_events, r.n_late)
        for r in late_data_report(
            ev, "ts", "event_id", 1800, ["user_id"], ["event_type"]
        ).collect()
    }
    rows = ev.select("user_id", "event_id", "ts", "event_type").collect()
    seen: dict = {}
    late_by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.event_id)):
        m = seen.get(r.user_id)
        if m is not None and (m - r.ts).total_seconds() > 1800:
            late_by_type[r.event_type] = late_by_type.get(r.event_type, 0) + 1
        seen[r.user_id] = max(m, r.ts) if m else r.ts
    for et, (n, n_late) in rep.items():
        assert n_late == late_by_type.get(et, 0), et
    assert sum(n for n, _ in rep.values()) == len(rows)
