"""The NTZ→TIMESTAMP relabel at the read boundary must be
timezone-explicit: identical instants regardless of the caller's
session timezone, and no session-state mutation (round-4 advice —
the reader used to conf.set session.timeZone=UTC as a side effect).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trisk_datawrangle_spark.sources.readers import load_tables


def test_load_tables_is_session_tz_invariant_and_pure(spark, sf_dir):
    utc_micros = (
        load_tables(spark, sf_dir, ["events"])["events"]
        .select(F.unix_micros("ts").alias("us"))
        .agg(F.sum("us").alias("s"), F.count("*").alias("n"))
        .first()
    )
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        est_micros = (
            load_tables(spark, sf_dir, ["events"])["events"]
            .select(F.unix_micros("ts").alias("us"))
            .agg(F.sum("us").alias("s"), F.count("*").alias("n"))
            .first()
        )
        # loading must not have silently flipped the session back to UTC
        assert (
            spark.conf.get("spark.sql.session.timeZone")
            == "America/New_York"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert est_micros == utc_micros
