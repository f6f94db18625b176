"""Feature-prep operators (x18/x19): equal-frequency bin sizes,
deterministic tie handling, exact-moment z-scores (partition
invariance, zero-variance policy, unit variance of the output)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trisk_datawrangle_spark.operators.mlprep import group_zscore, quantile_bins
from trisk_datawrangle_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_tables(spark, sf_dir, ["orders"])["orders"]


def test_bins_equal_frequency(spark, orders):
    b = quantile_bins(orders, "o_totalprice", 10, ["o_orderpriority"], "o_orderkey")
    sizes = (
        b.groupBy("o_orderpriority", "bin")
        .count()
        .groupBy("o_orderpriority")
        .agg((F.max("count") - F.min("count")).alias("spread"))
        .collect()
    )
    assert all(r.spread <= 1 for r in sizes)  # NTILE: sizes differ by ≤1


def test_bins_partition_invariant(spark, orders):
    a = {
        r.o_orderkey: r.bin
        for r in quantile_bins(
            orders, "o_totalprice", 10, ["o_orderpriority"], "o_orderkey"
        ).collect()
    }
    b = {
        r.o_orderkey: r.bin
        for r in quantile_bins(
            orders.repartition(13), "o_totalprice", 10,
            ["o_orderpriority"], "o_orderkey",
        ).collect()
    }
    assert a == b


def test_zscore_partition_invariant_and_standardized(spark, orders):
    z1 = {
        r.o_orderkey: r.zscore
        for r in group_zscore(
            orders, "o_totalprice", ["o_orderpriority"], "o_orderkey"
        ).collect()
    }
    z2 = {
        r.o_orderkey: r.zscore
        for r in group_zscore(
            orders.repartition(13), "o_totalprice",
            ["o_orderpriority"], "o_orderkey",
        ).collect()
    }
    assert z1 == z2  # exact equality: integer moments, no float drift
    vals = [v for v in z1.values() if v is not None]
    mean = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals)
    assert abs(mean) < 1e-3
    assert abs(var - 1.0) < 1e-2


def test_zscore_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 3.0)],
        ["id", "g", "v"],
    )
    z = {r.id: r.zscore for r in group_zscore(df, "v", ["g"], "id").collect()}
    assert z[1] is None and z[2] is None  # constant group
    assert z[3] is not None and math.isclose(z[3], -z[4])


def test_nearest_centroid_beats_chance(spark):
    """The synthetic labels are only weakly clustered in cosine
    space (measured ~37% recovery at sf0.001), so the sanity bound
    is better-than-chance by a wide factor — the prototypes carry
    real class signal — plus completeness (every vector assigned
    exactly once)."""
    from tests.conftest import SF_DIR
    from trisk_datawrangle_spark.llm.similarity import nearest_centroid

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = nearest_centroid(embs).cache()
    n = out.count()
    n_labels = embs.select("label").distinct().count()
    agree = out.filter(
        F.col("assigned_label") == F.col("true_label")
    ).count()
    assert n == embs.count()
    assert out.select("vec_id").distinct().count() == n
    assert agree / n > 2.0 / n_labels, f"{agree}/{n} vs chance 1/{n_labels}"


def test_tfidf_rank_is_exact_and_stable(spark):
    from tests.conftest import SF_DIR
    from trisk_datawrangle_spark.llm.ranking import tfidf_top_terms

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {
        (r.doc_id, r.rank): (r.term, r.score_micro)
        for r in tfidf_top_terms(docs, k=3).collect()
    }
    b = {
        (r.doc_id, r.rank): (r.term, r.score_micro)
        for r in tfidf_top_terms(docs.repartition(17), k=3).collect()
    }
    assert a == b and len(a) > 0


def test_rolling_stats_partition_invariant(spark, sf_dir):
    from trisk_datawrangle_spark.operators.mlprep import rolling_stats

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    a = {
        r.event_id: (r.roll_n, r.roll_sum, r.roll_mean)
        for r in rolling_stats(
            ev, "value", ["user_id"], ["ts", "event_id"]
        ).select("event_id", "roll_n", "roll_sum", "roll_mean").collect()
    }
    b = {
        r.event_id: (r.roll_n, r.roll_sum, r.roll_mean)
        for r in rolling_stats(
            ev.repartition(13), "value", ["user_id"], ["ts", "event_id"]
        ).select("event_id", "roll_n", "roll_sum", "roll_mean").collect()
    }
    assert a == b and len(a) > 0
    assert all(1 <= v[0] <= 3 for v in a.values())


def test_winsorize_bounds_and_interior(spark, orders):
    from trisk_datawrangle_spark.operators.mlprep import winsorize

    out = winsorize(
        orders, "o_totalprice", ["o_orderpriority"], "o_orderkey", 0.05, 0.95
    ).cache()
    assert out.count() == orders.count()
    # clipped range per group equals the exact percentile band
    bounds = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    merged = out.join(bounds, "o_orderpriority")
    assert (
        merged.filter(
            (F.col("clipped") < F.round("lo", 6) - 1e-9)
            | (F.col("clipped") > F.round("hi", 6) + 1e-9)
        ).count()
        == 0
    )
    # interior values pass through unchanged
    joined = out.join(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey"
    ).join(bounds, "o_orderpriority")
    interior = joined.filter(
        (F.col("o_totalprice") > F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi"))
    )
    changed = interior.filter(
        F.abs(F.col("clipped") - F.round("o_totalprice", 6)) > 1e-9
    ).count()
    assert changed == 0 and interior.count() > 0


def test_null_values_and_null_groups_are_not_dropped_or_fabricated(spark):
    """Review-found NULL gaps: NULL group keys must survive the
    stats join (null-safe), NULL values must yield NULL features
    (never the group's bound or a biased z), and denominators count
    only contributing rows."""
    from trisk_datawrangle_spark.operators.mlprep import (
        group_zscore,
        quantile_bins,
        rolling_stats,
        winsorize,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", None),
            (3, "a", 20.0),
            (4, None, 1.0),
            (5, None, 3.0),
        ],
        "id long, g string, v double",
    )
    # winsorize: row count preserved incl. NULL group; NULL v -> NULL
    wz = {r.id: r.clipped for r in winsorize(df, "v", ["g"], "id", 0.0, 1.0).collect()}
    assert set(wz) == {1, 2, 3, 4, 5}
    assert wz[2] is None
    assert wz[4] == 1.0 and wz[5] == 3.0  # NULL group standardized together
    # z-score: n counts contributing rows -> group 'a' mean is 15
    z = {r.id: r.zscore for r in group_zscore(df, "v", ["g"], "id").collect()}
    assert set(z) == {1, 2, 3, 4, 5}
    assert z[2] is None
    assert z[1] is not None and abs(z[1] + 1.0) < 1e-6  # (10-15)/5
    assert z[4] is not None and abs(z[4] + 1.0) < 1e-6  # NULL-group pair
    # bins: NULL values get NULL bin, not bin 1
    b = {
        r.id: r.bin
        for r in quantile_bins(df, "v", 2, ["g"], "id").collect()
    }
    assert b[2] is None and b[1] == 1 and b[3] == 2
    # rolling: mean over contributing rows only
    r3 = rolling_stats(
        df.withColumnRenamed("g", "k"), "v", ["k"], ["id"], window_rows=3
    )
    row3 = {r.id: (r.roll_n, r.roll_mean) for r in r3.collect()}[3]
    assert row3 == (2, 15.0)  # frame [10, NULL, 20]


def test_zscore_survives_large_mean_small_spread(spark):
    """Cancellation guard: ~$10M values differing by cents must
    produce finite, correct z-scores (naive E[c^2]-mean^2 loses all
    precision at this magnitude)."""
    from trisk_datawrangle_spark.operators.mlprep import group_zscore

    base = 10_000_000.00
    df = spark.createDataFrame(
        [(1, "g", base + 0.01), (2, "g", base + 0.03), (3, "g", base + 0.05)],
        "id long, g string, v double",
    )
    z = {r.id: r.zscore for r in group_zscore(df, "v", ["g"], "id").collect()}
    assert all(v is not None for v in z.values()), z
    import math

    assert math.isclose(z[1], -1.224745, abs_tol=1e-5), z
    assert math.isclose(z[3], 1.224745, abs_tol=1e-5), z
    assert math.isclose(z[2], 0.0, abs_tol=1e-5), z


def test_nan_values_treated_as_missing(spark):
    """NaN must behave like NULL (found in review: an unguarded
    round(NaN*100).cast(long) scored NaN as $0.00 non-ANSI and threw
    CAST_OVERFLOW under ANSI)."""
    from trisk_datawrangle_spark.operators.mlprep import (
        group_zscore,
        quantile_bins,
        winsorize,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", float("nan"))],
        "id long, g string, v double",
    )
    z = {r.id: r.zscore for r in group_zscore(df, "v", ["g"], "id").collect()}
    assert z[3] is None
    assert z[1] is not None and abs(z[1] + 1.0) < 1e-6  # mean 15, sd 5
    b = {r.id: r.bin for r in quantile_bins(df, "v", 2, ["g"], "id").collect()}
    assert b[3] is None and b[1] == 1 and b[2] == 2
    w = {r.id: r.clipped for r in winsorize(df, "v", ["g"], "id", 0.0, 1.0).collect()}
    assert w[3] is None and w[1] == 10.0 and w[2] == 20.0
