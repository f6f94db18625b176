"""Skew-mitigation operators (SURVEY.md §4: "AQE skew-join handling
suffices" for the reference's data — these are the explicit tools for
when it doesn't at 100 TB).

AQE splits skewed *partitions* of sort-merge joins, but two shapes
still need manual salting:

1. **Skewed distinct-count** — ``count(DISTINCT v)`` keeps the hot
   key's whole value set in one task (no map-side reduction of the
   set). ``salted_count_distinct`` salts by ``hash(value)`` so every
   distinct value lands in exactly one (key, salt) bucket — partial
   distinct counts then merge with a plain sum.
2. **Hot-key broadcast-less join** — ``salted_join`` replicates the
   small side R times and salts the big side's key so one hot key
   spreads over R tasks.

For plain sum/count/min/max a hot key needs NO salting: Spark's
hash aggregation does map-side partial aggregation, so each map task
sends at most one row per key to the final reducer regardless of
skew. ``salted_agg`` therefore exists only for explicit two-stage
control (e.g. when partial aggregation degrades to sort-based under
a high-cardinality group mix and you want the reduction forced
early); reach for it last.

All keep the salt column internal — caller-visible schemas are
unchanged.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SALT = "__salt"


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs``: {out_col: (fn, in_col)} with fn ∈ {sum, count, min,
    max} — the decomposable aggregates (partial per (key, salt),
    merge per key; count merges via sum). Non-decomposable aggregates
    (exact median) can't be salted — pre-aggregate or sketch instead.
    """
    groups = list(group_cols)
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (fn, _) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn!r} is not decomposable; cannot salt")
    salted = df.withColumn(
        SALT, (F.spark_partition_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*groups, SALT).agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*groups).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "n_distinct",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact distinct count that survives a hot key.

    The salt is ``pmod(xxhash64(value), buckets)`` — derived from the
    VALUE, so every distinct value falls in exactly one (key, salt)
    bucket and the per-bucket exact distinct counts merge with a
    plain sum. (A row-position salt would double-count values that
    appear in several buckets; a partition-id salt degenerates when
    the hot key is concentrated in one input partition.) For
    approximate counts at rollup grain prefer the HLL sketch ladder
    (operators/sketches.py)."""
    groups = list(group_cols)
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*groups, SALT).agg(
        F.countDistinct(value_col).alias("__pd")
    )
    return partial.groupBy(*groups).agg(F.sum("__pd").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Hot-key equi-join: salt the big side with a random bucket,
    replicate the small side across all buckets, join on
    (keys..., salt). Output equals ``big.join(small, on, how)`` for
    inner/left joins; the small side grows ×``salt_buckets`` (use
    only when it is far too big to broadcast but far smaller than
    the skewed side).

    The salt is ``pmod(hash(monotonic id), buckets)`` — deterministic
    per row within a run, uniform across buckets."""
    keys = list(on)
    b = big.withColumn(
        SALT,
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, keys + [SALT], how).drop(SALT)
