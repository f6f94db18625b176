"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping — the public technique behind Delta Lake's OPTIMIZE ZORDER
and ClickHouse/Iceberg sort-key layouts.

Why: parquet scans prune FILES (and row groups) by per-column
min/max stats. A table sorted by one column skips beautifully on
that column and not at all on any other. Interleaving the bits of
several columns' rank-space positions puts rows that are close in
EVERY dimension into the same files, so a selective predicate on ANY
of the z-ordered columns shrinks each file's min/max box and prunes.

Scale shape: one approx-quantile pass per column (driver holds
``2^bits`` cut points per column — KBs), a pure-expression Morton
key (no UDF), then ``repartitionByRange`` on the key (sampled range
exchange — the only shuffle) + ``sortWithinPartitions``. No global
single-task sort anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, cuts: list[float]) -> Column:
    """Rank-space bucket id in [0, len(cuts)]: count of cut points
    ≤ value — equi-populated buckets regardless of value skew.
    Compiled as a BALANCED BINARY-SEARCH ``CASE`` tree over the
    literal cuts (depth ⌈log₂ cuts⌉, so 8 comparisons per row at
    bits=8 instead of the 255 a linear fold pays — and a plain
    codegen expression, not an interpreted HOF). NULL input lands in
    bucket 0, same as the previous fold's ``coalesce``."""
    v = F.col(col).cast("double")

    def search(lo: int, hi: int, base: int) -> Column:
        # bucket id within cuts[lo:hi), offset by `base` cuts known
        # to be <= v already
        if lo >= hi:
            return F.lit(base)
        mid = (lo + hi) // 2
        return (
            F.when(
                v >= F.lit(float(cuts[mid])),
                search(mid + 1, hi, base + (mid - lo) + 1),
            ).otherwise(search(lo, mid, base))
        )

    return F.coalesce(search(0, len(cuts), 0), F.lit(0))


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> Column:
    """Morton-interleaved key over ``cols`` (each mapped to its
    ``2^bits`` rank-space bucket by approx quantiles computed from
    ``df``). Pure integer expression — interleaving is a fixed chain
    of shifts and masks, whole-stage codegen."""
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    # ONE multi-column quantile pass (approxQuantile takes a column
    # list) — one scan of the table regardless of how many dims are
    # z-ordered, instead of one scan per dimension
    all_cuts = df.approxQuantile(list(cols), qs, 0.001)
    buckets = []
    for c, cuts in zip(cols, all_cuts):
        # dedupe ties (low-cardinality columns) keeping order
        uniq: list[float] = []
        for v in cuts:
            if not uniq or v > uniq[-1]:
                uniq.append(v)
        buckets.append(_bucket_expr(c, uniq))
    d = len(buckets)
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b.cast("long"), j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * d + i)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-order curve of ``cols``: range-partition by the Morton key
    (sampled exchange), sort within each partition, write. Every
    file's min/max box is then tight in all ``cols`` — the layout
    data-skipping needs."""
    key = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(int(n_files), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_minmax_boxes(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file min/max boxes from parquet footer statistics (via
    pyarrow — metadata only, no data read). The observable that
    data-skipping effectiveness is measured by."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        box: dict = {"file": name}
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            box[c] = (lo, hi)
        out.append(box)
    return out


def files_pruned(
    boxes: list[dict], predicates: dict[str, tuple]
) -> tuple[int, int]:
    """(files that survive pruning, total files) for a conjunction of
    per-column range predicates — the skip arithmetic a reader's
    planner performs against the footer stats."""
    total = len(boxes)
    hit = 0
    for b in boxes:
        ok = True
        for c, (lo, hi) in predicates.items():
            blo, bhi = b[c]
            if blo is None:
                # no stats -> the planner cannot prune; file is read
                continue
            if bhi < lo or blo > hi:
                ok = False
                break
        if ok:
            hit += 1
    return hit, total
