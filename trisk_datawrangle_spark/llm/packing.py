"""Token-budget sequence packing: assign documents to fixed-budget
training sequences without driver-side loops.

True first-fit bin packing is sequential state; the scalable
relational form is streaming chunking — within a shard, documents in
a deterministic order accumulate token counts, and a document joins
pack ``floor(cum_before / budget)``. Packs can overflow the budget by
at most one document (the straddler), which training pipelines accept
(the alternative — closing the pack early — wastes the same tokens on
the other side of the boundary).

Sharding is what makes it distribute: the cumulative sum windows over
``shard_cols`` (a hash shard, a language, a source), so no global
ordering or single-partition window exists anywhere. Pack identity is
(shard…, pack_id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Add ``pack_id`` (per-shard) and ``pack_cum_tokens`` to ``df``.

    ``order_col`` pins the accumulation order (ties are not allowed to
    matter: use a unique id). Documents longer than ``budget`` get a
    pack of their own (the floor still isolates them)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn("pack_cum_tokens", cum).withColumn(
        "pack_id",
        F.floor((F.col("pack_cum_tokens") - F.col(token_col)) / budget).cast(
            "long"
        ),
    )
