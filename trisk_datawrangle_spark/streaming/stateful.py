"""Custom stateful streaming operators (``applyInPandasWithState``).

For semantics the built-in windowed aggregations can't express —
running totals that must be emitted *per micro-batch* with explicit
per-key state and timeout-based finalization. State is a tiny fixed
tuple per key (no unbounded growth); timeouts evict idle keys.

Batch fallback: the same function signature computed with a window —
one code path per semantics, chosen by ``df.isStreaming`` so pipeline
code never forks.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    timeout_ms: int = 0,
) -> DataFrame:
    """Per-key running (count, sum) emitted on every update.

    Streaming: ``applyInPandasWithState`` with ProcessingTimeTimeout
    when ``timeout_ms`` > 0 — idle keys emit a final row flagged
    ``finalized=true`` and their state is dropped. Batch: equivalent
    totals via a plain aggregation (running emission per batch has no
    batch meaning — the final totals are the fixpoint).
    """
    keys = list(key_cols)
    out_schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n bigint, total double, finalized boolean"
    )
    state_schema = "n bigint, total double"

    if not df.isStreaming:
        agg = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("double")).alias("total"),
        )
        return agg.select(
            *[F.col(k).cast("string").alias(k) for k in keys],
            "n",
            "total",
            F.lit(False).alias("finalized"),
        )

    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        # out_schema declares keys as string — convert explicitly: the
        # batch path casts, but raw-typed (e.g. bigint) keys here would
        # fail Arrow conversion and kill every micro-batch
        # NULL keys stay NULL — str(None) would mint the literal
        # string 'None', diverging from the batch path's cast("string")
        skey = tuple(str(k) if k is not None else None for k in key)
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(*skey, n, total, True)],
                columns=keys + ["n", "total", "finalized"],
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [(*skey, n, total, False)],
            columns=keys + ["n", "total", "finalized"],
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout
    )
