"""Self-check harness mirroring the driver's t2 protocol: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, schema (column names) and
values (order-insensitive).

Stricter than the driver in one way: it reports the max float
deviation even when within tolerance, so drift shows up before it
becomes a hash mismatch.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame, atol: float = 1e-9) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        # sort floats ROUNDED to the comparison tolerance: raw float
        # sort keys let sub-tolerance engine jitter flip row order
        # between the two frames and misalign the positional compare
        import numpy as np

        digits = max(0, round(-math.log10(atol)))
        sort_frame = df.copy()
        for c in sort_frame.columns:
            if sort_frame[c].dtype.kind == "f":
                sort_frame[c] = np.round(sort_frame[c], digits)
        order = sort_frame.sort_values(
            by=list(sort_frame.columns), kind="mergesort"
        ).index
        df = df.loc[order].reset_index(drop=True)
    # normalize NaN → None-ish consistent NA for object cols
    return df


def compare_frames(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, atol: float = 1e-9
) -> tuple[bool, str]:
    a, b = _normalize(spark_pdf.copy(), atol), _normalize(duck_pdf.copy(), atol)
    if list(a.columns) != list(b.columns):
        return False, f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count mismatch: {len(a)} vs {len(b)}"
    # Driver-parity dtype gate: the driver hash-compares rendered values,
    # so Spark int64 vs DuckDB float64 (e.g. HUGEINT from SUM(BIGINT))
    # mismatches even when every value is equal. Catch that class here
    # instead of letting the float-cast comparison below mask it.
    int_kinds = {"i", "u"}
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if {ka, kb} <= int_kinds | {"f"} and (ka in int_kinds) != (kb in int_kinds):
            return False, (
                f"{col}: dtype class mismatch ({a[col].dtype} vs "
                f"{b[col].dtype}) — integer-vs-float hash-mismatches in the "
                f"driver; CAST the oracle expression (HUGEINT→BIGINT?)"
            )
    max_dev = 0.0
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            af = av.astype("float64")
            bf = bv.astype("float64")
            both_nan = af.isna() & bf.isna()
            diff = (af - bf).abs()
            diff[both_nan] = 0.0
            if diff.isna().any():
                return False, f"{col}: NULL mismatch"
            dev = float(diff.max()) if len(diff) else 0.0
            max_dev = max(max_dev, dev)
            if dev > atol:
                idx = int(diff.idxmax())
                return (
                    False,
                    f"{col}: max|Δ|={dev:g} at row {idx} "
                    f"({af[idx]!r} vs {bf[idx]!r})",
                )
        except (ValueError, TypeError):
            av_s = av.map(lambda x: None if x is None or (isinstance(x, float) and math.isnan(x)) else str(x))
            bv_s = bv.map(lambda x: None if x is None or (isinstance(x, float) and math.isnan(x)) else str(x))
            neq = (av_s != bv_s) & ~(av_s.isna() & bv_s.isna())
            if neq.any():
                idx = int(neq.idxmax())
                return False, f"{col}: value mismatch at row {idx}: {av_s[idx]!r} vs {bv_s[idx]!r}"
    return True, f"ok rows={len(a)} max_float_dev={max_dev:g}"


def run_one(
    name: str, spark, con, sf_dir: str, queries: dict, oracles: dict
) -> tuple[bool, str]:
    sdf = queries[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in oracles:
        return True, f"rows-only: {len(spark_pdf)} rows"
    duck_pdf = con.execute(oracles[name]).df()
    return compare_frames(spark_pdf, duck_pdf)
