"""Stdlib xlsx path (S3): write → read round trips with typed cells,
XML escaping, missing cells, and sheet addressing."""

from __future__ import annotations

import pytest

from trisk_datawrangle_spark.sources.excel import (
    read_xlsx_rows,
    write_minimal_xlsx,
)
from trisk_datawrangle_spark.sources.readers import read_excel_sheet


def test_roundtrip_types_and_escaping(tmp_path):
    p = str(tmp_path / "t.xlsx")
    rows = [
        [1, "alpha", 2.5],
        [2, "b & <c> \"d\"", None],  # XML-special characters
        [3, None, 7],                  # missing string cell, integral float
    ]
    write_minimal_xlsx(p, "data", ["id", "name", "val"], rows)
    header, got = read_xlsx_rows(p, "data")
    assert header == ["id", "name", "val"]
    assert got == rows
    with pytest.raises(ValueError, match="not found"):
        read_xlsx_rows(p, "other")


def test_read_excel_sheet_into_spark(spark, tmp_path):
    p = str(tmp_path / "dim.xlsx")
    write_minimal_xlsx(
        p, "dim", ["k", "label"], [[1, "one"], [2, "two"], [3, None]]
    )
    df = read_excel_sheet(spark, p, "dim", "k long, label string")
    assert {(r.k, r.label) for r in df.collect()} == {
        (1, "one"),
        (2, "two"),
        (3, None),
    }
    # schema-less fallback: everything lands as strings
    df2 = read_excel_sheet(spark, p, "dim")
    assert df2.columns == ["k", "label"]
    assert dict(df2.dtypes)["k"] == "string"
