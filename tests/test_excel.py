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


def test_reader_handles_rless_and_error_cells(tmp_path):
    """Spec edge cases (found in review): cells without the optional
    r= attribute imply sequential placement, and formula error cells
    (t="e") read as None instead of crashing the sheet."""
    import zipfile

    from trisk_datawrangle_spark.sources.excel import (
        read_xlsx_rows,
        write_minimal_xlsx,
    )

    path = str(tmp_path / "edge.xlsx")
    write_minimal_xlsx(path, "s", ["a", "b"], [[1, 2]])
    # surgically rewrite the sheet with an r-less cell and an error cell
    with zipfile.ZipFile(path) as z:
        names = {n: z.read(n) for n in z.namelist()}
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    names["xl/worksheets/sheet1.xml"] = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c t="inlineStr"><is><t>a</t></is></c>'
        '<c t="inlineStr"><is><t>b</t></is></c></row>'
        '<row r="2"><c><v>7</v></c><c t="e"><v>#DIV/0!</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    with zipfile.ZipFile(path, "w") as z:
        for n, b in names.items():
            z.writestr(n, b)
    header, rows = read_xlsx_rows(path, "s")
    assert header == ["a", "b"]
    assert rows == [[7, None]]


def test_writer_escapes_sheet_name(tmp_path):
    from trisk_datawrangle_spark.sources.excel import (
        read_xlsx_rows,
        write_minimal_xlsx,
    )

    path = str(tmp_path / "esc.xlsx")
    name = 'P&L "2024" <v1>'
    write_minimal_xlsx(path, name, ["x"], [[1]])
    header, rows = read_xlsx_rows(path, name)
    assert header == ["x"] and rows == [[1]]
