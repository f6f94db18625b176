"""Minimal xlsx reader/writer on the stdlib (zipfile + ElementTree).

S3 in SURVEY.md §2.1: the reference ingests one Excel workbook of
company indicators (prepare_asset_impact_data.R:7-41). No xlsx engine
(openpyxl) ships in this environment, but xlsx is just a zip of XML —
a ~100-line stdlib parser covers the subset real workbooks use
(inline + shared strings, numeric cells, one header row), which makes
the S3 scan a real, tested code path instead of an import-gated stub.

Scope by design: Excel workbooks are small dimension inputs (the
reference's is one file) — parsing happens driver-side and the result
is immediately a distributed DataFrame. 100 TB inputs never arrive as
xlsx; the landing zone converts to parquet upstream.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'B7' → 1 (0-based column)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str, sheet: str) -> tuple[list[str], list[list]]:
    """Parse one worksheet → (header, data rows). Cells typed: shared/
    inline strings stay str, numeric cells become int when integral
    else float; missing cells are None."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_targets = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels
        }
        sheet_target = None
        for s in wb.find(f"{_NS}sheets"):
            if s.get("name") == sheet:
                rid = s.get(f"{_REL_NS}id")
                sheet_target = rel_targets[rid]
        if sheet_target is None:
            raise ValueError(f"sheet {sheet!r} not found in {path}")
        if not sheet_target.startswith("xl/"):
            sheet_target = f"xl/{sheet_target}"
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst:
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        ws = ET.fromstring(z.read(sheet_target))
        rows: list[list] = []
        for row in ws.iter(f"{_NS}row"):
            out: list = []
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                # the r= attribute is optional in the spec — writers
                # omitting it imply sequential placement
                ci = _col_index(ref) if ref is not None else len(out)
                while len(out) < ci:
                    out.append(None)
                t = c.get("t")
                v = c.find(f"{_NS}v")
                if t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    out.append(
                        "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
                        if is_el is not None
                        else None
                    )
                elif v is None or v.text is None:
                    out.append(None)
                elif t == "s":
                    out.append(shared[int(v.text)])
                elif t == "str":
                    out.append(v.text)
                elif t == "e":
                    # formula error cells (#DIV/0!, #N/A, ...) — a
                    # hand-maintained sheet's bad cell reads as None,
                    # not a reader crash
                    out.append(None)
                else:
                    num = float(v.text)
                    out.append(int(num) if num.is_integer() else num)
            rows.append(out)
    if not rows:
        return [], []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    width = len(header)
    data = [r[:width] + [None] * (width - len(r)) for r in rows[1:]]
    return header, data


def _xml_attr(v: str) -> str:
    """Escape a string for use inside a double-quoted XML attribute
    (cell TEXT is escaped where it is written; attribute values need
    the quote entity too or the workbook is ill-formed XML)."""
    return (
        str(v)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_minimal_xlsx(path: str, sheet: str, header: list[str], rows: list[list]) -> None:
    """Write a spec-minimal xlsx (inline strings, numeric cells) —
    enough for round-trip tests and small dimension handoffs."""

    def cell_ref(r: int, c: int) -> str:
        letters = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            letters = chr(ord("A") + rem) + letters
        return f"{letters}{r + 1}"

    def cell_xml(r: int, c: int, v) -> str:
        ref = cell_ref(r, c)
        if v is None:
            return ""
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        text = (
            str(v)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'

    all_rows = [header, *rows]
    row_xml = "".join(
        f'<row r="{ri + 1}">'
        + "".join(cell_xml(ri, ci, v) for ci, v in enumerate(row))
        + "</row>"
        for ri, row in enumerate(all_rows)
    )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{row_xml}</sheetData></worksheet>"
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_xml_attr(sheet)}" sheetId="1" '
        'r:id="rId1"/></sheets></workbook>'
    )
    rels_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", rels_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
