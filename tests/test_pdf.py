"""PDF text-extraction correctness (llm/pdf.py): xref-driven object
slicing, FlateDecode, Tj/TJ text ops with escape handling; malformed
documents are refused (None), never guessed at."""

from __future__ import annotations

import re
import zlib

from trisk_datawrangle_spark.llm.pdf import pdf_build, pdf_text


def test_roundtrip_multipage_order():
    pages = [f"page {i} words here" for i in range(7)]
    assert pdf_text(pdf_build(pages)) == pages


def test_roundtrip_escapes_and_specials():
    pages = [
        "parens (nested (deep)) and \\ backslash",
        "tabs\tnewline-free punctuation: [brackets] <angles>",
        "",
    ]
    assert pdf_text(pdf_build(pages)) == pages


def test_octal_and_continuation_escapes():
    """Escapes the builder never emits: octal codes and
    backslash-newline continuations."""
    got = pdf_text(
        _mini_pdf(b"BT (A\\101\\12B) Tj (cont\\\ninued) Tj ET")
    )
    assert got == ["AA\nBcontinued"]


def _mini_pdf(content: bytes) -> bytes:
    """One-page PDF around an arbitrary content stream — for
    exercising operator/escape forms the builder never emits."""
    flate = zlib.compress(content)
    doc = bytearray(b"%PDF-1.4\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + flate
        + b"\nendstream",
    ]
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(doc))
        doc += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(doc)
    doc += f"xref\n0 {len(objs) + 1}\n".encode()
    doc += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        doc += f"{off:010d} 00000 n \n".encode()
    doc += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(doc)


def test_tj_array_strings_counted():
    """TJ arrays ([(a) -120 (b)] TJ) interleave kerning numbers with
    strings; both strings must land in the page text."""
    assert pdf_text(
        _mini_pdf(b"BT [(Hel) -20 (lo)] TJ ( wor) Tj (ld) Tj ET")
    ) == ["Hello world"]


def test_refusals():
    good = pdf_build(["hello there"])
    assert pdf_text(b"not a pdf") is None
    assert pdf_text(good[:-30]) is None  # startxref truncated
    # lying xref offset: point object 1 at byte 42
    bad = re.sub(
        rb"\n(\d{10}) 00000 n \n",
        b"\n0000000042 00000 n \n",
        good,
        count=1,
    )
    assert pdf_text(bad) is None
    # non-Flate filter: outside the subset, refused
    lzw = good.replace(b"/FlateDecode", b"/LZWDecode")
    assert pdf_text(lzw) is None
    # encrypted docs refused
    enc = good.replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    assert pdf_text(enc) is None


def test_unterminated_string_refused():
    assert pdf_text(_mini_pdf(b"BT (never closed Tj ET")) is None
    # unknown escape: refused too
    assert pdf_text(_mini_pdf(b"BT (bad \\q escape) Tj ET")) is None


def test_builder_objects_and_xref_shape():
    p = pdf_build(["a", "b", "c"])
    # 3 fixed objects + (page, contents) per page
    assert p.count(b" obj") == 3 + 2 * 3
    # xref entries are the exact 20-byte format ("xref" alone would
    # rfind the one inside "startxref")
    x = p[p.rfind(b"\nxref\n"):]
    entries = re.findall(rb"\d{10} \d{5} [nf] \n", x)
    assert len(entries) == 1 + 9
