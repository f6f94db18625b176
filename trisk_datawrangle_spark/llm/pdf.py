"""PDF text extraction — the other front-door format of a web-scale
training corpus (crawls deliver .pdf alongside .html; a pipeline
that drops them loses a large, high-quality text slice).

Stdlib-only, spec-driven (ISO 32000 subset): the parser is
XREF-DRIVEN — it reads ``startxref``, walks the cross-reference
table, and slices each object at its declared byte offset (the same
never-scan-for-delimiters discipline as the WARC reader's
Content-Length slicing), validates the offset actually starts the
object it claims, follows the document structure (trailer /Root →
catalog /Pages → page tree → per-page /Contents), FlateDecodes
content streams (stdlib zlib), and tokenizes the content stream for
the text-showing operators ``Tj`` and ``TJ`` (with PDF string
escapes: ``\\(``, ``\\)``, ``\\\\``, octal codes, line
continuations; both latin-1 and the spec's BOM-marked UTF-16BE
text strings decode).

Both cross-reference FORMS parse: the classic PDF 1.4 ``xref``
table, and the PDF 1.5 cross-reference STREAM (``/Type /XRef`` —
FlateDecoded binary rows walked by the ``/W`` field-width triple,
optional ``/Index`` subsections, PNG row predictors 10-15 per
``/DecodeParms`` — the layout nearly every post-2005 writer emits)
together with ``/Type /ObjStm`` OBJECT streams (type-2 entries:
compressed non-stream objects addressed as (container, index) pairs
through the container's N-pair header). Anything outside this
subset — encryption, LZW/ASCII85 filters, incremental ``/Prev``
chains, TIFF predictor 2 — returns None loudly rather than
guessing, and hostile shapes (billion-object xref/Size claims,
Flate decompression bombs, 'endobj' bytes inside stream data,
object-stream containers nested in object streams, lying ObjStm
headers) are refused or sliced past by declared lengths, never
scanned into. Indirect ``/Length N 0 R`` references — the shape
streaming writers emit, since they don't know a stream's length
until after its dict is written — RESOLVE through the xref table
via a bounded plain-integer parse (no recursion on hostile
structure; a length object living in an ObjStm, or the xref
stream's own length being indirect, refuses — chicken-and-egg
shapes stay refused).

The builder (:func:`pdf_build`) writes spec-valid single-font PDFs
(real xref offsets, Flate-compressed content streams) so the parser
is roundtrip-testable without any PDF library in the container —
and so the s13 catalog entry can gate the whole chain against a
DuckDB oracle that replays the page-chunking arithmetic.

Cost tier: bytes-level per-row Python — Arrow-batched
``mapInPandas`` media kernels only, like the image codecs.
"""

from __future__ import annotations

import re
import zlib

_ESC = {0x28: b"\\(", 0x29: b"\\)", 0x5C: b"\\\\"}

#: bounded-inflate cap for content streams (pages are KB-scale; a
#: stream inflating past this is a decompression bomb, refused).
_MAX_INFLATE = 8 * 1024 * 1024


def _escape_string(s: str) -> bytes:
    """PDF text-string bytes for ``s``: latin-1 when it fits, else
    the spec's UTF-16BE form (BOM FE FF + utf-16-be) — real web text
    is not latin-1, and a builder that raises on an em dash kills
    the kernel it runs in. Delimiter bytes are escaped bytewise
    (UTF-16 code units legitimately contain 0x28/0x29/0x5C)."""
    try:
        raw = s.encode("latin-1")
        if raw[:2] == b"\xfe\xff":
            # latin-1 text that HAPPENS to start with the BOM bytes
            # would be mis-decoded as UTF-16BE on the way back —
            # emit it in the UTF-16BE form too (always reversible)
            raw = b"\xfe\xff" + s.encode("utf-16-be")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    return b"".join(_ESC.get(b, bytes([b])) for b in raw)


# Adobe Glyph List subset (public AGL) — printable ASCII, the names
# simple-font /Differences arrays use. Shared by the builder (char →
# name when emitting a subset encoding) and the extractor (name →
# char when no ToUnicode entry covers a code).
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"',
    "numbersign": "#", "dollar": "$", "percent": "%",
    "ampersand": "&", "quotesingle": "'", "parenleft": "(",
    "parenright": ")", "asterisk": "*", "plus": "+", "comma": ",",
    "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~",
    **{c: c for c in
       "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"},
}
_AGL_NAME = {ch: name for name, ch in _AGL.items()}


def _glyph_coder(
    pages: list[str], width: int = 1
) -> tuple[dict[str, int], bytes, bytes]:
    """The subset-font coding for ``pages``: a NON-identity char →
    glyph-code map (codes assigned sequentially over the ord-sorted
    distinct characters — the shape real subsetters emit), the
    ``/Differences`` array bytes, and the ToUnicode CMap stream
    bytes.

    ``width=1`` (simple font): codes start at 0x21 and the mapping
    splits across the two public decode channels so an extractor
    must implement BOTH — every 7th mapping with an AGL-named char
    goes to /Differences ONLY; the rest go to the ToUnicode CMap —
    maximal ord-aligned runs of ≥3 as bfrange (the first such run in
    the ARRAY destination form, later ones in the start-code form),
    singles/pairs as bfchar. Raises ValueError past 223 distinct
    characters (a simple font has one-byte codes).

    ``width=2`` (Type0/Identity-H composite font): codes start at 1
    (glyph 0 is .notdef), EVERY mapping rides the ToUnicode CMap in
    4-hex-digit source form under a ``<0000> <FFFF>``
    codespacerange (composite fonts have no /Differences channel —
    the differences bytes return empty). Raises ValueError past
    65534 distinct characters."""
    chars = sorted(set("".join(pages)))
    budget = 0xFF - 0x21 + 1 if width == 1 else 0xFFFE
    if len(chars) > budget:
        raise ValueError(
            f"subset font: more than {budget} distinct chars"
        )
    if not chars:
        chars = [" "]  # all-empty pages still need a font program
    first_code = 0x21 if width == 1 else 1
    code_of = {ch: first_code + i for i, ch in enumerate(chars)}
    diff_only = {
        ch for i, ch in enumerate(chars)
        if width == 1 and i % 7 == 3 and ch in _AGL_NAME
    }
    code_fmt = b"%02X" if width == 1 else b"%04X"
    # ---- /Differences: the diff-only codes, run-compressed ----
    diff_parts: list[str] = []
    prev_code = None
    for ch in chars:
        if ch not in diff_only:
            continue
        code = code_of[ch]
        if prev_code != code - 1:
            diff_parts.append(str(code))
        diff_parts.append("/" + _AGL_NAME[ch])
        prev_code = code
    differences = (" ".join(diff_parts)).encode("ascii")
    # ---- ToUnicode: the rest, bfranges over ord-aligned runs ----
    tu_chars = [ch for ch in chars if ch not in diff_only]
    runs: list[list[str]] = []
    for ch in tu_chars:
        if (
            runs
            and ord(ch) == ord(runs[-1][-1]) + 1
            and code_of[ch] == code_of[runs[-1][-1]] + 1
        ):
            runs[-1].append(ch)
        else:
            runs.append([ch])
    bfchar: list[bytes] = []
    bfrange: list[bytes] = []
    array_form_used = False
    for run in runs:
        if len(run) < 3:
            for ch in run:
                bfchar.append(
                    b"<" + code_fmt % code_of[ch] + b"> <%s>" % (
                        ch.encode("utf-16-be").hex().upper().encode(),
                    )
                )
            continue
        lo, hi = code_of[run[0]], code_of[run[-1]]
        span = b"<" + code_fmt % lo + b"> <" + code_fmt % hi + b">"
        if not array_form_used:
            array_form_used = True
            dsts = b" ".join(
                b"<%s>" % ch.encode("utf-16-be").hex().upper()
                .encode() for ch in run
            )
            bfrange.append(span + b" [%s]" % dsts)
        else:
            bfrange.append(
                span + b" <%s>" % (
                    run[0].encode("utf-16-be").hex().upper().encode(),
                )
            )
    cmap = bytearray(
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
    )
    if width == 2:
        cmap += (
            b"1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n"
        )
    if bfchar:
        cmap += b"%d beginbfchar\n" % len(bfchar)
        cmap += b"\n".join(bfchar) + b"\nendbfchar\n"
    if bfrange:
        cmap += b"%d beginbfrange\n" % len(bfrange)
        cmap += b"\n".join(bfrange) + b"\nendbfrange\n"
    cmap += b"endcmap\nend\nend\n"
    return code_of, differences, bytes(cmap)


def _subset_font_dict(
    code_of: dict[str, int], differences: bytes, tou_num: int
) -> bytes:
    codes = sorted(code_of.values())
    return (
        (
            f"<< /Type /Font /Subtype /TrueType "
            f"/BaseFont /GRAFTA+FakeSans "
            f"/FirstChar {codes[0]} /LastChar {codes[-1]} "
            f"/Encoding << /Type /Encoding /Differences ["
        ).encode()
        + differences
        + f"] >> /ToUnicode {tou_num} 0 R >>".encode()
    )


def _cmap_stream_obj(cmap: bytes) -> bytes:
    cmap_flate = zlib.compress(cmap, 6)
    return (
        f"<< /Length {len(cmap_flate)} /Filter /FlateDecode >>"
        .encode()
        + b"\nstream\n" + cmap_flate + b"\nendstream"
    )


def _coded_literal(coder: dict[str, int], text: str) -> bytes:
    raw = bytes(coder[ch] for ch in text)
    return b"".join(_ESC.get(b, bytes([b])) for b in raw)


def _coded_hex(
    coder: dict[str, int], text: str, width: int = 1
) -> bytes:
    """``text``'s glyph codes as hex-string body digits — the
    show-operand form real subsetters emit (no escaping needed;
    2-byte composite codes are 4 hex digits each)."""
    fmt = "%02X" if width == 1 else "%04X"
    return "".join(fmt % coder[ch] for ch in text).encode("ascii")


def _type0_font_dict(desc_num: int, tou_num: int) -> bytes:
    """A Type0/Identity-H composite font dict (ISO 32000 §9.7) —
    the dominant modern subset-font class: 2-byte show-string codes,
    CID = glyph id under /Identity-H, text meaning carried ONLY by
    the /ToUnicode CMap."""
    return (
        f"<< /Type /Font /Subtype /Type0 /BaseFont /GRAFTA+FakeCJK "
        f"/Encoding /Identity-H "
        f"/DescendantFonts [{desc_num} 0 R] "
        f"/ToUnicode {tou_num} 0 R >>"
    ).encode()


_CID_FONT_DICT = (
    b"<< /Type /Font /Subtype /CIDFontType2 "
    b"/BaseFont /GRAFTA+FakeCJK "
    b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
    b"/Supplement 0 >> /CIDToGIDMap /Identity >>"
)


def _page_objects(
    pages: list[str],
    subset_font: bool = False,
    mixed_fonts: bool = False,
    type0: bool = False,
    hex_strings: bool = False,
    quote_ops: bool = False,
) -> list[bytes]:
    """The shared object bodies for the builder variants. Layout:
    1=catalog, 2=pages tree, 3=font, then (page, contents) pairs —
    ``3 + 2 * n_pages`` document objects; with ``subset_font`` a
    ToUnicode CMap STREAM is appended as object ``4 + 2*n`` and the
    font becomes a glyph-coded subset (content-stream string bytes
    are glyph CODES, decodable only through /Differences +
    ToUnicode — the majority shape of real crawled PDFs, whose Tj
    bytes are subset indices, not character codes); with
    ``mixed_fonts`` each page shows its FIRST half through the
    identity /F1 and its second half through a glyph-coded subset
    /F2 (``/F2 12 Tf`` mid-stream — the text-state switch every
    real multi-font page makes), appending the /F2 font dict as
    object ``4 + 2*n`` and its ToUnicode CMap as ``5 + 2*n``; with
    ``type0`` the font is a Type0/Identity-H COMPOSITE (2-byte
    glyph codes shown as hex strings, split ``<A> Tj <B> '`` across
    Tj and the move-and-show quote operator), appending the
    descendant CIDFontType2 dict as ``4 + 2*n`` and the 2-byte-code
    ToUnicode CMap as ``5 + 2*n``.

    ``hex_strings`` (subset_font modifier) shows each page's glyph
    codes as HEX string objects — a ``<...> Tj`` head plus a
    ``[<...> -250 <...>] TJ`` kerned array tail, the operand forms
    real subsetters emit; ``quote_ops`` (subset_font modifier)
    shows the page in thirds through all three string-showing
    operator forms: ``(A) Tj (B) ' 1 2 (C) \"``."""
    if sum((subset_font, mixed_fonts, type0)) > 1:
        raise ValueError(
            "subset_font, mixed_fonts and type0 are exclusive"
        )
    if (hex_strings or quote_ops) and not subset_font:
        raise ValueError(
            "hex_strings/quote_ops modify the subset_font arm"
        )
    if hex_strings and quote_ops:
        raise ValueError("hex_strings and quote_ops are exclusive")
    n = len(pages)
    objects: list[bytes] = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objects.append(
        b"<< /Type /Catalog /Pages 2 0 R >>"
    )
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    coder = None
    halves: list[tuple[str, str]] = []
    if subset_font:
        code_of, differences, cmap = _glyph_coder(pages)
        coder = code_of
        objects.append(
            _subset_font_dict(code_of, differences, 4 + 2 * n)
        )
    elif type0:
        code_of, _diff, cmap = _glyph_coder(pages, width=2)
        coder = code_of
        objects.append(_type0_font_dict(4 + 2 * n, 5 + 2 * n))
    else:
        objects.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        if mixed_fonts:
            halves = [
                (t[: len(t) // 2], t[len(t) // 2:]) for t in pages
            ]
            code_of, differences, cmap = _glyph_coder(
                [h2 for _, h2 in halves]
            )
            coder = code_of
    for i, text in enumerate(pages):
        resources = "/Font << /F1 3 0 R >>"
        if mixed_fonts:
            h1, h2 = halves[i]
            content = (
                b"BT /F1 12 Tf 72 720 Td ("
                + _escape_string(h1)
                + b") Tj /F2 12 Tf ("
                + _coded_literal(coder, h2)
                + b") Tj ET"
            )
            resources = (
                f"/Font << /F1 3 0 R /F2 {4 + 2 * n} 0 R >>"
            )
        elif type0:
            # both composite show forms: hex Tj + hex move-and-show
            a, b = text[: len(text) // 2], text[len(text) // 2:]
            content = (
                b"BT /F1 12 Tf 72 720 Td <"
                + _coded_hex(coder, a, 2)
                + b"> Tj <"
                + _coded_hex(coder, b, 2)
                + b"> ' ET"
            )
        elif hex_strings:
            # hex head + kerned hex TJ array tail
            a, rest = text[: len(text) // 3], text[len(text) // 3:]
            b1, b2 = rest[: len(rest) // 2], rest[len(rest) // 2:]
            content = (
                b"BT /F1 12 Tf 72 720 Td <"
                + _coded_hex(coder, a)
                + b"> Tj [<"
                + _coded_hex(coder, b1)
                + b"> -250 <"
                + _coded_hex(coder, b2)
                + b">] TJ ET"
            )
        elif quote_ops:
            # all three string-showing operators on one page
            t1 = text[: len(text) // 3]
            t2 = text[len(text) // 3: 2 * len(text) // 3]
            t3 = text[2 * len(text) // 3:]
            content = (
                b"BT /F1 12 Tf 72 720 Td ("
                + _coded_literal(coder, t1)
                + b") Tj ("
                + _coded_literal(coder, t2)
                + b") ' 1 2 ("
                + _coded_literal(coder, t3)
                + b') " ET'
            )
        else:
            lit = (
                _coded_literal(coder, text)
                if coder is not None
                else _escape_string(text)
            )
            content = b"BT /F1 12 Tf 72 720 Td (" + lit + b") Tj ET"
        flate = zlib.compress(content, 6)
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << {resources} >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )
        objects.append(
            f"<< /Length {len(flate)} /Filter /FlateDecode >>"
            .encode()
            + b"\nstream\n"
            + flate
            + b"\nendstream"
        )
    if subset_font:
        objects.append(_cmap_stream_obj(cmap))
    elif mixed_fonts:
        objects.append(
            _subset_font_dict(code_of, differences, 5 + 2 * n)
        )
        objects.append(_cmap_stream_obj(cmap))
    elif type0:
        objects.append(_CID_FONT_DICT)
        objects.append(_cmap_stream_obj(cmap))
    return objects


def pdf_build(
    pages: list[str],
    xref_stream: bool = False,
    subset_font: bool = False,
    mixed_fonts: bool = False,
    type0: bool = False,
    hex_strings: bool = False,
    quote_ops: bool = False,
) -> bytes:
    """Serialize a PDF document with one Flate-compressed content
    stream per page, each showing its page's text as a single ``Tj``
    string (object layout per :func:`_page_objects`).

    ``xref_stream=False`` (default): PDF 1.4 — a REAL classic xref
    table (exact 20-byte entries, byte offsets) plus a trailer
    dictionary.

    ``xref_stream=True``: PDF 1.5 — the non-stream objects (catalog,
    pages tree, font, page dictionaries) are packed into ONE
    ``/Type /ObjStm`` object stream and addressed by type-2 xref
    entries; content streams stay direct (streams may not live
    inside an object stream, per spec) and declare their lengths
    INDIRECTLY (``/Length N 0 R`` with one plain-integer length
    object per page — the shape streaming writers emit, gating the
    parser's resolution path); the cross-reference itself is a
    ``/Type /XRef`` STREAM with ``/W [1 4 2]`` binary rows,
    Flate-compressed under the PNG Up predictor (``/DecodeParms
    << /Predictor 12 /Columns 7 >>`` — the layout real writers
    emit). Total objects = ``3 + 3*n_pages + 2`` (+ObjStm +XRef
    +one length object per page).

    ``subset_font=True``: the font becomes a glyph-coded SUBSET
    (see :func:`_page_objects`) — content-stream string bytes are
    glyph codes, NOT character codes, decodable only through the
    font's ``/Encoding /Differences`` and ``/ToUnicode`` CMap; one
    more object (the CMap stream, direct in both variants — streams
    may not live in an ObjStm).

    ``mixed_fonts=True``: identity /F1 AND a glyph-coded subset /F2
    per page with a mid-stream ``/F2 12 Tf`` switch — two more
    objects (the /F2 font dict, ObjStm-able, and its CMap stream,
    direct).

    ``type0=True``: a Type0/Identity-H COMPOSITE font — 2-byte
    glyph codes shown as HEX string operands split across ``Tj``
    and the ``'`` move-and-show operator, the dominant modern
    subset-font shape in real crawls — two more objects (the
    descendant CIDFontType2 dict, ObjStm-able, and the 2-byte-code
    ToUnicode CMap stream, direct).

    ``hex_strings=True`` / ``quote_ops=True`` (subset_font
    modifiers): hex-string show operands (``<..> Tj`` +
    ``[<..> -250 <..>] TJ``), or all three literal-showing operator
    forms (``Tj``/``'``/``\"``) — same object layout as plain
    ``subset_font``."""
    if not pages:
        raise ValueError("pdf_build: at least one page required")
    n = len(pages)
    objects = _page_objects(
        pages, subset_font, mixed_fonts, type0, hex_strings,
        quote_ops,
    )
    if not xref_stream:
        out = bytearray(b"%PDF-1.4\n")
        offsets = [0]  # object 0 is the free head
        for num, body in enumerate(objects, start=1):
            offsets.append(len(out))
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objects) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    # ---- PDF 1.5: ObjStm + XRef stream + indirect lengths ----
    # base = highest document object (3+2n, +1 for the subset-font
    # ToUnicode CMap stream); container numbering flows from it
    base = len(objects)
    objstm_num = base + 1
    xref_num = base + 2
    # one plain-integer length object per content stream, after xref
    length_num = {5 + 2 * i: base + 3 + i for i in range(n)}
    size = base + 3 + n
    # rewrite each content stream's direct /Length to the indirect
    # reference its length object will carry
    stream_len: dict[int, int] = {}
    for i in range(n):
        num = 5 + 2 * i
        body = objects[num - 1]
        m = re.match(rb"<< /Length (\d+) ", body)
        stream_len[num] = int(m.group(1))
        objects[num - 1] = (
            b"<< /Length " + f"{length_num[num]} 0 R ".encode()
            + body[m.end():]
        )
    # compressed members: every non-stream object, in number order
    compressed = [1, 2, 3] + [4 + 2 * i for i in range(n)]
    if mixed_fonts or type0:  # the /F2 font dict (mixed) or the
        # descendant CIDFont dict (type0) is a non-stream object —
        # it rides the ObjStm
        compressed.append(4 + 2 * n)
    member_idx = {num: i for i, num in enumerate(compressed)}
    bodies = [objects[num - 1] for num in compressed]
    header = bytearray()
    payload = bytearray()
    for num, body in zip(compressed, bodies):
        header += f"{num} {len(payload)} ".encode()
        payload += body + b"\n"
    stm = bytes(header) + bytes(payload)
    objstm_flate = zlib.compress(stm, 6)
    objstm = (
        f"<< /Type /ObjStm /N {len(compressed)} /First {len(header)} "
        f"/Length {len(objstm_flate)} /Filter /FlateDecode >>"
        .encode()
        + b"\nstream\n" + objstm_flate + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n")
    direct_offsets: dict[int, int] = {}
    direct_nums = [5 + 2 * i for i in range(n)]
    if subset_font:  # the ToUnicode CMap stream is direct too
        direct_nums.append(4 + 2 * n)
    elif mixed_fonts or type0:  # the CMap stream (the font dict
        direct_nums.append(5 + 2 * n)  # rides the ObjStm)
    for num in direct_nums:
        direct_offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num - 1] + b"\nendobj\n"
    direct_offsets[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode() + objstm + b"\nendobj\n"
    for i in range(n):  # the plain-integer length objects
        num = length_num[5 + 2 * i]
        direct_offsets[num] = len(out)
        out += (
            f"{num} 0 obj\n{stream_len[5 + 2 * i]}\nendobj\n".encode()
        )

    # xref rows, W = [1, 4, 2]: type, field2, field3
    rows = bytearray()
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in member_idx:
            t, f2, f3 = 2, objstm_num, member_idx[num]
        elif num == xref_num:
            t, f2, f3 = 1, len(out), 0
        else:
            t, f2, f3 = 1, direct_offsets[num], 0
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    # PNG Up predictor (12): tag byte 2, row minus previous row
    columns = 7
    pred = bytearray()
    prev = bytes(columns)
    for r in range(0, len(rows), columns):
        row = bytes(rows[r:r + columns])
        pred += b"\x02" + bytes(
            (row[i] - prev[i]) & 0xFF for i in range(columns)
        )
        prev = row
    xref_flate = zlib.compress(bytes(pred), 6)
    xref_at = len(out)
    out += (
        f"{xref_num} 0 obj\n"
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Root 1 0 R "
        f"/DecodeParms << /Predictor 12 /Columns {columns} >> "
        f"/Length {len(xref_flate)} /Filter /FlateDecode >>"
        .encode()
        + b"\nstream\n" + xref_flate + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def _parse_xref(d: bytes) -> tuple[list, bytes] | None:
    """startxref → cross-reference → (entry table indexed by object
    number, trailer dictionary bytes). Handles BOTH forms: the
    classic ``xref`` table (trailer = the ``trailer`` dict after the
    table) and the PDF 1.5 cross-reference STREAM (trailer = the
    XRef stream's own dictionary, which carries /Root and /Size per
    spec). None on malformed/absent xref — no fallback scanning; an
    offset table that lies is a refusal, not a heuristic."""
    tail = d[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass  # last startxref wins (incremental updates)
    if m is None:
        return None
    xref_at = int(m.group(1))
    if d[xref_at:xref_at + 4] != b"xref":
        return _parse_xref_stream(d, xref_at)
    pos = xref_at + 4
    offsets: dict[int, int] = {}
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", d[pos:pos + 64])
        if m is None:
            break
        start, count = int(m.group(1)), int(m.group(2))
        # bound: a real object needs >= ~8 bytes of document; an
        # xref claiming a billion objects in a 400-byte file is a
        # memory DoS, not a document — refuse before allocating
        if start + count > len(d) // 8 + 16:
            return None
        pos += m.end()
        for i in range(count):
            entry = d[pos:pos + 20]
            if len(entry) < 18:
                return None
            em = re.match(rb"(\d{10}) (\d{5}) ([nf])", entry)
            if em is None:
                return None
            if em.group(3) == b"n":
                offsets[start + i] = int(em.group(1))
            pos += 20
    if not offsets:
        return None
    tm = re.match(rb"\s*trailer", d[pos:pos + 32])
    if tm is None:
        return None
    trailer = _dict_of(d[pos + tm.end():pos + tm.end() + 2048])
    if not trailer:
        return None
    size = max(offsets) + 1
    table: list = [-1] * size
    for num, off in offsets.items():
        table[num] = off
    return table, trailer


def _png_unpredict(data: bytes, predictor: int, columns: int) -> bytes | None:
    """Undo PNG row predictors (10-15 — the per-row tag byte decides
    the actual filter, per the PNG spec ISO 32000 §7.4.4.4 points
    at) over ``columns``-byte rows with 1-byte pixels (xref streams
    are /Colors 1 /BitsPerComponent 8). TIFF predictor 2 and
    malformed row framing are refused (None)."""
    if predictor == 1:
        return data
    if not 10 <= predictor <= 15:
        return None
    if columns < 1 or len(data) % (columns + 1):
        return None
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns + 1):
        tag = data[r]
        row = bytearray(data[r + 1:r + 1 + columns])
        if tag == 0:
            pass
        elif tag == 1:  # Sub: left neighbor (bpp = 1)
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif tag == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (
                    b if pb <= pc else c
                )
                row[i] = (row[i] + pred) & 0xFF
        else:
            return None  # unknown row filter: refused
        out += row
        prev = bytes(row)
    return bytes(out)


def _parse_xref_stream(d: bytes, off: int) -> tuple[list, bytes] | None:
    """PDF 1.5 cross-reference STREAM at byte ``off``: an ordinary
    stream object whose dictionary is also the trailer. Binary rows
    are walked by the /W field-width triple over the /Index
    subsections (default ``[0 /Size]``); type 1 rows are direct byte
    offsets, type 2 rows are (object-stream, index) pairs, type 0
    free, unknown types skipped per spec (treat as null). Refused
    loudly: /Prev incremental chains, absent/oversized /Size (the
    classic billion-object DoS bound), /W widths past 8 bytes, row
    underrun, predictors outside PNG 10-15."""
    m = re.match(rb"(\d+)\s+\d+\s+obj\b", d[off:off + 32])
    if m is None:
        return None
    body_at = off + m.end()
    body = d[body_at:body_at + 65536]  # head-discovery window only
    head = _dict_of(body)
    if not head or b"/XRef" not in head:
        return None
    if b"/Prev" in head:
        return None  # incremental-update chains: outside the subset
    length = _direct_length(head)
    if length < 0:
        return None
    wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", head)
    szm = re.search(rb"/Size\s+(\d+)", head)
    if wm is None or szm is None:
        return None
    w = tuple(int(x) for x in wm.groups())
    size = int(szm.group(1))
    if size > len(d) // 8 + 16:
        return None  # billion-object /Size claim: refused
    rowlen = sum(w)
    if rowlen == 0 or max(w) > 8:
        return None
    idxm = re.search(rb"/Index\s*\[([^\]]*)\]", head)
    if idxm is not None:
        nums = [int(x) for x in re.findall(rb"\d+", idxm.group(1))]
        if not nums or len(nums) % 2:
            return None
        index = list(zip(nums[::2], nums[1::2]))
    else:
        index = [(0, size)]
    if any(s + c > size for s, c in index):
        return None
    # slice the stream data exactly like any other object: the
    # declared direct /Length drives it, never a delimiter scan.
    # The budget is anchored at the dict's REAL '<<' offset (there
    # may be whitespace/comments between 'N 0 obj' and the dict,
    # which a fixed slack would mis-budget), + the dict, + room for
    # 'stream\r\n', + the declared payload — sliced from d, not the
    # 64 KB head window, so large xref streams aren't truncated.
    dict_at = body.find(b"<<")
    obj_slice = d[body_at:body_at + dict_at + len(head) + 64 + length]
    data = _stream_data(obj_slice)
    if data is None:
        return None
    pm = re.search(rb"/Predictor\s+(\d+)", head)
    if pm is not None:
        cm = re.search(rb"/Columns\s+(\d+)", head)
        columns = int(cm.group(1)) if cm is not None else 1
        data = _png_unpredict(data, int(pm.group(1)), columns)
        if data is None:
            return None
    table: list = [-1] * size
    pos = 0
    for start, count in index:
        for i in range(count):
            row = data[pos:pos + rowlen]
            if len(row) < rowlen:
                return None
            pos += rowlen
            # width-0 field 1 defaults to type 1 per spec
            t = int.from_bytes(row[:w[0]], "big") if w[0] else 1
            f2 = int.from_bytes(row[w[0]:w[0] + w[1]], "big")
            f3 = int.from_bytes(row[w[0] + w[1]:rowlen], "big")
            if t == 1:
                table[start + i] = f2
            elif t == 2:
                table[start + i] = ("s", f2, f3)
            # t == 0 free / unknown types: left absent (null)
    return table, head


def _object_at(d: bytes, num: int, offsets: list) -> bytes | None:
    """Slice object ``num`` at its xref offset; validates the header
    actually declares that object number (a lying xref is refused).
    When the object carries a stream, the declared /Length drives
    the slice PAST the stream data before ``endobj`` is searched —
    compressed payloads can legitimately contain the 6-byte
    sequence 'endobj', so scanning for it inside stream bytes would
    truncate valid objects (the WARC Content-Length discipline).
    Type-2 entries (object compressed inside an /ObjStm container)
    resolve through :func:`_objstm_object`."""
    if not 0 <= num < len(offsets):
        return None
    entry = offsets[num]
    if isinstance(entry, tuple):
        return _objstm_object(d, num, entry[1], entry[2], offsets)
    if entry < 0:
        return None
    off = entry
    m = re.match(rb"(\d+)\s+\d+\s+obj\b", d[off:off + 32])
    if m is None or int(m.group(1)) != num:
        return None
    body_start = off + m.end()
    search_from = body_start
    win = d[body_start:body_start + 65536]
    head = _dict_of(win)
    if head:
        dict_end = body_start + win.find(b"<<") + len(head)
        lm = _resolve_length(d, head, offsets)
        sm = re.match(rb"\s*stream", d[dict_end:dict_end + 16])
        if sm is not None and lm < 0 and b"/Length" in head:
            return None  # unresolvable stream length: refused
        if lm >= 0 and sm is not None:
            data_at = dict_end + sm.end()
            if d[data_at:data_at + 2] == b"\r\n":
                data_at += 2
            elif d[data_at:data_at + 1] == b"\n":
                data_at += 1
            search_from = data_at + lm
    end = d.find(b"endobj", search_from)
    if end < 0:
        return None
    return d[body_start:end]


def _objstm_object(
    d: bytes, num: int, container: int, idx: int, offsets: list
) -> bytes | None:
    """Resolve a type-2 xref entry: object ``num`` is member ``idx``
    of the ``/Type /ObjStm`` stream object ``container``. The
    container must itself be a DIRECT object (the spec forbids
    object streams inside object streams — and honoring a nested
    claim would recurse on attacker-controlled depth, so the table
    entry is checked BEFORE the fetch); its header is ``/N`` pairs
    of ``objnum offset`` relative to ``/First``. The pair's declared
    object number must BE ``num`` — a lying header is refused like a
    lying xref offset. Slices run to the next member's offset (or
    stream end), never by delimiter scan."""
    if not 0 <= container < len(offsets):
        return None
    if not isinstance(offsets[container], int) or offsets[container] < 0:
        return None  # nested-ObjStm claim or free container: refused
    cobj = _object_at(d, container, offsets)
    if cobj is None:
        return None
    head = _dict_of(cobj)
    if b"/ObjStm" not in head:
        return None  # type-2 entry pointing at a non-ObjStm object
    nm = re.search(rb"/N\s+(\d+)", head)
    fm = re.search(rb"/First\s+(\d+)", head)
    if nm is None or fm is None:
        return None
    n, first = int(nm.group(1)), int(fm.group(1))
    data = _stream_data(cobj, d, offsets)
    if data is None:
        return None
    # the header region is ASCII pairs; N is bounded by the stream's
    # real size (2 bytes minimum per pair), so no DoS allocation
    if not 0 <= idx < n or first > len(data) or n > first // 2 + 1:
        return None
    pairs = re.findall(rb"(\d+)\s+(\d+)", data[:first])
    if len(pairs) != n:
        return None
    objnum, rel = int(pairs[idx][0]), int(pairs[idx][1])
    if objnum != num:
        return None  # lying ObjStm header: refused
    start = first + rel
    end = first + int(pairs[idx + 1][1]) if idx + 1 < n else len(data)
    if not first <= start <= end <= len(data):
        return None
    return data[start:end]


def _direct_length(head: bytes) -> int:
    """The dictionary's direct /Length value, -1 when absent, -2
    when it is an INDIRECT reference (``/Length 7 0 R``) — common in
    real crawled PDFs (writers that stream content out don't know
    the length until after the dict is written). Callers holding the
    xref table resolve -2 through :func:`_resolve_length`; callers
    without one (the xref stream itself — chicken-and-egg) refuse,
    because treating the object number as a byte count silently
    truncates streams."""
    m = re.search(rb"/Length\s+(\d+)", head)
    if m is None:
        return -1
    if re.match(rb"\s+\d+\s+R\b", head[m.end():]):
        # ANY generation reads as indirect — ``/Length 7 1 R`` must
        # not parse as direct length 7 and mis-slice the stream.
        # _resolve_length only resolves generation 0, so non-zero
        # generations refuse there explicitly.
        return -2
    return int(m.group(1))


def _resolve_length(d: bytes, head: bytes, offsets: list) -> int:
    """The stream dictionary's /Length as an int, resolving ONE
    indirect reference through the xref table when needed. The
    length object must be a DIRECT plain-integer object (``7 0 obj
    737 endobj``) — it is parsed with a bounded regex, never through
    the object machinery, so no recursion on attacker-controlled
    structure is possible (a length living in an ObjStm would need
    the container's stream, whose length could point back here).
    Returns -1 on absence or any refusal."""
    lm = _direct_length(head)
    if lm != -2:
        return lm
    m = re.search(rb"/Length\s+(\d+)\s+0\s+R\b", head)
    if m is None:  # -2 implies it matches, but stay total
        return -1
    num = int(m.group(1))
    if not 0 <= num < len(offsets):
        return -1
    entry = offsets[num]
    if not isinstance(entry, int) or entry < 0:
        return -1  # free, absent, or ObjStm-compressed: refused
    hm = re.match(rb"(\d+)\s+\d+\s+obj\b", d[entry:entry + 32])
    if hm is None or int(hm.group(1)) != num:
        return -1  # lying xref offset: refused
    vm = re.match(
        rb"\s*(\d+)\s*endobj\b", d[entry + hm.end():entry + hm.end() + 48]
    )
    if vm is None:
        return -1  # not a plain integer object: refused
    return int(vm.group(1))


_REF_RX = rb"(\d+)\s+0\s+R"


def _dict_of(obj: bytes) -> bytes:
    """The top-level << ... >> dictionary of an object body
    (balanced-delimiter walk; nested dicts stay inside)."""
    start = obj.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    while i + 1 < len(obj):
        pair = obj[i:i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return obj[start:i]
        else:
            i += 1
    return b""


def _stream_data(
    obj: bytes, d: bytes | None = None, offsets: list | None = None
) -> bytes | None:
    """stream ... endstream payload, FlateDecoded when the object
    dictionary says /Filter /FlateDecode (the only filter this
    subset ships); /Length drives the slice. Callers passing the
    document and xref table get indirect ``/Length N 0 R``
    references resolved (:func:`_resolve_length`); without them —
    the xref stream's own dict, where a table does not exist yet —
    an indirect length refuses."""
    head = _dict_of(obj)
    if d is not None and offsets is not None:
        length = _resolve_length(d, head, offsets)
    else:
        length = _direct_length(head)
        if length == -2:
            length = -1
    s = obj.find(b"stream")
    if length < 0 or s < 0:
        return None  # absent or unresolvable /Length: refused
    data_at = s + len(b"stream")
    if obj[data_at:data_at + 2] == b"\r\n":
        data_at += 2
    elif obj[data_at:data_at + 1] == b"\n":
        data_at += 1
    raw = obj[data_at:data_at + length]
    if b"/Filter" in head:
        if b"/FlateDecode" not in head:
            return None  # LZW/ASCII85/DCT: outside the subset
        try:
            # bounded inflate: a hostile 1000:1 Flate bomb must not
            # OOM the Arrow kernel — content streams are page-sized
            dec = zlib.decompressobj()
            out = dec.decompress(raw, _MAX_INFLATE)
            if dec.unconsumed_tail:
                return None  # refused: inflates past the cap
            return out
        except zlib.error:
            return None
    return raw


#: Hostile-shape bound: a ToUnicode CMap claiming more code
#: mappings than a simple font can even address is attacker input.
_MAX_CMAP_ENTRIES = 65536


def _parse_tounicode(
    data: bytes, width: int = 1
) -> dict[int, str] | None:
    """code → text map from a ToUnicode CMap stream (ISO 32000
    §9.10.3): ``beginbfchar``/``endbfchar`` pairs and
    ``beginbfrange`` in BOTH destination forms (start-code and
    array). Source-code discipline follows the font class: simple
    fonts (``width=1``) code one byte (two hex digits — longer
    refuses), Type0/Identity-H composite fonts (``width=2``) code
    two bytes (exactly four hex digits). Destinations are UTF-16BE
    (hex length a multiple of 4; multi-unit ligature targets
    decode), range bounds must satisfy lo ≤ hi ≤ the width's code
    ceiling, array-form destination counts must equal the range
    width, duplicate source codes refuse (a lying writer, not a
    dialect), and the total mapping count is bounded by
    :data:`_MAX_CMAP_ENTRIES`. An empty-but-present CMap refuses —
    it would silently shadow the font's real coding."""
    src_hex = 2 * width
    code_max = (1 << (8 * width)) - 1
    mapping: dict[int, str] = {}

    def put(code: int, dst_hex: bytes) -> bool:
        if code in mapping or len(mapping) >= _MAX_CMAP_ENTRIES:
            return False
        if len(dst_hex) % 4 or not dst_hex:
            return False
        try:
            mapping[code] = bytes.fromhex(
                dst_hex.decode("ascii")
            ).decode("utf-16-be")
        except (ValueError, UnicodeDecodeError):
            return False
        return True

    pair_rx = re.compile(
        rb"\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>"
    )
    for block in re.finditer(
        rb"beginbfchar(.*?)endbfchar", data, re.S
    ):
        body = block.group(1)
        # pos-anchored walk, not findall: a dangling odd hex token
        # (`<41> <0042> <43>`) must refuse, not silently drop
        pos = 0
        while body[pos:].strip():
            m = pair_rx.match(body, pos)
            if m is None:
                return None  # grammar violation: refuse
            src, dst = m.group(1), m.group(2)
            if len(src) != src_hex:
                return None  # wrong code width for the font class
            if not put(int(src, 16), dst):
                return None
            pos = m.end()
    for block in re.finditer(
        rb"beginbfrange(.*?)endbfrange", data, re.S
    ):
        body = block.group(1)
        if re.sub(rb"<[0-9A-Fa-f]+>|[\[\]]|\s+", b"", body):
            return None
        pos = 0
        entry_rx = re.compile(
            rb"\s*<([0-9A-Fa-f]{%d})>\s*<([0-9A-Fa-f]{%d})>\s*"
            rb"(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\])"
            % (src_hex, src_hex)
        )
        while body[pos:].strip():
            m = entry_rx.match(body, pos)
            if m is None:
                return None
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            if hi < lo or hi > code_max:
                return None
            if m.group(3) is not None:
                start = m.group(3)
                if len(start) % 4 or not start:
                    return None
                try:
                    first = bytes.fromhex(
                        start.decode("ascii")
                    ).decode("utf-16-be")
                except (ValueError, UnicodeDecodeError):
                    return None
                # start-form increments the LAST code unit; the
                # single-char case (the one this module emits and
                # real simple fonts use) is plain ord arithmetic
                if len(first) != 1:
                    return None
                for k in range(hi - lo + 1):
                    if lo + k in mapping or len(
                        mapping
                    ) >= _MAX_CMAP_ENTRIES:
                        return None
                    mapping[lo + k] = chr(ord(first) + k)
            else:
                dsts = re.findall(
                    rb"<([0-9A-Fa-f]+)>", m.group(4)
                )
                if len(dsts) != hi - lo + 1:
                    return None
                for k, dst in enumerate(dsts):
                    if not put(lo + k, dst):
                        return None
            pos = m.end()
    if not mapping:
        return None
    return mapping


def _differences_map(font: bytes) -> dict[int, str] | None:
    """code → char map from a simple font's ``/Encoding``
    ``/Differences`` array: integers set the next code, names
    assign ``code`` → the AGL character and increment. Codes past
    0xFF and tokens that are neither refuse; a name OUTSIDE the
    :data:`_AGL` subset leaves its code unmapped (loud at USE time
    if a string actually needs it) rather than killing codes the
    ToUnicode CMap covers. Returns None when the array is absent
    (identity semantics upstream) or malformed."""
    m = re.search(rb"/Differences\s*\[([^\]]*)\]", font)
    if m is None:
        return None
    out: dict[int, str] = {}
    code = -1
    for tok in re.finditer(
        rb"(\d+)|/([A-Za-z0-9.]+)|(\S)", m.group(1)
    ):
        if tok.group(3) is not None:
            return None  # neither number nor name: malformed
        if tok.group(1) is not None:
            code = int(tok.group(1))
            if code > 0xFF:
                return None
            continue
        if code < 0 or code > 0xFF:
            return None
        name = tok.group(2).decode("ascii")
        if name in _AGL:
            out[code] = _AGL[name]
        code += 1
    return out


def _font_decode_map(
    d: bytes, offsets: list, font: bytes
) -> tuple[dict[int, str], int] | None:
    """The page font's (glyph-code → text map, code width) pair:
    ToUnicode CMap entries (authoritative for extraction per
    §9.10.2) overlaid on /Differences-with-AGL-names for codes the
    CMap doesn't cover. ``({}, 1)`` = the font declares NEITHER
    channel (identity semantics — the classic non-subset builder
    arm); None = the font declares a channel that refuses to parse
    (a lying/hostile font mangles silently if extraction proceeds).

    Composite fonts (``/Subtype /Type0``) are the dominant modern
    subset-font class in real crawls: their show-string bytes are
    TWO-byte glyph codes. The honest subset is ``/Encoding
    /Identity-H`` (code = CID = GID) with a REQUIRED ToUnicode CMap
    — without one the codes are font-internal glyph ids with no
    public text meaning, so extraction must refuse, not emit
    mojibake; named CMap encodings (UniGB-UCS2-H, ...), Identity-V
    vertical layout, and a /Differences array on a composite font
    (meaningless per spec — a lying writer) all refuse."""
    width = 1
    if re.search(rb"/Subtype\s*/Type0\b", font):
        width = 2
        if not re.search(rb"/Encoding\s*/Identity-H\b", font):
            return None  # named/vertical CMap encoding: refuse
        if b"/DescendantFonts" not in font:
            return None  # structurally not a composite font
        if b"/Differences" in font:
            return None  # no such channel on Type0: lying writer
        if b"/ToUnicode" not in font:
            return None  # 2-byte GIDs carry no public text meaning
    tu = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", font)
    diff = _differences_map(font)
    if b"/Differences" in font and diff is None:
        # a PRESENT-but-malformed array must refuse even when a
        # valid ToUnicode rides alongside — the codes the array was
        # supposed to carry would otherwise mangle silently
        return None
    if tu is None and diff is None:
        if b"/ToUnicode" in font:
            return None  # non-gen-0 ref: refuse
        return {}, 1
    mapping: dict[int, str] = dict(diff or {})
    if tu is not None:
        num = int(tu.group(1))
        if not 0 <= num < len(offsets):
            return None
        cobj = _object_at(d, num, offsets)
        if cobj is None:
            return None
        data = _stream_data(cobj, d, offsets)
        if data is None:
            return None
        parsed = _parse_tounicode(data, width)
        if parsed is None:
            return None
        mapping.update(parsed)
    if not mapping:
        return None
    return mapping, width


def _decode_string_bytes(
    data: bytes, dmap: dict[int, str] | None, width: int
) -> str | None:
    """Decode a string object's (already unescaped) bytes: with a
    glyph decode map (``dmap``) every ``width``-byte big-endian code
    unit is a GLYPH CODE mapped through it (an unmapped code — or an
    odd byte count under a 2-byte composite font — refuses: emitting
    raw bytes would be mojibake by construction); without one, BOM
    FE FF means the spec's UTF-16BE text-string form, anything else
    is latin-1 (the PDFDocEncoding subset this module emits)."""
    if dmap is not None:
        if width == 2:
            if len(data) % 2:
                return None  # dangling half a glyph code: refuse
            try:
                return "".join(
                    dmap[int.from_bytes(data[k:k + 2], "big")]
                    for k in range(0, len(data), 2)
                )
            except KeyError:
                return None  # unmapped glyph code: refuse
        try:
            return "".join(dmap[b] for b in data)
        except KeyError:
            return None  # unmapped glyph code: refuse, don't guess
    if data[:2] == b"\xfe\xff":
        try:
            return data[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return None
    return data.decode("latin-1")


def _hex_string_bytes(body: bytes) -> bytes | None:
    """The bytes of a ``<...>`` hex string object's body: PDF
    whitespace is insignificant, every remaining character must be a
    hex digit (anything else refuses — a lying writer, not a
    dialect), and a trailing odd digit is treated as if followed by
    0 (ISO 32000 §7.3.4.3)."""
    compact = re.sub(rb"[\x00\t\n\x0c\r ]+", b"", body)
    if re.fullmatch(rb"[0-9A-Fa-f]*", compact) is None:
        return None
    if len(compact) % 2:
        compact += b"0"
    return bytes.fromhex(compact.decode("ascii"))


def _unescape_string(
    raw: bytes,
    dmap: dict[int, str] | None = None,
    width: int = 1,
) -> str | None:
    """Unescape a string literal's bytes, then decode them through
    :func:`_decode_string_bytes` (glyph map per ``width``-byte code
    unit, or BOM-marked UTF-16BE / latin-1 without one)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt in (b"(", b")", b"\\"):
            out += nxt
            i += 2
        elif nxt == b"n":
            out += b"\n"
            i += 2
        elif nxt == b"r":
            out += b"\r"
            i += 2
        elif nxt == b"t":
            out += b"\t"
            i += 2
        elif nxt == b"\n":  # line continuation
            i += 2
        elif nxt and nxt in b"01234567":  # octal (1-3 OCTAL digits
            # only — b"" is a substring of anything, so the empty
            # check guards a trailing backslash; \8
            # and \9 are not octal — int(x, 8) would raise, and a
            # parser must refuse, never raise)
            j = i + 1
            while (
                j < len(raw) and j < i + 4
                and raw[j:j + 1] in b"01234567"
            ):
                j += 1
            out.append(int(raw[i + 1:j], 8) & 0xFF)
            i = j
        else:
            return None  # unknown escape: refuse
    return _decode_string_bytes(bytes(out), dmap, width)


#: A ``/Name size Tf`` font-selection operator — the text-state
#: switch real multi-font pages (i.e. nearly all real pages) flip
#: between subset fonts mid-stream.
_TF_RX = re.compile(rb"/([A-Za-z0-9]+)\s+[0-9.]+\s+Tf")


#: the operators that SHOW their string operand: Tj, and the two
#: move-and-show forms ' (next line + show) and " (set word/char
#: spacing + next line + show) — all three take the string as the
#: last operand, so the string is always immediately followed by
#: the operator token.
_SHOW_OPS = (b"Tj", b"'", b'"')

#: PDF token boundaries: whitespace (§7.2.2) + delimiters (§7.2.3)
#: — used to match two-letter operators like BI without firing
#: inside longer names/operators.
_PDF_DELIM_WS = b"\x00\t\n\x0c\r ()<>[]{}/%"


def _content_text(
    content: bytes,
    dmap: dict[int, str] | None = None,
    fonts: dict[bytes, tuple[dict[int, str] | None, int]]
    | None = None,
    width: int = 1,
) -> str | None:
    """Concatenate the arguments of every text-showing operator
    (``Tj``, ``TJ``, and the move-and-show forms ``'`` and ``\"``),
    in stream order, decoding string bytes through the ACTIVE font's
    glyph map: with ``fonts`` (name → (map or None for identity,
    code width)) the scan tracks ``/Fn size Tf`` text-state
    operators and switches maps mid-stream — real pages mix fonts,
    and a string shown under /F2 decoded with /F1's map is
    deterministic mojibake; a Tf naming a font absent from the
    page's /Font resources refuses. Without ``fonts``, ``dmap`` and
    ``width`` apply statically (the single-font path). Both string
    object forms decode: ``(...)`` literals (escape-aware) and
    ``<...>`` HEX strings — the dominant show-operand form for
    subset and Identity-H composite fonts in real crawls; a
    malformed hex body refuses, and ``<<`` (an inline dictionary —
    marked-content property lists etc.) is outside the honest
    subset and refuses LOUDLY rather than skipping, since a skipped
    dict could hide or corrupt show operands. TJ arrays interleave
    strings with kerning numbers (ignored). ONE stateful linear
    scan: string literals are consumed atomically with escape
    awareness (a ``\\)`` must not terminate the literal, and a
    ``[``/``]`` INSIDE a string must not look like array structure
    — raw-byte bracket scanning mis-attributed neighboring strings,
    found in the r9 review), and ``[...]`` groups buffer their
    strings until the closing bracket reveals whether the operator
    is TJ."""
    parts: list[str] = []
    array_buf: list[str] | None = None
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if fonts is not None and c == 0x2F:  # "/" — maybe a Tf
            m = _TF_RX.match(content, i)
            if m is not None:
                if m.group(1) not in fonts:
                    return None  # Tf names an undeclared font
                dmap, width = fonts[m.group(1)]
                i = m.end()
                continue
            i += 1
            continue
        if c == 0x28 or c == 0x3C:  # "(" literal or "<" hex string
            if c == 0x28:
                j = i + 1
                depth = 1
                buf = bytearray()
                while j < n and depth:
                    b = content[j]
                    if b == 0x5C:  # backslash: keep escape pair raw
                        buf += content[j:j + 2]
                        j += 2
                        continue
                    if b == 0x28:
                        depth += 1
                    elif b == 0x29:
                        depth -= 1
                        if depth == 0:
                            j += 1
                            break
                    buf.append(b)
                    j += 1
                if depth:
                    return None  # unterminated string
                s = _unescape_string(bytes(buf), dmap, width)
            else:
                if content[i + 1:i + 2] == b"<":
                    return None  # inline dict: outside the subset
                j = content.find(b">", i + 1)
                if j < 0:
                    return None  # unterminated hex string
                data = _hex_string_bytes(content[i + 1:j])
                if data is None:
                    return None  # non-hex byte in a hex string
                j += 1
                s = _decode_string_bytes(data, dmap, width)
            if s is None:
                return None
            if array_buf is not None:
                array_buf.append(s)
            elif content[j:j + 16].lstrip().startswith(_SHOW_OPS):
                parts.append(s)
            i = j
        elif c == 0x5B:  # "[" — start buffering a candidate TJ array
            if array_buf is not None:
                return None  # arrays don't nest in content streams
            array_buf = []
            i += 1
        elif c == 0x5D:  # "]" — commit iff the operator is TJ
            if array_buf is not None:
                if content[i + 1:i + 8].lstrip().startswith(b"TJ"):
                    parts.extend(array_buf)
                array_buf = None
            i += 1
        elif (
            c == 0x42  # "B" — maybe the BI inline-image operator
            and content[i:i + 2] == b"BI"
            and (i == 0 or content[i - 1] in _PDF_DELIM_WS)
            and (
                i + 2 >= n or content[i + 2] in _PDF_DELIM_WS
            )
        ):
            # an inline image (BI ... ID <binary> EI) embeds raw
            # binary in the OPERATOR stream; its bytes can contain
            # "(...) Tj" look-alikes that a token scan would extract
            # as phantom text (reproduced in tests). Skipping to EI
            # is heuristic (EI has no length field; the binary can
            # contain "EI"), so the honest subset refuses LOUDLY.
            return None
        else:
            i += 1
    return "".join(parts)


def pdf_text(payload: bytes) -> list[str] | None:
    """Extract per-page text from a PDF: xref walk (classic table or
    1.5 xref stream) → trailer /Root → catalog /Pages → page tree
    /Kids (in order) → each page's /Contents stream (direct or
    ObjStm-compressed) → FlateDecode → Tj/TJ concatenation. Returns
    one string per page, or None for anything outside the honest
    subset (bad xref, encryption, non-Flate filters, malformed
    streams)."""
    if not payload.startswith(b"%PDF-"):
        return None
    parsed = _parse_xref(payload)
    if parsed is None:
        return None
    offsets, trailer = parsed
    m = re.search(rb"/Root\s+(\d+)\s+0\s+R", trailer)
    if m is None:
        return None
    catalog = _object_at(payload, int(m.group(1)), offsets)
    if catalog is None or b"/Encrypt" in trailer:
        return None
    pm = re.search(rb"/Pages\s+(\d+)\s+0\s+R", catalog)
    if pm is None:
        return None
    tree = _object_at(payload, int(pm.group(1)), offsets)
    if tree is None:
        return None
    km = re.search(rb"/Kids\s*\[([^\]]*)\]", tree)
    if km is None:
        return None
    pages = []
    font_maps: dict[int, tuple[dict[int, str], int] | None] = {}
    for ref in re.finditer(_REF_RX, km.group(1)):
        page = _object_at(payload, int(ref.group(1)), offsets)
        if page is None:
            return None
        # the page fonts' glyph decode channels (subset fonts code
        # their Tj bytes as glyph indices — extracting them as
        # latin-1 is mojibake, the pre-r11 gap): resolve EVERY font
        # in the page's /Font resources, build each map once per
        # font object; the content scan then tracks /Fn Tf switches
        if re.search(rb"/Resources\s+\d+\s+\d+\s+R", page):
            # INDIRECT Resources would hide the /Font dict from the
            # inline scan below and the page would silently decode
            # as identity — outside the honest subset, refused
            # loudly (r11 self-review pass 2)
            return None
        fonts: dict[
            bytes, tuple[dict[int, str] | None, int]
        ] | None = None
        fm = re.search(rb"/Font\s*<<([^>]*)>>", page)
        if fm is not None:
            fonts = {}
            for name, num in re.findall(
                rb"/([A-Za-z0-9]+)\s+(\d+)\s+0\s+R", fm.group(1)
            ):
                fnum = int(num)
                if fnum not in font_maps:
                    fobj = _object_at(payload, fnum, offsets)
                    if fobj is None:
                        return None
                    font_maps[fnum] = _font_decode_map(
                        payload, offsets, _dict_of(fobj)
                    )
                built = font_maps[fnum]
                if built is None:
                    return None  # declared-but-unparseable channel
                fmap, fwidth = built
                fonts[name] = (fmap or None, fwidth)  # {} = identity
            if not fonts:
                return None  # a /Font dict with no parseable refs
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", page)
        if cm is None:
            return None
        cobj = _object_at(payload, int(cm.group(1)), offsets)
        if cobj is None:
            return None
        data = _stream_data(cobj, payload, offsets)
        if data is None:
            return None
        text = _content_text(data, fonts=fonts)
        if text is None:
            return None
        pages.append(text)
    return pages
