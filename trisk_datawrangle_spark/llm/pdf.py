"""PDF text extraction — the other front-door format of a web-scale
training corpus (crawls deliver .pdf alongside .html; a pipeline
that drops them loses a large, high-quality text slice).

Stdlib-only, spec-driven (PDF 1.4, ISO 32000 subset): the parser is
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
text strings decode). Anything outside this subset — encryption,
object streams (/ObjStm), LZW/ASCII85 filters — returns None
loudly rather than guessing, and hostile shapes (billion-object
xref claims, Flate decompression bombs, 'endobj' bytes inside
stream data) are refused or sliced past by declared DIRECT lengths,
never scanned into; indirect ``/Length N 0 R`` objects are refused
loudly rather than mis-sliced.

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


def pdf_build(pages: list[str]) -> bytes:
    """Serialize a PDF 1.4 document with one Flate-compressed content
    stream per page, each showing its page's text as a single ``Tj``
    string. Object layout: 1=catalog, 2=pages tree, 3=font, then
    (page, contents) pairs — ``3 + 2 * n_pages`` objects, written
    with a REAL xref table (exact 20-byte entries, byte offsets)."""
    if not pages:
        raise ValueError("pdf_build: at least one page required")
    n = len(pages)
    objects: list[bytes] = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objects.append(
        b"<< /Type /Catalog /Pages 2 0 R >>"
    )
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, text in enumerate(pages):
        content = (
            b"BT /F1 12 Tf 72 720 Td ("
            + _escape_string(text)
            + b") Tj ET"
        )
        flate = zlib.compress(content, 6)
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )
        objects.append(
            f"<< /Length {len(flate)} /Filter /FlateDecode >>"
            .encode()
            + b"\nstream\n"
            + flate
            + b"\nendstream"
        )
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


def _parse_xref(d: bytes) -> list[int] | None:
    """startxref → xref table → object byte offsets (index = object
    number). None on malformed/absent xref — no fallback scanning;
    an offset table that lies is a refusal, not a heuristic."""
    tail = d[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass  # last startxref wins (incremental updates)
    if m is None:
        return None
    xref_at = int(m.group(1))
    if not d[xref_at:xref_at + 4] == b"xref":
        return None
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
    size = max(offsets) + 1
    table = [-1] * size
    for num, off in offsets.items():
        table[num] = off
    return table


def _object_at(d: bytes, num: int, offsets: list[int]) -> bytes | None:
    """Slice object ``num`` at its xref offset; validates the header
    actually declares that object number (a lying xref is refused).
    When the object carries a stream, the declared /Length drives
    the slice PAST the stream data before ``endobj`` is searched —
    compressed payloads can legitimately contain the 6-byte
    sequence 'endobj', so scanning for it inside stream bytes would
    truncate valid objects (the WARC Content-Length discipline)."""
    if not 0 <= num < len(offsets) or offsets[num] < 0:
        return None
    off = offsets[num]
    m = re.match(rb"(\d+)\s+\d+\s+obj\b", d[off:off + 32])
    if m is None or int(m.group(1)) != num:
        return None
    body_start = off + m.end()
    search_from = body_start
    win = d[body_start:body_start + 65536]
    head = _dict_of(win)
    if head:
        dict_end = body_start + win.find(b"<<") + len(head)
        lm = _direct_length(head)
        if lm == -2:
            return None  # indirect /Length N 0 R: outside the subset
        sm = re.match(rb"\s*stream", d[dict_end:dict_end + 16])
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


def _direct_length(head: bytes) -> int:
    """The dictionary's direct /Length value, -1 when absent, -2
    when it is an INDIRECT reference (``/Length 7 0 R``) — common in
    real crawled PDFs but outside this subset: resolving it would
    need a second object fetch mid-slice, and treating the object
    number as a byte count silently truncates streams, so indirect
    lengths are refused loudly instead."""
    m = re.search(rb"/Length\s+(\d+)", head)
    if m is None:
        return -1
    if re.match(rb"\s+0\s+R\b", head[m.end():]):
        return -2
    return int(m.group(1))


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


def _stream_data(obj: bytes) -> bytes | None:
    """stream ... endstream payload, FlateDecoded when the object
    dictionary says /Filter /FlateDecode (the only filter this
    subset ships); /Length drives the slice."""
    head = _dict_of(obj)
    length = _direct_length(head)
    s = obj.find(b"stream")
    if length < 0 or s < 0:
        return None  # absent or indirect /Length: refused
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


def _unescape_string(raw: bytes) -> str | None:
    """Unescape a string literal's bytes, then decode: BOM FE FF
    means the spec's UTF-16BE text-string form, anything else is
    latin-1 (the PDFDocEncoding subset this module emits)."""
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
    data = bytes(out)
    if data[:2] == b"\xfe\xff":
        try:
            return data[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return None
    return data.decode("latin-1")


def _content_text(content: bytes) -> str | None:
    """Concatenate the arguments of every Tj / TJ text-showing
    operator, in stream order. TJ arrays interleave strings with
    kerning numbers (ignored). ONE stateful linear scan: string
    literals are consumed atomically with escape awareness (a
    ``\\)`` must not terminate the literal, and a ``[``/``]``
    INSIDE a string must not look like array structure — raw-byte
    bracket scanning mis-attributed neighboring strings, found in
    the r9 review), and ``[...]`` groups buffer their strings until
    the closing bracket reveals whether the operator is TJ."""
    parts: list[str] = []
    array_buf: list[str] | None = None
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # "(" — string literal start
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
            s = _unescape_string(bytes(buf))
            if s is None:
                return None
            if array_buf is not None:
                array_buf.append(s)
            elif content[j:j + 16].lstrip().startswith(b"Tj"):
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
        else:
            i += 1
    return "".join(parts)


def pdf_text(payload: bytes) -> list[str] | None:
    """Extract per-page text from a PDF: xref walk → trailer /Root →
    catalog /Pages → page tree /Kids (in order) → each page's
    /Contents stream → FlateDecode → Tj/TJ concatenation. Returns
    one string per page, or None for anything outside the honest
    subset (bad xref, encryption, non-Flate filters, malformed
    streams)."""
    if not payload.startswith(b"%PDF-"):
        return None
    offsets = _parse_xref(payload)
    if offsets is None:
        return None
    m = None
    for m in re.finditer(rb"/Root\s+(\d+)\s+0\s+R", payload[-512:]):
        pass
    if m is None:
        return None
    catalog = _object_at(payload, int(m.group(1)), offsets)
    if catalog is None or b"/Encrypt" in payload[-512:]:
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
    for ref in re.finditer(_REF_RX, km.group(1)):
        page = _object_at(payload, int(ref.group(1)), offsets)
        if page is None:
            return None
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", page)
        if cm is None:
            return None
        cobj = _object_at(payload, int(cm.group(1)), offsets)
        if cobj is None:
            return None
        data = _stream_data(cobj)
        if data is None:
            return None
        text = _content_text(data)
        if text is None:
            return None
        pages.append(text)
    return pages
