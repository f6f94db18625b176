"""Crawl-ingestion front end: WARC record parsing + HTML→text
extraction — the first two stages every web-scale training corpus
runs before any quality gate or dedup.

HTML stripping is a PURE JVM expression chain
(:func:`strip_html_expr` — ordered ``regexp_replace`` passes), so at
100 TB it fuses into the scan like the x9/x24 normalizers: no Python
in the hot path, and the identical regex chain replays in DuckDB
(:data:`STRIP_HTML_STEPS` is shared verbatim with the oracle SQL
builder :func:`strip_html_sql`). Patterns stick to the Java∩RE2
subset (backslash classes, ``(?i)``/``(?s)`` flags, lazy ``*?``) —
the same contract ``text.py`` documents for its shared regexes.

WARC (ISO 28500) parsing is bytes-level record slicing —
``Content-Length``-driven, so it never scans payloads — and runs in
the Arrow-batched ``mapInPandas`` media tier like the image/audio
codecs. Gzip-member WARCs (the common ``.warc.gz`` layout: one gzip
member per record) are handled via stdlib zlib. This is a REAL
parser for the real format; only the transfer-encoding long tail
(chunked HTTP bodies) is normalized away by the builder and rejected
loudly by the parser.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Ordered (pattern, replacement) passes shared VERBATIM between the
#: Spark expression chain and the DuckDB oracle. Order matters:
#: containers with content first (script/style swallow their body),
#: then comments, then block-level tags to newline (so words in
#: adjacent blocks don't fuse), then every remaining tag, then
#: entities, then whitespace collapse.
STRIP_HTML_STEPS: list[tuple[str, str]] = [
    ("(?is)<script\\b[^>]*>.*?</script>", " "),
    ("(?is)<style\\b[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\\b[^>]*>",
     "\n"),
    ("<[^>]*>", " "),
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("[ \\t]+", " "),
    ("\\s*\\n\\s*", "\n"),
]


def strip_html_expr(col: str | Column) -> Column:
    """HTML → visible text as one JVM ``regexp_replace`` chain — the
    boilerplate-stripping front stage of a crawl pipeline, scale-safe
    by construction (fuses into the scan, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in STRIP_HTML_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


def strip_html_sql(expr: str) -> str:
    """The SAME chain as DuckDB SQL over ``expr`` — oracle parity by
    shared data, not re-implementation."""
    out = expr
    for pat, rep in STRIP_HTML_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'gs')"
    return f"trim({out})"


# ------------------------------------------------------------------ #
# WARC                                                                #
# ------------------------------------------------------------------ #


def warc_build(records: list[tuple[dict, bytes]], gzip_members: bool = False) -> bytes:
    """Serialize WARC/1.0 records (header dict + content bytes).
    With ``gzip_members=True`` each record becomes its own gzip
    member — the standard ``.warc.gz`` layout readers seek within."""
    import zlib

    out = bytearray()
    for headers, body in records:
        h = bytearray(b"WARC/1.0\r\n")
        hdrs = dict(headers)
        hdrs["Content-Length"] = str(len(body))
        for k, v in hdrs.items():
            h += f"{k}: {v}\r\n".encode()
        h += b"\r\n"
        rec = bytes(h) + body + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
            rec = co.compress(rec) + co.flush()
        out += rec
    return bytes(out)


def warc_records(payload: bytes) -> list[tuple[dict, bytes]] | None:
    """Parse a WARC/1.0 stream (plain or per-record gzip members)
    into ``(headers, content)`` records. ``Content-Length`` drives
    the slicing — payload bytes are never scanned for delimiters.
    Returns None on malformed input (bad magic, missing
    Content-Length, truncated record) rather than guessing."""
    import zlib

    d = payload
    if d[:2] == b"\x1f\x8b":  # gzip members: inflate them all
        out = bytearray()
        pos = 0
        while pos < len(d):
            dec = zlib.decompressobj(16 + 15)
            try:
                out += dec.decompress(d[pos:])
            except zlib.error:
                return None
            consumed = len(d) - pos - len(dec.unused_data)
            if consumed <= 0:
                return None
            pos += consumed
        d = bytes(out)
    records = []
    pos = 0
    while pos < len(d):
        # skip inter-record blank lines
        while d[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(d):
            break
        if not d[pos:].startswith(b"WARC/"):
            return None
        hdr_end = d.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return None
        headers: dict = {}
        for line in d[pos:hdr_end].split(b"\r\n")[1:]:
            if b":" not in line:
                return None
            k, v = line.split(b":", 1)
            headers[k.decode().strip()] = v.decode().strip()
        if "Content-Length" not in headers:
            return None
        try:
            clen = int(headers["Content-Length"])
        except ValueError:
            return None
        body_start = hdr_end + 4
        if body_start + clen > len(d):
            return None
        records.append((headers, d[body_start:body_start + clen]))
        pos = body_start + clen
    return records


def http_body(record_content: bytes) -> bytes | None:
    """Split an HTTP response record's content into headers + body
    and return the body. Chunked transfer encoding is refused
    (None) regardless of header spelling — HTTP allows no space,
    extra spaces, or mixed case around the colon, and returning a
    chunked body raw would feed chunk-size lines to the text
    pipeline. The builder always writes Content-Length responses; a
    real crawl normalizes encodings at fetch time."""
    import re

    sep = record_content.find(b"\r\n\r\n")
    if sep < 0 or not record_content.startswith(b"HTTP/"):
        return None
    head = record_content[:sep].lower()
    if re.search(rb"transfer-encoding[ \t]*:[^\r\n]*chunked", head):
        return None
    return record_content[sep + 4:]
