"""Crawl front-end correctness (llm/extract.py): WARC record
slicing (plain + gzip members), HTTP body splitting, and the
HTML-strip chain's Spark/DuckDB parity on hostile markup."""

from __future__ import annotations

import duckdb
import pytest

from trisk_datawrangle_spark.llm.extract import (
    http_body,
    http_body_chunks,
    http_chunk_encode,
    strip_html_expr,
    strip_html_sql,
    warc_build,
    warc_records,
)


def _mk_records():
    html = b"<p>Hello <b>world</b> &amp; co</p>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
        + html
    )
    return [
        ({"WARC-Type": "warcinfo"}, b"software: t\r\n"),
        ({"WARC-Type": "response",
          "WARC-Target-URI": "http://e.com/"}, http),
        ({"WARC-Type": "request"}, b"GET / HTTP/1.1\r\n"),
    ], html


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    records, html = _mk_records()
    payload = warc_build(records, gzip_members=gz)
    parsed = warc_records(payload)
    assert parsed is not None and len(parsed) == 3
    for (h0, b0), (h1, b1) in zip(records, parsed):
        assert b0 == b1
        for k, v in h0.items():
            assert h1[k] == v
        assert h1["Content-Length"] == str(len(b0))
    assert http_body(parsed[1][1]) == html


def test_warc_content_length_driven_slicing():
    # a body containing WARC/1.0 and \r\n\r\n must NOT confuse the
    # parser — Content-Length decides, not delimiters
    tricky = b"WARC/1.0\r\n\r\nfake-nested\r\n\r\n"
    payload = warc_build([({"WARC-Type": "resource"}, tricky)])
    parsed = warc_records(payload)
    assert parsed is not None and parsed[0][1] == tricky


def test_warc_rejects_malformed():
    assert warc_records(b"not a warc") is None
    records, _ = _mk_records()
    good = warc_build(records)
    assert warc_records(good[: len(good) - 10]) is None  # truncated
    # header without Content-Length
    assert warc_records(b"WARC/1.0\r\nA: b\r\n\r\nxx\r\n\r\n") is None


def test_http_body_edges():
    assert http_body(b"nonsense") is None
    # chunked header but a body that is not valid chunk framing:
    # refused (decoded now, never passed through raw)
    assert http_body(
        b"HTTP/1.1 200\r\nTransfer-Encoding: chunked\r\n\r\nx"
    ) is None
    assert http_body(b"HTTP/1.1 204\r\nX: y\r\n\r\n") == b""


def _chunked_resp(raw: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\ntransfer-encoding :  Chunked\r\n\r\n"
        + raw
    )


@pytest.mark.parametrize("size", [1, 3, 7, 37, 1000])
@pytest.mark.parametrize(
    "body", [b"", b"a", b"hello world " * 40, bytes(range(256))]
)
def test_http_chunked_roundtrip(size, body):
    enc = http_chunk_encode(body, size)
    got = http_body_chunks(_chunked_resp(enc))
    assert got is not None
    decoded, n_chunks = got
    assert decoded == body
    assert n_chunks == -(-len(body) // size)  # ceil; 0 for empty
    assert http_body(_chunked_resp(enc)) == body


def test_http_chunked_strict_grammar():
    ok = http_chunk_encode(b"abcdef", 4)
    assert http_body(_chunked_resp(ok)) == b"abcdef"
    bad = [
        ok[:-2],                       # missing final trailer CRLF
        ok + b"junk",                  # bytes after the terminator
        ok.replace(b"4\r\n", b"4;ext=1\r\n", 1),  # chunk extension
        ok.replace(b"0\r\n\r\n", b"0\r\nX-T: v\r\n\r\n"),  # trailer
        ok.replace(b"4\r\n", b"g\r\n", 1),        # non-hex size
        ok.replace(b"4\r\n", b"\r\n", 1),         # empty size line
        ok.replace(b"4\r\nabcd\r\n", b"4\r\nabcdXX", 1),  # no CRLF
        b"5\r\nabc",                   # truncated data
        ok.replace(b"4\r\n", b"-4\r\n", 1),       # negative size
    ]
    for raw in bad:
        assert http_body(_chunked_resp(raw)) is None, raw


def test_http_chunked_exact_multiple():
    # body length an exact multiple of chunk size: no empty data
    # chunk is emitted (0-size means terminator)
    enc = http_chunk_encode(b"12345678", 4)
    body, n = http_body_chunks(_chunked_resp(enc))
    assert body == b"12345678" and n == 2


def test_strip_html_spark_duckdb_parity(spark):
    cases = [
        "<html><HEAD><STYLE>b{}</STYLE></head><p>one</p><p>2 &amp; 3</p>",
        "a<script>\nf()\n</script>b<!-- c\nd -->e<br>f<LI>g",
        "&lt;kept&gt; &quot;q&quot; &#39;s&#39;&nbsp;x",
        "<div>A</div>\t<div>B</div>\n\n\nC <b>D</b><unclosed",
        "",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, t string"
    )
    got = {
        r.id: r.c
        for r in df.select(
            "id", strip_html_expr("t").alias("c")
        ).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        lit = (
            "'"
            + c.replace("'", "''").replace("\n", "' || chr(10) || '")
            + "'"
        )
        want = con.execute(
            f"SELECT {strip_html_sql(lit)}"
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)


def test_http_composite_transfer_encoding():
    """'Transfer-Encoding: gzip, chunked' now DECODES (dechunk, then
    bounded gunzip — the RFC 9112 receiver order); mis-ordered or
    non-gzip codings stay refused, as does composite framing whose
    dechunked payload is not valid gzip — never passed through
    still-compressed."""
    import gzip as _gzip

    from trisk_datawrangle_spark.llm.extract import http_response

    body = b"hello crawl world" * 10
    gz = _gzip.compress(body, 6, mtime=0)
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
        + http_chunk_encode(gz, 7)
    )
    got = http_response(raw)
    assert got is not None
    assert got[0] == body and got[1] >= 1 and got[2] is True
    # dechunked payload that is NOT gzip: refused, not passed through
    enc = http_chunk_encode(b"abc", 2)
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
        + enc
    )
    assert http_body(raw) is None
    for head in (
        b"Transfer-Encoding: chunked, gzip",  # mis-ordered
        b"transfer-encoding: gzip\r\ntransfer-encoding: chunked",
        b"Transfer-Encoding: deflate",
        b"Transfer-Encoding: gzip",  # gzip without chunked framing
    ):
        raw = b"HTTP/1.1 200 OK\r\n" + head + b"\r\n\r\n" + enc
        assert http_body(raw) is None, head
    ok = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: identity\r\n\r\nhi"
    assert http_body(ok) == b"hi"


def test_http_content_encoding_gzip():
    """'Content-Encoding: gzip' (and its x-gzip alias) inflates
    behind the 8 MB bomb cap; deflate/br/unknown codings and
    malformed/trailing-garbage/bomb gzip bodies are refused."""
    import gzip as _gzip

    from trisk_datawrangle_spark.llm.extract import http_response

    body = b"<p>decoded</p>" * 30
    gz = _gzip.compress(body, 6, mtime=0)
    for name in (b"gzip", b"x-gzip"):
        raw = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: " + name
            + b"\r\nContent-Length: " + str(len(gz)).encode()
            + b"\r\n\r\n" + gz
        )
        assert http_response(raw) == (body, 0, True), name
    # content-coding OVER a chunked transfer: both layers undone
    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + http_chunk_encode(gz, 11)
    )
    got = http_response(raw)
    assert got is not None and got[0] == body and got[2] is True
    for tail, head in (
        (gz[:-4], b"gzip"),        # truncated member
        (gz + b"JUNK", b"gzip"),   # trailing garbage
        (gz, b"deflate"),          # gzip bytes are not deflate
        (gz, b"br"),               # unsupported coding
        (gz, b"zstd"),
        (gz, b"gzip, gzip"),       # stacked codings refused
        (b"not gzip", b"gzip"),    # bad magic
    ):
        raw = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: " + head
            + b"\r\n\r\n" + tail
        )
        assert http_response(raw) is None, head
    # decompression bomb past the 8 MB cap: refused
    bomb = _gzip.compress(b"\x00" * (9 * 1024 * 1024), 9, mtime=0)
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bomb
    assert http_response(raw) is None


def test_http_content_encoding_deflate():
    """'Content-Encoding: deflate' decodes both the RFC 9110 zlib
    wrapping and the raw-deflate legacy form; malformed/bomb bodies
    refuse."""
    import zlib as _zlib

    from trisk_datawrangle_spark.llm.extract import http_response

    body = b"<p>deflated</p>" * 25
    wrapped = _zlib.compress(body, 6)
    co = _zlib.compressobj(6, _zlib.DEFLATED, -15)
    rawdef = co.compress(body) + co.flush()
    for payload in (wrapped, rawdef):
        rec = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + payload
        )
        assert http_response(rec) == (body, 0, True)
    # truncation and trailing garbage refuse under either framing
    for bad in (wrapped[:-3], wrapped + b"X", rawdef + b"XY"):
        rec = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + bad
        )
        assert http_response(rec) is None
    # deflate bomb past the cap refuses (the gzip bomb is asserted
    # in test_http_content_encoding_gzip, where it belongs)
    bomb = _zlib.compress(b"\x00" * (9 * 1024 * 1024), 9)
    rec = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + bomb
    assert http_response(rec) is None


def test_http_chunk_size_is_strict_hexdig():
    """r9 review finding: int(x, 16) alone admits '0x4', '+4', ' 4',
    '1_0' — non-grammar spellings a strict front end must refuse
    (RFC 9112 chunk-size is 1*HEXDIG only)."""
    for size_line in (b"0x4", b"+4", b" 4", b"4 ", b"1_0"):
        raw = size_line + b"\r\nxxxx\r\n0\r\n\r\n"
        assert http_body(_chunked_resp(raw)) is None, size_line
    # uppercase hex digits ARE grammar
    body = b"x" * 10
    raw = b"A\r\n" + body + b"\r\n0\r\n\r\n"
    assert http_body(_chunked_resp(raw)) == body


# ------------------------------------------------- link politeness
def test_anchor_hrefs_honors_rel_nofollow(spark):
    """anchor_hrefs_expr (r10 verdict Missing #5): per-anchor
    rel=nofollow drops in every spelling page authors use —
    either quote style, any attribute order, multi-token rel —
    while rel tokens merely CONTAINING 'nofollow' keep."""
    from trisk_datawrangle_spark.llm.extract import anchor_hrefs_expr

    html = (
        '<a href="http://k/1">a</a>'
        '<a rel="NoFollow" href="http://d/1">b</a>'
        "<a href='http://d/2' REL='external nofollow'>c</a>"
        '<a rel="nofollowable" href="http://k/2">d</a>'
        '<a rel="author canonical" href="http://k/3">e</a>'
        '<a href="">empty drops</a>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    [row] = df.select(anchor_hrefs_expr("html").alias("h")).collect()
    assert row["h"] == ["http://k/1", "http://k/2", "http://k/3"]
    # honor_nofollow=False is the audit view: every href surfaces
    [row] = df.select(
        anchor_hrefs_expr("html", honor_nofollow=False).alias("h")
    ).collect()
    assert len(row["h"]) == 5


def test_meta_robots_predicate(spark):
    """meta_robots_expr: only name=robots metas count, any attribute
    order / case / quote style; directives are comma-separated
    tokens."""
    from trisk_datawrangle_spark.llm.extract import meta_robots_expr

    rows = [
        ('<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">', True, True),
        ('<meta content="noindex" name="robots">', False, True),
        ("<meta name='robots' content='nofollow'>", True, False),
        ('<meta name="generator" content="nofollow-cms">', False, False),
        ('<meta name="robots" content="index, follow">', False, False),
        ('<meta name="description" content="noindex nofollow">',
         False, False),
        ("no meta at all", False, False),
    ]
    df = spark.createDataFrame(
        [(h,) for h, _, _ in rows], "html string"
    )
    got = df.select(
        "html",
        meta_robots_expr("html", "nofollow").alias("nf"),
        meta_robots_expr("html", "noindex").alias("ni"),
    ).collect()
    want = {h: (nf, ni) for h, nf, ni in rows}
    for r in got:
        assert (r["nf"], r["ni"]) == want[r["html"]], r["html"]


def test_link_politeness_exprs_are_pure_jvm(spark):
    from trisk_datawrangle_spark.llm.extract import (
        anchor_hrefs_expr,
        meta_robots_expr,
    )

    df = spark.createDataFrame([("<a href='http://x/'>",)], "h string")
    plan = (
        df.select(
            anchor_hrefs_expr("h").alias("a"),
            meta_robots_expr("h", "noindex").alias("b"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("Python", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_base_href_extraction(spark):
    """base_href_expr: first base element wins, either quote style,
    any attribute order/case; <basefont> and href-less <base> never
    match; NULL when absent (callers coalesce over the page URL)."""
    from trisk_datawrangle_spark.llm.extract import base_href_expr

    rows = [
        ('<base href="https://a/x/">', "https://a/x/"),
        ("<BASE TARGET='_t' HREF='https://b/'>", "https://b/"),
        ('<base href="https://first/"><base href="https://second/">',
         "https://first/"),
        ("<base href='https://sq/'><base href=\"https://dq/\">",
         "https://sq/"),  # first wins across quote styles
        ('<basefont href="https://decoy/">', None),
        ("<base target='_t'>", None),
        ("no head at all", None),
        ('<base href="">', None),  # empty href: no override
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    got = {
        r["h"]: r["b"]
        for r in df.select(
            "h", base_href_expr("h").alias("b")
        ).collect()
    }
    for h, want in rows:
        assert got[h] == want, (h, got[h])


def test_http_status_location():
    """http_status_location: header-name case-insensitive, VALUE
    bytes preserved exactly (URL paths are case-significant), first
    Location wins, empty/absent -> None, non-HTTP -> None."""
    from trisk_datawrangle_spark.llm.extract import (
        http_status_location,
    )

    rec = (
        b"HTTP/1.1 301 Moved\r\nServer: x\r\n"
        b"location:  ../t/CaseKept#f\r\n"
        b"Location: http://second.example.com/\r\n\r\n"
    )
    assert http_status_location(rec) == (301, "../t/CaseKept#f")
    assert http_status_location(
        b"HTTP/1.0 200 OK\r\nContent-Length: 2\r\n\r\nok"
    ) == (200, None)
    assert http_status_location(
        b"HTTP/1.1 302 F\r\nLocation:\r\n\r\n"
    ) == (302, None)
    assert http_status_location(b"not http") is None
    assert http_status_location(b"HTTP/1.1 xx\r\n\r\n") is None


class TestHttpValidators:
    """r12: http_validators — the conditional-revalidation view
    (status, ETag, Last-Modified). Names case-insensitive, VALUES
    byte-preserved (entity tags are case-sensitive opaque strings;
    the W/ weak prefix must survive), first header wins."""

    def test_basic_and_case_insensitive_names(self):
        from trisk_datawrangle_spark.llm.extract import (
            http_validators,
        )

        rec = (
            b"HTTP/1.1 200 OK\r\neTaG:  \"AbC\"\r\n"
            b"LAST-modified: Wed, 01 Jan 2025 00:00:00 GMT\r\n"
            b"\r\nbody"
        )
        assert http_validators(rec) == (
            200, '"AbC"', "Wed, 01 Jan 2025 00:00:00 GMT"
        )

    def test_weak_prefix_and_value_bytes_preserved(self):
        from trisk_datawrangle_spark.llm.extract import (
            http_validators,
        )

        rec = b'HTTP/1.1 304 NM\r\nETag: W/"CaSe"\r\n\r\n'
        assert http_validators(rec) == (304, 'W/"CaSe"', None)

    def test_first_header_wins_and_decoy_ignored(self):
        from trisk_datawrangle_spark.llm.extract import (
            http_validators,
        )

        rec = (
            b'HTTP/1.1 200 OK\r\nX-ETag: "decoy"\r\n'
            b'ETag: "first"\r\netag: "second"\r\n\r\n'
        )
        assert http_validators(rec) == (200, '"first"', None)

    def test_absent_and_malformed(self):
        from trisk_datawrangle_spark.llm.extract import (
            http_validators,
        )

        assert http_validators(
            b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n"
        ) == (200, None, None)
        assert http_validators(b"not http") is None
        assert http_validators(b"HTTP/1.1 200 OK") is None  # no sep
        # empty value -> None, not ''
        assert http_validators(
            b"HTTP/1.1 200 OK\r\nETag:   \r\n\r\n"
        ) == (200, None, None)


class TestHttpRetryAfter:
    """r12: http_retry_after — the backoff view. Value bytes kept
    verbatim (interpretation is the scheduler's CASE); first header
    wins; X-Retry-After decoys ignored."""

    def test_delta_and_date_values_verbatim(self):
        from trisk_datawrangle_spark.llm.extract import (
            http_retry_after,
        )

        assert http_retry_after(
            b"HTTP/1.1 429 TM\r\nRetry-After: 120\r\n\r\n"
        ) == (429, "120")
        assert http_retry_after(
            b"HTTP/1.1 503 SU\r\nretry-after:  Wed, 01 Jan 2025 "
            b"00:45:07 GMT\r\n\r\n"
        ) == (503, "Wed, 01 Jan 2025 00:45:07 GMT")

    def test_first_wins_decoy_ignored_absent_none(self):
        from trisk_datawrangle_spark.llm.extract import (
            http_retry_after,
        )

        rec = (
            b"HTTP/1.1 429 TM\r\nX-Retry-After: 9999\r\n"
            b"Retry-After: 30\r\nretry-after: 1\r\n\r\n"
        )
        assert http_retry_after(rec) == (429, "30")
        assert http_retry_after(
            b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n"
        ) == (200, None)
        assert http_retry_after(b"junk") is None


class TestRelCanonical:
    """r12: rel_canonical_expr — the content-level URL-alias signal
    (RFC 6596). Token-exact rel matching, first link wins, both
    quote styles + unquoted, NULL on canonical-less heads."""

    def _one(self, spark, html):
        from trisk_datawrangle_spark.llm.extract import (
            rel_canonical_expr,
        )

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(
            rel_canonical_expr("h").alias("c")
        ).collect()[0]["c"]

    def test_orders_quotes_and_first_wins(self, spark):
        assert self._one(
            spark,
            '<LINK REL="canonical" HREF="https://a.example/x">'
            '<link rel="canonical" href="https://b.example/y">',
        ) == "https://a.example/x"
        # href before rel, single quotes
        assert self._one(
            spark,
            "<link href='https://c.example/z' rel='canonical'>",
        ) == "https://c.example/z"
        # unquoted rel value
        assert self._one(
            spark, '<link rel=canonical href="../up/one">'
        ) == "../up/one"

    def test_token_exact_and_token_lists(self, spark):
        # hyphenated decoy must NOT match (a \b boundary would)
        assert self._one(
            spark,
            '<link rel="canonical-x" href="https://no.example/">',
        ) is None
        assert self._one(
            spark,
            '<link rel="canonicalish" href="https://no.example/">',
        ) is None
        # rel is a token LIST: 'alternate canonical' counts
        assert self._one(
            spark,
            '<link rel="alternate canonical" '
            'href="https://yes.example/">',
        ) == "https://yes.example/"

    def test_non_canonical_links_and_absent(self, spark):
        assert self._one(
            spark, '<link rel="stylesheet" href="/s.css">'
        ) is None
        assert self._one(spark, "<p>no links</p>") is None
        # canonical link without href: NULL, not a crash
        assert self._one(spark, '<link rel="canonical">') is None
