"""URL canonicalization (RFC 3986 §6.2.2) — the key function of a
crawl frontier: the same resource arrives spelled a dozen ways
(scheme/host case, default ports, dot-segments, percent-encoding
spellings, fragments), and frontier dedup / politeness / link-graph
joins all key on the canonical form. A frontier that misses a
spelling re-crawls the page; one that over-merges drops real URLs.

Spark-first shape: the whole normalization is a PURE JVM expression
— structural regexp_extract/lower/concat for the scheme-host-port
rebuild, a split-on-``%`` higher-order fold for percent-encoding
normalization, and a short shared ``regexp_replace`` chain for
dot-segments — so at 100 TB it fuses into the scan like the x46
strip chain: no Python, no shuffle.

Percent-encoding normalization (RFC §6.2.2.1-2) deliberately does
NOT use a per-escape replace table: the full unreserved set needs
102 replace passes, and a 100-deep nested expression blows whole-
stage codegen's 64 KB method limit into interpreted fallback
(measured — the same class of failure as sc4's nested-recode CASE).
Instead the path+query splits on ``%`` and each piece folds back
conditionally: if the piece opens with two hex digits whose code
point is UNRESERVED (ALPHA / DIGIT / ``-._~``), the escape decodes
(``%41`` → ``A``); any other well-formed escape keeps its ``%`` and
uppercases the hex (``%3a`` → ``%3A`` — applied to ALL non-
unreserved escapes, exactly §6.2.2.1); a malformed tail (``%4`` /
``%GZ``) passes through unchanged. One ``split`` + one string
``aggregate`` — small expression tree, codegen-safe, and the DuckDB
oracle builder replays the identical piece logic with
``list_transform`` + the same hex/code-point arithmetic.

Dot-segment resolution (§6.2.2.3) stays a shared
(pattern, replacement) chain (:data:`DOT_SEGMENT_STEPS` — data
shared verbatim between engines, the strip_html idiom): remove
``/./``, resolve ``segment/../``, bounded at
:data:`DOT_SEGMENT_PASSES` passes since a regex chain cannot loop
to a data-dependent fixed point — deeper nesting passes through
un-resolved rather than wrongly (a production frontier picks the
bound from observed crawl depth). Segments beginning with ``.`` are
conservatively NOT consumed by ``..`` (avoids the ``/../../``
self-match class of bugs). Decode runs BEFORE dot-segment removal
(§6.2.2 order: ``%2E`` must resolve as a dot segment).

Scheme-based normalization (§6.2.3): scheme/host lowercase, default
ports dropped (http:80, https:443), empty path → ``/`` (with or
without a query), fragment stripped (client-side). Percent
normalization applies to path AND query; dot-segment removal to the
PATH ONLY — a ``/../`` inside a query parameter value is data, and
rewriting it would over-merge distinct URLs. Userinfo
(``user@host``) passes through VERBATIM: it is case-sensitive per
§3.2.1, so it is excluded from the host's case fold. Non-absolute
inputs (no ``scheme://``) canonicalize to the empty string — loud
enough to filter, cheap enough to fuse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: One dot-segment resolution pass (ordered), repeated
#: DOT_SEGMENT_PASSES times. Java∩RE2-safe; shared verbatim with the
#: oracle SQL builder.
_DOT_PASS: list[tuple[str, str]] = [
    ("/\\./", "/"),                # /a/./b  -> /a/b
    ("/\\.$", "/"),                # /a/.    -> /a/
    ("^/\\.\\./", "/"),            # /../a   -> /a (can't go above root)
    ("/[^/.][^/]*/\\.\\./", "/"),  # /a/../b -> /b
    ("/[^/.][^/]*/\\.\\.$", "/"),  # /a/..   -> /
]

#: Number of passes = max ".." nesting depth resolved.
DOT_SEGMENT_PASSES = 4

DOT_SEGMENT_STEPS: list[tuple[str, str]] = _DOT_PASS * DOT_SEGMENT_PASSES

_SCHEME_RX = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RX = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RX = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RX = "^[^?#]*(\\?[^#]*)"
_HEX2_RX = "^[0-9A-Fa-f]{2}"


def _decode_piece(p: Column) -> Column:
    """Fold one post-split piece back: piece = the text after a
    ``%``. Decode when the leading hex pair is an unreserved code
    point; uppercase the hex otherwise; pass malformed through."""
    hex2 = F.upper(F.substring(p, 1, 2))
    code = F.conv(hex2, 16, 10).cast("int")
    rest = p.substr(F.lit(3), F.length(p))
    unreserved = (
        ((code >= 48) & (code <= 57))       # DIGIT
        | ((code >= 65) & (code <= 90))     # ALPHA upper
        | ((code >= 97) & (code <= 122))    # ALPHA lower
        | code.isin(45, 46, 95, 126)        # - . _ ~
    )
    return (
        F.when(
            p.rlike(_HEX2_RX) & unreserved,
            F.concat(F.char(code), rest),
        )
        .when(p.rlike(_HEX2_RX), F.concat(F.lit("%"), hex2, rest))
        .otherwise(F.concat(F.lit("%"), p))
    )


def pct_normalize_expr(pathq: Column) -> Column:
    """Percent-encoding normalization of a path+query Column: split
    on ``%``, fold pieces back through :func:`_decode_piece`."""
    parts = F.split(pathq, "%", -1)
    head = F.element_at(parts, 1)
    tail = F.slice(
        parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))
    )
    return F.concat(
        head,
        F.aggregate(
            tail,
            F.lit(""),
            lambda acc, p: F.concat(acc, _decode_piece(p)),
        ),
    )


def canonicalize_url_expr(col: str | Column) -> Column:
    """Canonical form of an absolute http(s) URL as one JVM
    expression chain (see module docstring for the exact steps).
    Percent normalization applies to path AND query (§6.2.2.1-2);
    dot-segment removal applies to the PATH ONLY (§6.2.2.3 — a
    ``/../`` inside a query parameter value is data, and rewriting
    it over-merges distinct URLs); userinfo passes through verbatim
    (case-sensitive per §3.2.1); an empty path with authority
    normalizes to ``/`` whether or not a query follows (§6.2.3)."""
    url = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RX, 1))
    auth = F.regexp_extract(url, _AUTH_RX, 1)
    user = F.regexp_extract(auth, "^(.*@)", 1)
    hostport = F.regexp_replace(auth, "^.*@", "")
    host = F.lower(F.regexp_replace(hostport, ":[0-9]*$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    portpart = F.when(default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = pct_normalize_expr(F.regexp_extract(url, _PATH_RX, 1))
    for pat, rep in DOT_SEGMENT_STEPS:
        path = F.regexp_replace(path, pat, rep)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = pct_normalize_expr(F.regexp_extract(url, _QUERY_RX, 1))
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(
            scheme, F.lit("://"), user, host, portpart, path, query
        )
    )


def pct_normalize_sql(pathq: str) -> str:
    """The piece fold as DuckDB SQL: ``list_transform`` over the
    post-split pieces with the SAME hex/code-point arithmetic (code
    computed via strpos on the hex alphabet — engine-portable, no
    from_hex dependency)."""
    code = (
        "(16 * (strpos('0123456789ABCDEF', upper(p[1:1])) - 1)"
        " + strpos('0123456789ABCDEF', upper(p[2:2])) - 1)"
    )
    unres = (
        f"(({code} BETWEEN 48 AND 57) OR ({code} BETWEEN 65 AND 90)"
        f" OR ({code} BETWEEN 97 AND 122)"
        f" OR {code} IN (45, 46, 95, 126))"
    )
    piece = (
        "CASE "
        f"WHEN regexp_matches(p, '{_HEX2_RX}') AND {unres} "
        f"THEN chr(CAST({code} AS INTEGER)) || p[3:] "
        f"WHEN regexp_matches(p, '{_HEX2_RX}') "
        "THEN '%' || upper(p[1:2]) || p[3:] "
        "ELSE '%' || p END"
    )
    parts = f"string_split({pathq}, '%')"
    # COALESCE: DuckDB's array_to_string over the empty piece list
    # (no '%' in the input) yields NULL, not '' — measured
    return (
        f"({parts}[1] || COALESCE(array_to_string("
        f"list_transform({parts}[2:], p -> {piece}), ''), ''))"
    )


def canonicalize_url_sql(expr: str) -> str:
    """The SAME normalization as DuckDB SQL over ``expr`` — parity by
    shared data (DOT_SEGMENT_STEPS verbatim) and same-shape piece
    arithmetic."""
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME_RX}', 1))"
    auth = f"regexp_extract({expr}, '{_AUTH_RX}', 1)"
    user = f"regexp_extract({auth}, '^(.*@)', 1)"
    hostport = f"regexp_replace({auth}, '^.*@', '')"
    host = f"lower(regexp_replace({hostport}, ':[0-9]*$', ''))"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    default = (
        f"(({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443') OR {port} = '')"
    )
    portpart = f"CASE WHEN {default} THEN '' ELSE ':' || {port} END"
    path = pct_normalize_sql(
        f"regexp_extract({expr}, '{_PATH_RX}', 1)"
    )
    # DuckDB standard strings pass backslashes through literally, so
    # patterns embed as-is (the strip_html_sql convention); only
    # quotes would need doubling (none of these contain quotes).
    for pat, rep in DOT_SEGMENT_STEPS:
        path = f"regexp_replace({path}, '{pat}', '{rep}', 'g')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = pct_normalize_sql(
        f"regexp_extract({expr}, '{_QUERY_RX}', 1)"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN '' "
        f"ELSE {scheme} || '://' || {user} || {host} || {portpart} "
        f"|| {path} || {query} "
        f"END"
    )
