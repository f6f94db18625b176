"""Charset sniffing + decoding for crawl HTTP captures — the step
between the WARC reader's raw body bytes (s11) and every text stage
downstream. Real crawls are NOT all UTF-8: legacy hosts serve
windows-1252 with no declaration at all, CMSes declare the charset
only in a ``<meta>`` tag, and some servers lie in the Content-Type
header while the payload carries a BOM. Decoding everything as UTF-8
silently mangles exactly the long-tail text a training corpus wants.

Precedence follows the WHATWG encoding sniffing order (the
html.spec.whatwg.org algorithm browsers implement — the de-facto
law of what the bytes MEAN, since authors test against browsers):

1. **BOM** — ``EF BB BF`` → utf-8, ``FE FF`` → utf-16be,
   ``FF FE`` → utf-16le. The BOM beats everything, including a
   contradicting Content-Type header.
2. **Content-Type header** ``charset=`` parameter (case-insensitive,
   optional quotes).
3. **<meta> prescan** of the first 1024 body bytes (ASCII-compatible
   view): ``<meta charset=...>`` or the ``http-equiv`` form.
4. **Content sniff fallback**: strict-UTF-8 if the bytes validate,
   else windows-1252 (WHATWG's default for the no-information case;
   cp1252 decodes every byte, so this arm cannot fail).

Label normalization maps the common aliases (``latin-1``,
``iso-8859-1`` → windows-1252 per WHATWG; ``utf8`` → utf-8) and the
CJK legacy multibyte registry labels: ``shift_jis`` (incl.
windows-31j/sjis), ``euc-jp``, ``gbk`` (incl. gb2312 — WHATWG folds
it), ``big5`` (incl. big5-hkscs), ``euc-kr`` (incl. windows-949/
ks_c_5601) — each decoded by the stdlib codec matching the WHATWG
decoder index (see ``_PY_CODEC``), strictly — plus the registry's
single-byte members (iso-8859-2/4/5/7/8/15, windows-1250..1258,
windows-874/tis-620, koi8-r/u; WHATWG's folds iso-8859-9 →
windows-1254 and iso-8859-11 → windows-874 included), ~90 labels
total. A
DECLARED charset outside the supported set, or payload bytes that
do not decode under the declared charset, returns None — refused
loudly, the same contract as the WARC/PDF parsers: mis-decoded text
poisons every downstream gate, so a record we cannot decode
faithfully is dropped, not guessed at.

Cost tier: per-row Python over bytes — Arrow-batched ``mapInPandas``
like the media codecs; detection is O(header + 1024 bytes), decode
O(body).
"""

from __future__ import annotations

import codecs
import re

#: WHATWG label → canonical name of the codec we decode with.
#: iso-8859-1/latin-1 intentionally map to windows-1252: WHATWG
#: folds them because real-world "latin-1" content uses the 0x80-0x9F
#: printables (curly quotes, €) that only cp1252 assigns.
_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "utf-16be": "utf-16be",
    "utf-16le": "utf-16le",
    "utf-16": "utf-16le",  # WHATWG: bare utf-16 is an le alias
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    # -- CJK legacy multibyte (the WHATWG registry's label sets) --
    # A multilingual crawl that drops every declared Shift_JIS/GBK/
    # Big5/EUC page sheds most of the Japanese/Chinese/Korean long
    # tail; these labels cover the registry's spellings for the five
    # encodings, all decoded via stdlib codecs (see _PY_CODEC).
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "csshiftjis": "shift_jis",
    "windows-31j": "shift_jis",
    "euc-jp": "euc-jp",
    "euc_jp": "euc-jp",
    "x-euc-jp": "euc-jp",
    "cseucpkdfmtjapanese": "euc-jp",
    "gbk": "gbk",
    "gb2312": "gbk",          # WHATWG folds gb2312 into gbk
    "gb_2312": "gbk",
    "gb_2312-80": "gbk",
    "chinese": "gbk",
    "csgb2312": "gbk",
    "csiso58gb231280": "gbk",
    "iso-ir-58": "gbk",
    "x-gbk": "gbk",
    "big5": "big5",
    "big5-hkscs": "big5",     # WHATWG's big5 index includes HKSCS
    "cn-big5": "big5",
    "csbig5": "big5",
    "x-x-big5": "big5",
    "euc-kr": "euc-kr",
    "euc_kr": "euc-kr",
    "korean": "euc-kr",
    "csksc56011987": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "ks_c_5601-1989": "euc-kr",
    "ksc5601": "euc-kr",
    "ksc_5601": "euc-kr",
    "iso-ir-149": "euc-kr",
    "windows-949": "euc-kr",  # WHATWG folds UHC into euc-kr
    # -- single-byte registry members (all stdlib, strict) --
    # Central European
    "iso-8859-2": "iso-8859-2",
    "iso8859-2": "iso-8859-2",
    "latin2": "iso-8859-2",
    "windows-1250": "windows-1250",
    "cp1250": "windows-1250",
    # Cyrillic
    "iso-8859-5": "iso-8859-5",
    "iso8859-5": "iso-8859-5",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "koi8": "koi8-r",
    "koi8-u": "koi8-u",
    "koi8-ru": "koi8-u",
    # Greek
    "iso-8859-7": "iso-8859-7",
    "iso8859-7": "iso-8859-7",
    "greek": "iso-8859-7",
    "greek8": "iso-8859-7",
    "windows-1253": "windows-1253",
    "cp1253": "windows-1253",
    # Turkish
    "iso-8859-9": "windows-1254",  # WHATWG folds 8859-9 into 1254
    "iso8859-9": "windows-1254",
    "latin5": "windows-1254",
    "windows-1254": "windows-1254",
    "cp1254": "windows-1254",
    # Hebrew / Arabic
    "iso-8859-8": "iso-8859-8",
    "iso8859-8": "iso-8859-8",
    "hebrew": "iso-8859-8",
    "windows-1255": "windows-1255",
    "cp1255": "windows-1255",
    "windows-1256": "windows-1256",
    "cp1256": "windows-1256",
    # Baltic / Western supplement
    "iso-8859-4": "iso-8859-4",
    "iso8859-4": "iso-8859-4",
    "latin4": "iso-8859-4",
    "windows-1257": "windows-1257",
    "cp1257": "windows-1257",
    "iso-8859-15": "iso-8859-15",
    "iso8859-15": "iso-8859-15",
    "latin9": "iso-8859-15",
    # Thai / Vietnamese
    "windows-874": "windows-874",
    "tis-620": "windows-874",  # WHATWG folds TIS-620 into 874
    "iso-8859-11": "windows-874",
    "windows-1258": "windows-1258",
    "cp1258": "windows-1258",
}

#: Canonical label → the stdlib codec implementing the WHATWG
#: decoder for it. WHATWG's Shift_JIS index is windows-31j (the
#: NEC/IBM extension rows) → cp932; its euc-kr index is UHC/
#: windows-949 → cp949; its gbk decoder IS the gb18030 decoder per
#: spec → gb18030; its big5 index carries the HKSCS extensions →
#: big5hkscs. Labels absent here decode under their own name.
#: All CJK decodes stay STRICT — a declared-but-invalid body is
#: refused like any other lying declaration.
_PY_CODEC = {
    "shift_jis": "cp932",
    "euc-jp": "euc_jp",
    "gbk": "gb18030",
    "big5": "big5hkscs",
    "euc-kr": "cp949",
    # single-byte canonical names mapping onto stdlib spellings
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "windows-874": "cp874",
}

#: Python's windows-* single-byte codecs leave their 0x80-0x9F holes
#: undefined and raise on them in strict mode (cp1252: 0x81 0x8D
#: 0x8F 0x90 0x9D; cp1250: 0x81 0x83 0x88 0x90 0x98; cp1251: 0x98;
#: cp874: most of the block; ...). The WHATWG single-byte indexes —
#: the ones browsers implement and this module claims — fill every
#: such 0x80-0x9F hole with the like-numbered C1 control, so real
#: legacy pages carrying stray C1 bytes still decode. This error
#: handler supplies exactly that mapping and NOTHING more: an
#: undefined byte outside 0x80-0x9F (e.g. cp1255's 0xFB, cp1257's
#: 0xA1 — positions the WHATWG indexes also leave undefined) still
#: refuses, per spec, and utf-8/utf-16/CJK stay fully strict.
def _whatwg_c1_errors(exc):
    if not isinstance(exc, UnicodeDecodeError):  # pragma: no cover
        raise exc
    bad = exc.object[exc.start:exc.end]
    if all(0x80 <= b <= 0x9F for b in bad):
        return "".join(chr(b) for b in bad), exc.end
    raise exc


codecs.register_error("whatwgc1", _whatwg_c1_errors)


def _errors_for(label: str) -> str:
    # the windows-* family (incl. windows-874) gets the C1 fill; the
    # iso-8859/koi8 codecs are already total in Python, and strict
    # is a no-op for them
    return "whatwgc1" if label.startswith("windows-") else "strict"


_CHARSET_PARAM_RX = re.compile(
    r"charset[ \t]*=[ \t]*[\"']?([A-Za-z0-9_.:-]+)[\"']?", re.I
)
_META_RX = re.compile(
    rb"<meta[^>]+charset[ \t]*=[ \t]*[\"']?([A-Za-z0-9_.:-]+)", re.I
)


def _label(raw: str) -> str | None:
    return _ALIASES.get(raw.strip().lower())


def sniff_charset(content_type: str | None, body: bytes) -> str | None:
    """The detection step alone: the canonical charset label for
    ``body`` under the WHATWG precedence (BOM > header > meta
    prescan > UTF-8-validates > windows-1252), or None when a
    DECLARED label is outside the supported set. Never None for
    undeclared content — the fallback arm always names a charset."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if body[:2] == b"\xfe\xff":
        return "utf-16be"
    if body[:2] == b"\xff\xfe":
        return "utf-16le"
    if content_type:
        m = _CHARSET_PARAM_RX.search(content_type)
        if m:
            return _label(m.group(1))  # declared but unknown: None
    m = _META_RX.search(body[:1024])
    if m:
        label = _label(m.group(1).decode("ascii", "replace"))
        # WHATWG prescan: a meta declaring ANY utf-16 flavor (be/le/
        # bare — the bare spelling is the common one) is self-
        # contradictory (the prescan only works on ASCII-compatible
        # bytes, so the document cannot actually BE utf-16) and MUST
        # be treated as utf-8 — honoring it decodes ASCII pages into
        # CJK mojibake
        if label is not None and label.startswith("utf-16"):
            return "utf-8"
        return label
    try:
        body.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_body(content_type: str | None, body: bytes) -> tuple[str, str] | None:
    """Sniff + decode: ``(charset_label, text)`` with the BOM (when
    the sniff consumed one) stripped from the text, or None when the
    charset is undeclared-and-unsupported or the bytes do not decode
    strictly under the sniffed charset (a LYING declaration — utf-16
    with an odd byte count, declared utf-8 that isn't — is refused,
    not patched with replacement chars). windows-1252 alone is a
    TOTAL decode (the WHATWG mapping assigns every byte, incl. the
    five Python's strict cp1252 leaves undefined), so the refusal
    arm never fires for it — per spec, not leniency."""
    label = sniff_charset(content_type, body)
    if label is None:
        return None
    data = body
    if label == "utf-8" and data[:3] == codecs.BOM_UTF8:
        data = data[3:]
    elif label == "utf-16be" and data[:2] == codecs.BOM_UTF16_BE:
        data = data[2:]
    elif label == "utf-16le" and data[:2] == codecs.BOM_UTF16_LE:
        data = data[2:]
    try:
        codec = _PY_CODEC.get(label, label)
        return label, data.decode(codec, _errors_for(label))
    except UnicodeDecodeError:
        return None


_CT_HEADER_RX = re.compile(
    rb"^content-type[ \t]*:([^\r\n]*)", re.I | re.M
)


def http_decode_text(record_content: bytes) -> tuple[str, str] | None:
    """The front-door composition: split an HTTP response record into
    headers + body (via the s11 dechunker, so chunked captures work),
    pull the Content-Type header, sniff, decode. Returns
    ``(charset_label, text)`` or None for non-HTTP content, refused
    transfer codings, or an undecodable body."""
    from trisk_datawrangle_spark.llm.extract import http_body

    body = http_body(record_content)
    if body is None:
        return None
    sep = record_content.find(b"\r\n\r\n")
    head = record_content[:sep]
    m = _CT_HEADER_RX.search(head)
    ctype = m.group(1).decode("ascii", "replace") if m else None
    return decode_body(ctype, body)
