"""Charset sniffing / UTF-8 normalization (SURVEY.md §2.3, C1-C6).

Reimplements ``Graby::convert2Utf8`` (Graby.php:909-1008) over raw page
bytes: charset from the Content-Type header (last match, redirect-safe),
fallback sniff over the first 50,000 bytes (XML declaration,
``http-equiv=Content-Type``, any ``<meta ... charset=``), bad-charset fixes
(``iso-8850-1`` typo, ``none``), cp1252 smart-quote bytes 0x82-0x9F mapped to
HTML entities when charset is empty/iso-8859-1, and final transcode with the
HTTP 1.1 iso-8859-1 default.

Inside the Spark job this runs vectorized over an Arrow batch column of
``html:binary`` — pure byte/str ops, no DOM.
"""

from __future__ import annotations

import re

__all__ = ["convert_to_utf8", "detect_charset"]

_CT_CHARSET_RE = re.compile(rb"""([^;]+)(?:;\s*charset=["']?([^;"'\n]*))?""", re.I | re.M)
_XML_DECL_RE = re.compile(rb"""^<\?xml\s+version=(?:"[^"]*"|'[^']*')\s+encoding=("[^"]*"|'[^']*')""", re.S)
_META_HTTP_EQUIV_RE = re.compile(
    rb"""<meta\s+http-equiv\s*=\s*["']?Content-Type["']? content\s*=\s*["'][^;]+;\s*charset=["']?([^;"'>]+)""",
    re.I,
)
_META_TAG_RE = re.compile(rb"<meta\s+([^>]+)>", re.I)
_META_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?([^"']+)""", re.I)

# MS smart-quote byte → HTML entity (Graby.php:964-992)
_CP1252_ENTITIES = {
    0x82: b"&sbquo;",
    0x83: b"&fnof;",
    0x84: b"&bdquo;",
    0x85: b"&hellip;",
    0x86: b"&dagger;",
    0x87: b"&Dagger;",
    0x88: b"&circ;",
    0x89: b"&permil;",
    0x8A: b"&Scaron;",
    0x8B: b"&lsaquo;",
    0x8C: b"&OElig;",
    0x91: b"&lsquo;",
    0x92: b"&rsquo;",
    0x93: b"&ldquo;",
    0x94: b"&rdquo;",
    0x95: b"&bull;",
    0x96: b"&ndash;",
    0x97: b"&mdash;",
    0x98: b"&tilde;",
    0x99: b"&trade;",
    0x9A: b"&scaron;",
    0x9B: b"&rsaquo;",
    0x9C: b"&oelig;",
    0x9F: b"&Yuml;",
}

# python codec aliases for charsets commonly seen in the wild
_CODEC_ALIASES = {
    "euc-kr": "euc_kr",
    "ks_c_5601-1987": "cp949",
    "windows-1252": "cp1252",
    "iso-8859-1": "latin-1",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "gb2312": "gb2312",
    "big5": "big5",
    "x-sjis": "shift_jis",
}


def detect_charset(html: bytes, content_type: str) -> str:
    """Return the normalized charset name ('' if undetectable).

    Mirrors the header-then-HTML sniff order of Graby.php:922-962.
    """
    encoding = b""
    matches = _CT_CHARSET_RE.findall(content_type.encode("utf-8", "replace"))
    if matches:
        last = matches[-1]
        if last[1]:
            encoding = last[1].strip(b"\"' \r\n\x00\x0b\t")

    if not encoding or encoding.lower() == b"none":
        head = html[:50000]
        m = _XML_DECL_RE.match(head)
        if m:
            encoding = m.group(1).strip(b"\"'")
        else:
            m = _META_HTTP_EQUIV_RE.search(head)
            if m:
                encoding = m.group(1).strip()
            else:
                for attrs in _META_TAG_RE.findall(head):
                    m = _META_CHARSET_RE.search(attrs)
                    if m:
                        encoding = m.group(1).strip()
                        break

    enc = encoding.decode("ascii", "replace").strip().lower()
    if enc == "iso-8850-1":  # observed bad value (Graby.php:960-962)
        enc = "iso-8859-1"
    if enc == "none":
        enc = ""
    return enc


def _apply_smart_quotes(html: bytes) -> bytes:
    if not _has_cp1252_bytes(html):
        return html
    out = bytearray()
    for byte in html:
        repl = _CP1252_ENTITIES.get(byte)
        if repl is not None:
            out.extend(repl)
        else:
            out.append(byte)
    return bytes(out)


def _has_cp1252_bytes(html: bytes) -> bool:
    return any(b in _CP1252_ENTITIES for b in set(html[:200000])) if len(html) < 200000 else any(
        b in _CP1252_ENTITIES for b in set(html)
    )


def convert_to_utf8(html: bytes, content_type: str) -> str:
    """Graby::convert2Utf8 over bytes → UTF-8 str."""
    if not html:
        return ""
    if not content_type:
        return html.decode("utf-8", "replace")

    # remove strange things (Graby.php:920)
    html = html.replace(b"</[>", b"")

    enc = detect_charset(html, content_type)

    if not enc or enc == "iso-8859-1":
        html = _apply_smart_quotes(html)

    if enc != "utf-8":
        codec = _CODEC_ALIASES.get(enc or "iso-8859-1", enc or "iso-8859-1")
        try:
            return html.decode(codec, "replace")
        except LookupError:
            return html.decode("latin-1", "replace")

    return html.decode("utf-8", "replace")
