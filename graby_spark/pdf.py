"""Minimal PDF text + metadata extractor (SURVEY.md §2.2 M5).

The reference uses ``smalot/pdfparser`` (Graby.php:652-693) to pull text,
Title, Author and CreationDate from PDF responses.  No PDF library ships in
this environment, so this is a small from-scratch reader sufficient for the
two reference fixtures (tests/fixtures/document1.pdf,
Document1_pdfcreator.pdf): xref-free object scan, FlateDecode streams,
BT/ET text runs with Tj/TJ/' operators, literal and hex strings, and the
Info-dictionary metadata keys.

Unsupported constructs degrade to empty text, never raise.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

__all__ = ["PdfContent", "extract_pdf"]


@dataclass
class PdfContent:
    text: str = ""
    title: str | None = None
    author: str | None = None
    creation_date: str | None = None


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", re.S)
_INFO_KEY_RE = {
    "title": re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)"),
    "author": re.compile(rb"/Author\s*\(((?:[^()\\]|\\.)*)\)"),
    "creation_date": re.compile(rb"/CreationDate\s*\(((?:[^()\\]|\\.)*)\)"),
}
_TEXT_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ")
_TJ_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)
_TD_NL_RE = re.compile(rb"(T\*|Td|TD|')")

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.extend(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():
                octal = raw[i + 1 : i + 4]
                j = 0
                while j < len(octal) and chr(octal[j]).isdigit():
                    j += 1
                out.append(int(octal[:j], 8) & 0xFF)
                i += 1 + j
                continue
            i += 1
            continue
        out.extend(c)
        i += 1
    return bytes(out)


def _decode_text_bytes(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw[2:].decode("utf-16-be", "replace")
        except Exception:
            return ""
    return raw.decode("latin-1", "replace")


def _extract_stream_text(data: bytes) -> list[str]:
    lines: list[str] = []
    for bt in _BT_ET_RE.findall(data):
        parts: list[str] = []
        for m in re.finditer(rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')|\[((?:[^\]\\]|\\.)*)\]\s*TJ|T\*|TD|Td", bt):
            token = m.group(0)
            if token in (b"T*",) or token.endswith(b"TD") or token.endswith(b"Td"):
                if parts:
                    lines.append("".join(parts))
                    parts = []
                continue
            if m.group(1) is not None:
                parts.append(_decode_text_bytes(_unescape_pdf_string(m.group(1))))
            elif m.group(3) is not None:
                for s in _TJ_STR_RE.findall(m.group(3)):
                    parts.append(_decode_text_bytes(_unescape_pdf_string(s)))
        if parts:
            lines.append("".join(parts))
    return lines


def extract_pdf(data: bytes) -> PdfContent:
    result = PdfContent()
    if not data.startswith(b"%PDF"):
        return result
    try:
        lines: list[str] = []
        for dict_part, stream in _STREAM_RE.findall(data):
            content = stream
            if b"FlateDecode" in dict_part:
                try:
                    content = zlib.decompress(stream)
                except zlib.error:
                    try:
                        content = zlib.decompressobj().decompress(stream)
                    except zlib.error:
                        continue
            lines.extend(_extract_stream_text(content))
        result.text = "\n".join(line for line in lines if line.strip())

        for attr, pattern in _INFO_KEY_RE.items():
            m = pattern.search(data)
            if m:
                value = _decode_text_bytes(_unescape_pdf_string(m.group(1))).strip()
                if value:
                    setattr(result, attr, _normalize_meta(attr, value))
    except Exception:
        pass
    return result


def _normalize_meta(attr: str, value: str) -> str:
    if attr == "creation_date" and value.startswith("D:"):
        # D:YYYYMMDDHHmmSSOHH'mm' → ISO-ish string the date validator accepts
        raw = value[2:]
        m = re.match(r"(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?([+\-Z].*)?", raw)
        if m:
            y, mo, d, h, mi, s, tz = m.groups()
            iso = f"{y}-{mo or '01'}-{d or '01'}T{h or '00'}:{mi or '00'}:{s or '00'}"
            if tz and tz != "Z":
                tz = tz.replace("'", ":").rstrip(":")
                iso += tz
            elif tz == "Z":
                iso += "+00:00"
            return iso
    return value
