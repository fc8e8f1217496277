"""Allowlist HTML sanitizer (SURVEY.md §2.8 O10).

Approximates the reference's htmLawed ``safe=1`` profile
(/root/reference/src/Graby.php:1013-1032: keep all elements plus iframe,
drop <meta>, deny ``style``/``srcdoc`` attributes, strip comments/CDATA)
pinned by tests/GrabyTest.php:1159-1184.  Implemented over our DOM as a
parse → filter → serialize pass; runs inside the extraction UDF only when
``xss_filter`` is enabled (the golden fixtures disable it,
tests/GrabyTest.php:69).
"""

from __future__ import annotations

import re

from .dom import CommentNode, Element, Node, TextNode, parse_fragment, serialize

__all__ = ["sanitize_html"]

# htmLawed safe=1 removes these vectors entirely
_DENY_TAGS = frozenset(
    ["script", "applet", "embed", "object", "meta", "base", "basefont", "isindex"]
)
_DENY_ATTRS = frozenset(["style", "srcdoc"])
_EVENT_ATTR_RE = re.compile(r"^on", re.I)
_BAD_SCHEME_RE = re.compile(r"^\s*(javascript|vbscript|data\s*:(?!image/))", re.I)
_URL_ATTRS = frozenset(["href", "src", "action", "formaction", "poster", "background"])


def _clean_element(el: Element) -> None:
    kept_attrs: list[tuple[str, str]] = []
    for name, value in el.attrs:
        lname = name.lower()
        if lname in _DENY_ATTRS or _EVENT_ATTR_RE.match(lname):
            continue
        if lname in _URL_ATTRS and _BAD_SCHEME_RE.match(value or ""):
            continue
        kept_attrs.append((name, value))
    el.attrs = kept_attrs


def _walk(node: Element) -> None:
    for child in list(node.children):
        if isinstance(child, CommentNode):
            node.remove_child(child)
        elif isinstance(child, Element):
            if child.tag in _DENY_TAGS:
                node.remove_child(child)
            else:
                _clean_element(child)
                _walk(child)


def sanitize_html(html: str) -> str:
    nodes = _walk_fragment(html)
    return "".join(serialize(n) for n in nodes)


def _walk_fragment(html: str) -> list[Node]:
    container = Element("div")
    for node in parse_fragment(html):
        container.append(node)
    _walk(container)
    return list(container.children)
