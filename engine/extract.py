"""HTML → (title, body, meta) extraction — the byte-identity contract.

Pure-Python re-implementation of the reference extraction *rules*
(lucene/benchmark/.../feeds/DemoHTMLParser.java:63-163, NekoHTML-based):

- ``title``  = character data inside ``<title>`` while inside ``<head>``,
  ``.trim()``-ed at the end (DemoHTMLParser.java:148-150).
- ``body``   = character data while inside ``<body>`` and not inside a
  suppressed subtree; ``<style>``/``<script>`` subtrees are suppressed
  (SUPPRESS_ELEMENTS, :161-163); a ``'\\n'`` is appended at the *end* of
  each block element (ENDLINE_ELEMENTS, :154-158); ``<img alt="x">``
  contributes ``[x]`` (:89-93); character data outside body is dropped.
- ``meta``   = while inside ``<head>``, ``<meta name|http-equiv=... content=...>``
  collected as lowercase(name) → content (:72-81).
- ``<frameset>`` raises (parser rejects framesets, :98-99).
- Entities are decoded (NekoHTML decodes standard HTML entities; here via
  ``html.unescape`` — the fixture generator emits only standard entities).

This module deliberately implements an *event stream* scanner, not a
tag-balancing DOM: counters (inHEAD/inBODY/inTITLE/suppressed) change only
on explicit start/end events exactly as the reference SAX handler does.
HTML void elements (br, hr, img, meta, ...) emit start+end immediately,
mirroring NekoHTML's empty-element reporting — that is what makes ``<br>``
produce a newline. The fixture generator (engine/fixtures.py) and the build
pipeline share this one module, which is what makes the per-url extracted
text byte-identical by construction and testable against rule-level goldens.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# DemoHTMLParser.java:154-158
ENDLINE_ELEMENTS = frozenset(
    "p h1 h2 h3 h4 h5 h6 div ul ol dl pre hr blockquote address fieldset "
    "table form noscript li dt dd noframes br tr select option".split()
)
# DemoHTMLParser.java:161-163
SUPPRESS_ELEMENTS = frozenset({"style", "script"})
# HTML void elements: start implies immediate end (NekoHTML empty-element report).
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:[^>'\"]|\"[^\"]*\"|'[^']*')*?)(/?)>")
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)


class FramesetError(ValueError):
    """Raised for frameset pages (DemoHTMLParser.java:98-99 rejects them)."""


@dataclass
class Extracted:
    title: str = ""
    body: str = ""
    meta: dict[str, str] = field(default_factory=dict)


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = ""
        elif val[:1] in ("'", '"'):
            val = val[1:-1]
        attrs.setdefault(name, _htmllib.unescape(val))
    return attrs


def extract(html: str | bytes) -> Extracted:
    """Run the DemoHTMLParser rules over one HTML document."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")

    title_parts: list[str] = []
    body_parts: list[str] = []
    meta: dict[str, str] = {}
    in_head = in_body = in_title = suppressed = 0

    def characters(text: str) -> None:
        if not text:
            return
        if in_body > 0 and suppressed == 0:
            body_parts.append(_htmllib.unescape(text))
        elif in_title > 0:
            title_parts.append(_htmllib.unescape(text))

    def start_element(name: str, attrs: dict[str, str]) -> None:
        nonlocal in_head, in_body, in_title, suppressed
        if in_head > 0:
            if name == "title":
                in_title += 1
            elif name == "meta":
                key = attrs.get("name")
                if key is None:
                    key = attrs.get("http-equiv")
                val = attrs.get("content")
                if key is not None and val is not None:
                    meta[key.lower()] = val
        elif in_body > 0:
            if name in SUPPRESS_ELEMENTS:
                suppressed += 1
            elif name == "img":
                alt = attrs.get("alt")
                if alt is not None:
                    body_parts.append(f"[{alt}]")
        elif name == "body":
            in_body += 1
        elif name == "head":
            in_head += 1
        elif name == "frameset":
            raise FramesetError("This parser does not support HTML framesets.")

    def end_element(name: str) -> None:
        nonlocal in_head, in_body, in_title, suppressed
        if in_body > 0:
            if name == "body":
                in_body -= 1
            elif name in ENDLINE_ELEMENTS:
                body_parts.append("\n")
            elif name in SUPPRESS_ELEMENTS:
                suppressed -= 1
        elif in_head > 0:
            if name == "head":
                in_head -= 1
            elif in_title > 0 and name == "title":
                in_title -= 1

    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            characters(html[i:])
            break
        if lt > i:
            characters(html[i:lt])
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if html.startswith("<!", lt) or html.startswith("<?", lt):
            end = html.find(">", lt)
            i = n if end == -1 else end + 1
            continue
        m = _TAG_RE.match(html, lt)
        if m is None:
            characters("<")  # stray '<' is character data
            i = lt + 1
            continue
        closing, name, rawattrs, selfclose = m.groups()
        name = name.lower()
        i = m.end()
        if closing:
            end_element(name)
            continue
        attrs = _parse_attrs(rawattrs) if rawattrs.strip() else {}
        start_element(name, attrs)
        if selfclose or name in VOID_ELEMENTS:
            end_element(name)
        elif name in ("script", "style"):
            # raw-text element: content is CDATA until the matching close tag
            close = re.compile(rf"</{name}\s*>", re.IGNORECASE)
            cm = close.search(html, i)
            if cm is None:
                i = n  # unclosed raw-text: rest of doc swallowed, no end event
            else:
                i = cm.end()
                end_element(name)

    return Extracted(title="".join(title_parts).strip(), body="".join(body_parts), meta=meta)


def extract_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Ray Data map_batches stage: add ``title`` and ``text`` columns
    extracted from the ``html`` binary column. Frameset pages are flagged in
    a boolean ``rejected`` column (title/text empty), not dropped, so row
    counts and lineage stay stable."""
    htmls = batch.column(html_col).to_pylist()
    titles = np.empty(len(htmls), dtype=object)
    bodies = np.empty(len(htmls), dtype=object)
    rejected = np.zeros(len(htmls), dtype=bool)
    for j, h in enumerate(htmls):
        try:
            ex = extract(h if h is not None else b"")
            titles[j], bodies[j] = ex.title, ex.body
        except FramesetError:
            titles[j], bodies[j], rejected[j] = "", "", True
    out = batch.drop_columns([c for c in ("title", "text", "rejected") if c in batch.column_names])
    out = out.append_column("title", pa.array(titles, type=pa.string()))
    out = out.append_column("text", pa.array(bodies, type=pa.string()))
    out = out.append_column("rejected", pa.array(rejected))
    return out
