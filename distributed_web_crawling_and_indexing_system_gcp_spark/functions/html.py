"""HTML → interleaved text+media span parsing.

The reference extracts (a) flat text ``' '.join(soup.stripped_strings)``
(/root/reference/src/crawler/crawler_node.py:304-307) and (b) the ordered
``<a href>`` list (crawler_node.py:346-356), discarding document structure.
Per the mandated input shape (BASELINE.json ``input_hint``) we instead emit
one row per page with a ``spans`` column that *interleaves* what the
reference flattens:

    spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>

- ``kind='text'``  — one span per stripped, non-empty text node, document
  order (``text`` set, ``media_ref`` null).  ``concat_ws(' ', text spans)``
  equals the reference's joined ``stripped_strings`` string.
- ``kind='link'``  — one span per ``<a href=...>`` (``media_ref`` = raw
  href, ``text`` null), document order.
- ``kind='image'`` — one span per ``<img src=...>``.
- ``offset``       — global document-order position, ascending from 0.

BeautifulSoup is not available in this environment; parsing uses the
stdlib ``html.parser`` with entity conversion on, which matches
``soup.stripped_strings`` for the well-formed fixture HTML this engine is
tested against (script/style text is included, as bs4's ``.strings`` does).
The pytest oracle re-implements these semantics independently
(tests/oracle.py) so the parity check is not self-referential at the
pipeline level.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

# The UDF returns ONLY the spans — `links` (href sequence) and `text`
# (joined text nodes) are pure projections of the spans and are derived
# JVM-side with Catalyst array functions (links_view / text_view below).
# Returning them from Python would double the Arrow transfer volume of
# the crawl's hottest stage.
PARSE_SCHEMA = ArrayType(SPAN_SCHEMA)


class _SpanParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str | None, str | None]] = []
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "a" and a.get("href") is not None:
            self.spans.append(("link", None, a["href"]))
            self.links.append(a["href"])
        elif tag == "img" and a.get("src") is not None:
            self.spans.append(("image", None, a["src"]))

    # <img> frequently appears self-closed
    handle_startendtag = handle_starttag

    def handle_data(self, data):
        stripped = data.strip()
        if stripped:
            self.spans.append(("text", stripped, None))


import re as _re
from html import unescape as _unescape

# ---------------------------------------------------------------------------
# Fast path: regex tokenizer (VERDICT r3 #8).
#
# HTML parsing is the crawl's dominant per-page CPU, and stdlib HTMLParser
# walks the document char-by-char in pure Python.  For the common case —
# no comments/script/style/CDATA/processing instructions, double-quoted
# attributes — a single C-speed regex scan over the document produces the
# IDENTICAL span stream (validated against the HTMLParser path by
# tests/test_html.py::test_fast_parse_matches_htmlparser and the crawl
# parity suite).  Any document the tokenizer cannot prove simple falls
# back to the HTMLParser path, so the fast path is an optimization, never
# a semantics change.
# ---------------------------------------------------------------------------

# constructs that switch HTMLParser into modes the tokenizer doesn't model
_SUSPECT_RE = _re.compile(r"<(?:!|\?|/?script|/?style)", _re.I)
# a full tag: name + attribute segment (quoted runs may contain '>')
_TAG_RE = _re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>")
_HREF_SRC_RE = _re.compile(r"(?:^|\s)(href|src)\s*=\s*\"([^\"]*)\"", _re.I)
_HS_ANY_RE = _re.compile(r"href|src", _re.I)


def _parse_fast(html: str) -> list | None:
    """Tokenize simple HTML into (kind, text, media_ref) spans; return
    None when the document needs the exact HTMLParser semantics."""
    if _SUSPECT_RE.search(html):
        return None
    spans: list = []
    append = spans.append
    pos = 0
    for m in _TAG_RE.finditer(html):
        start = m.start()
        if start > pos:
            text = html[pos:start]
            if "<" in text:
                return None  # bare '<' splits HTMLParser data nodes
            stripped = text.strip()
            if stripped:
                if "&" in stripped:
                    stripped = _unescape(stripped)
                append(("text", stripped, None))
        pos = m.end()
        if m.group(1):  # end tag
            continue
        tag = m.group(2).lower()
        if tag in ("a", "img"):
            want = "href" if tag == "a" else "src"
            seg = m.group(3)
            if _HS_ANY_RE.search(seg) is None:
                continue  # <a> without href / <img> without src: no span
            hit = None
            for am in _HREF_SRC_RE.finditer(seg):
                if am.group(1).lower() == want:
                    if hit is not None:
                        return None  # duplicate attr: HTMLParser keeps last
                    hit = am.group(2)
            if hit is None:
                # href/src present but not in simple double-quoted form
                return None
            if "&" in hit:
                hit = _unescape(hit)
            append(("link" if want == "href" else "image", None, hit))
    tail = html[pos:]
    if "<" in tail:
        return None  # dangling '<' at EOF: HTMLParser buffers/odd-cases it
    stripped = tail.strip()
    if stripped:
        if "&" in stripped:
            stripped = _unescape(stripped)
        append(("text", stripped, None))
    return spans


def parse_html_one(html: str | None) -> list | None:
    """Parse one HTML document into its interleaved span list."""
    if html is None:
        return None
    spans = _parse_fast(html)
    if spans is None:
        p = _SpanParser()
        p.feed(html)
        p.close()
        spans = p.spans
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(spans)
    ]


@pandas_udf(PARSE_SCHEMA)
def parse_html_udf(html: pd.Series) -> pd.Series:
    return pd.Series([parse_html_one(h) for h in html], dtype="object")


def text_view(spans_col):
    """Flattened text view over a spans column — equals the reference's
    ``' '.join(soup.stripped_strings)`` (crawler_node.py:307).

    Pure Catalyst: filter + transform + array_join, no UDF.
    """
    texts = F.filter(spans_col, lambda s: s["kind"] == F.lit("text"))
    return F.array_join(F.transform(texts, lambda s: s["text"]), " ")


def links_view(spans_col):
    """Ordered raw-href list over a spans column — equals the reference's
    ``soup.find_all('a', href=True)`` sequence (crawler_node.py:349-356).

    Pure Catalyst: filter + transform, no UDF.
    """
    links = F.filter(spans_col, lambda s: s["kind"] == F.lit("link"))
    return F.transform(links, lambda s: s["media_ref"])


__all__ = [
    "SPAN_SCHEMA",
    "PARSE_SCHEMA",
    "parse_html_udf",
    "parse_html_one",
    "text_view",
    "links_view",
]
