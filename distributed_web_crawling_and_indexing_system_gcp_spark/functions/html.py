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

PARSE_SCHEMA = StructType(
    [
        StructField("spans", ArrayType(SPAN_SCHEMA)),
        StructField("links", ArrayType(StringType())),
        StructField("text", StringType()),
    ]
)


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


def parse_html_one(html: str | None) -> dict | None:
    """Parse one HTML document into (spans, links, text)."""
    if html is None:
        return None
    p = _SpanParser()
    p.feed(html)
    p.close()
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(p.spans)
    ]
    text = " ".join(t for k, t, _ in p.spans if k == "text")
    return {"spans": spans, "links": p.links, "text": text}


@pandas_udf(PARSE_SCHEMA)
def parse_html_udf(html: pd.Series) -> pd.DataFrame:
    rows = [parse_html_one(h) for h in html]
    return pd.DataFrame(
        {
            "spans": [r["spans"] if r else None for r in rows],
            "links": [r["links"] if r else None for r in rows],
            "text": [r["text"] if r else None for r in rows],
        }
    )


def text_view(spans_col):
    """Flattened text view over a spans column — equals the reference's
    ``' '.join(soup.stripped_strings)`` (crawler_node.py:307).

    Pure Catalyst: filter + transform + array_join, no UDF.
    """
    texts = F.filter(spans_col, lambda s: s["kind"] == F.lit("text"))
    return F.array_join(F.transform(texts, lambda s: s["text"]), " ")


__all__ = ["SPAN_SCHEMA", "PARSE_SCHEMA", "parse_html_udf", "parse_html_one", "text_view"]
