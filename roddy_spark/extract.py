"""HTML extraction — the reference's goquery CSS-select path (SURVEY.md
S4-S7, roddy.go:497-531, element.go:39-88) as ONE Arrow-batched parse pass.

The sandbox has no lxml/selectolax, so the parser is stdlib
``html.parser.HTMLParser``; the Spark-side shape (pandas UDF →
``array<struct>`` → ``explode``) is the production design either way. One
parse emits everything the reference's per-selector callbacks would read:
title, effective <base href> (roddy.go:507-516), anchors (href/rel/text in
document order = ``pos``), images (src/alt) and ``p.description`` texts —
the selectors exercised by the reference's own tests (roddy_test.go:140-168).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

PARSED_SCHEMA = StructType([
    StructField("title", StringType()),
    StructField("base_href", StringType()),
    StructField("links", ArrayType(StructType([
        StructField("href", StringType()),
        StructField("text", StringType()),
        StructField("pos", IntegerType()),
        StructField("rel", StringType()),
    ]))),
    StructField("images", ArrayType(StructType([
        StructField("src", StringType()),
        StructField("alt", StringType()),
        StructField("pos", IntegerType()),
    ]))),
    StructField("descriptions", ArrayType(StringType())),
])


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.base_href: str | None = None
        self.links: list[dict] = []
        self.images: list[dict] = []
        self.descriptions: list[str] = []
        self._in_title = False
        self._cur_link: dict | None = None
        self._desc_depth = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "title":
            self._in_title = True
            self.title = self.title or ""
        elif tag == "base" and self.base_href is None and a.get("href"):
            self.base_href = a["href"]
        elif tag == "a" and a.get("href") is not None:
            self._cur_link = {"href": a["href"], "text": "",
                              "pos": len(self.links),
                              "rel": a.get("rel", "") or ""}
            self.links.append(self._cur_link)
        elif tag == "img" and a.get("src"):
            self.images.append({"src": a["src"], "alt": a.get("alt", ""),
                                "pos": len(self.images)})
        elif tag == "p" and "description" in (a.get("class") or "").split():
            self._desc_depth = 1
            self.descriptions.append("")

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "a":
            self._cur_link = None
        elif tag == "p" and self._desc_depth:
            self._desc_depth = 0

    def handle_data(self, data):
        if self._in_title:
            self.title = (self.title or "") + data
        if self._cur_link is not None:
            self._cur_link["text"] += data
        if self._desc_depth:
            self.descriptions[-1] += data


def parse_html(html: str | None) -> dict | None:
    if not html:
        return None
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    return {"title": p.title, "base_href": p.base_href, "links": p.links,
            "images": p.images, "descriptions": p.descriptions}


@F.pandas_udf(PARSED_SCHEMA)
def parse_html_udf(html: pd.Series) -> pd.DataFrame:
    rows = [parse_html(h) for h in html]
    return pd.DataFrame(
        [(r or {"title": None, "base_href": None, "links": None,
                "images": None, "descriptions": None}) for r in rows],
        columns=["title", "base_href", "links", "images", "descriptions"])
