"""Main-content (boilerplate-removal) extraction for crawled pages — the
step between "fetch HTML" and every text-quality/dedup operator in a
training-data pipeline (trafilatura / boilerpipe / resiliparse territory).
No counterpart in the reference crawler (coghost/roddy hands raw bodies to
user callbacks); this is pipeline-brief scope, DuckDB-oracled via the
``main_text`` contract entry over relationally-defined HTML.

Semantics (deterministic rules, no model):

- Subtrees under ``nav header footer aside form script style noscript
  template svg iframe select`` are boilerplate containers — every text
  node inside them is dropped wholesale.
- A *block* is the direct text of one block-level element (``p``,
  headings, ``li``, table cells, ``blockquote``, ``pre``, ``div`` …);
  text always belongs to the innermost open block, so a ``div`` wrapper
  contributes only the text between its child blocks.
- A block is *kept* iff it has at least ``min_words`` whitespace words
  AND its link density (chars of text inside ``<a>`` / all its chars)
  is at most ``max_link_density`` — the boilerpipe word-count + link
  density rule pair, the two highest-signal features in its evaluation.
- ``main_text`` is the kept blocks' whitespace-normalized text joined
  by ``\\n`` in document order (order of block START tags).

Scale shape: identical to ``extract.py`` link extraction — page bodies
cross into Python exactly once through one Arrow-batched pandas UDF; the
parse is a single streaming pass per page (no DOM tree is materialized);
nothing body-sized is ever shuffled. At 100 TB this is an embarrassingly
parallel map over the pages scan with a ~`len(html)`-bounded working set
per row.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from roddy_spark.extract import (_IMPLIED_SIBLINGS, _P_CLOSERS,
                                 _P_SCOPE_BOUNDARY, _VOID_TAGS)

# containers whose entire subtree is boilerplate
SUPPRESS_TAGS = frozenset(
    "nav header footer aside form script style noscript template svg "
    "iframe select".split())

# elements whose direct text forms one candidate block
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li dt dd td th blockquote pre figcaption "
    "caption summary div article section main".split())


class _MainTextParser(HTMLParser):
    """One streaming pass: segment direct text into blocks, count linked
    chars, apply the implied-end-tag rules so end-tag-omitting HTML
    (``<ul><li>a<li>b``, ``<p>one<p>two``) segments like net/html's tree."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # frames: [tag, suppress?, anchor?, block dict or None]
        self.stack: list = []
        self.suppress = 0
        self.anchors = 0
        self.blocks: list = []

    def _innermost_block(self):
        for fr in reversed(self.stack):
            if fr[3] is not None:
                return fr[3]
        return None

    def _push(self, tag: str) -> None:
        sup = tag in SUPPRESS_TAGS
        anc = tag == "a"
        blk = None
        if not sup and not self.suppress and tag in BLOCK_TAGS:
            blk = {"seq": len(self.blocks), "parts": [],
                   "linked": 0, "total": 0}
            self.blocks.append(blk)
        self.stack.append([tag, sup, anc, blk])
        self.suppress += sup
        self.anchors += anc

    def _pop_to(self, si: int) -> None:
        while len(self.stack) > si:
            _tag, sup, anc, _blk = self.stack.pop()
            self.suppress -= sup
            self.anchors -= anc

    def _implied_end(self, tag: str) -> None:
        rule = _IMPLIED_SIBLINGS.get(tag)
        if rule:
            closees, boundary = rule
            popped = True
            while popped:
                popped = False
                for si in range(len(self.stack) - 1, -1, -1):
                    t = self.stack[si][0]
                    if t in closees:
                        self._pop_to(si)
                        popped = True
                        break
                    if t in boundary:
                        break
        if tag in _P_CLOSERS:
            for si in range(len(self.stack) - 1, -1, -1):
                t = self.stack[si][0]
                if t == "p":
                    self._pop_to(si)
                    break
                if t in _P_SCOPE_BOUNDARY:
                    break

    def handle_starttag(self, tag, attrs):
        self._implied_end(tag)
        if tag in _VOID_TAGS:
            # br/hr separate words in the surrounding block
            blk = self._innermost_block()
            if blk is not None and not self.suppress:
                blk["parts"].append(" ")
            return
        self._push(tag)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self._pop_to(len(self.stack) - 1)

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        for si in range(len(self.stack) - 1, -1, -1):
            if self.stack[si][0] == tag:
                self._pop_to(si)
                break

    def handle_data(self, data):
        if self.suppress or not data:
            return
        blk = self._innermost_block()
        if blk is None:
            return
        blk["parts"].append(data)
        blk["total"] += len(data)
        if self.anchors:
            blk["linked"] += len(data)


def main_text_of(html: str | None, min_words: int = 5,
                 max_link_density: float = 0.5) -> tuple[str, int, int]:
    """(main_text, n_blocks, n_kept) for one page. Blocks that collected
    no non-whitespace text at all (pure wrappers) are not counted."""
    if not html:
        return "", 0, 0
    p = _MainTextParser()
    try:
        p.feed(html)
        p.close()
    except RecursionError:
        # same policy as select_html: pathological nesting skips the page;
        # anything else is an engine bug and raises loudly
        return "", 0, 0
    kept: list[str] = []
    n_blocks = 0
    for blk in p.blocks:
        text = " ".join("".join(blk["parts"]).split())
        if not text:
            continue
        n_blocks += 1
        words = text.count(" ") + 1
        density = blk["linked"] / blk["total"] if blk["total"] else 0.0
        if words >= min_words and density <= max_link_density:
            kept.append(text)
    return "\n".join(kept), n_blocks, len(kept)


MAIN_TEXT_SCHEMA = StructType([
    StructField("main_text", StringType()),
    StructField("n_blocks", IntegerType()),
    StructField("n_kept", IntegerType()),
])


def extract_main_text(df: DataFrame, html_col: str = "body_html",
                      keep: tuple = ("url_norm", "depth", "seq"),
                      min_words: int = 5,
                      max_link_density: float = 0.5) -> DataFrame:
    """Per-page boilerplate removal: ``keep`` columns + (main_text,
    n_blocks, n_kept). Bodies cross into Python once (Arrow-batched),
    nothing body-sized shuffles — the same plan shape as ``expand``."""

    @F.pandas_udf(MAIN_TEXT_SCHEMA)
    def mt_udf(html: pd.Series) -> pd.DataFrame:
        rows = [main_text_of(h, min_words, max_link_density) for h in html]
        return pd.DataFrame(rows,
                            columns=["main_text", "n_blocks", "n_kept"])

    keep_cols = [c for c in keep if c in df.columns]
    return (df.withColumn("__mt", mt_udf(F.col(html_col)))
            .select(*keep_cols, "__mt.main_text", "__mt.n_blocks",
                    "__mt.n_kept"))
