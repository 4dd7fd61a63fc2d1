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
from pyspark.sql.types import (ArrayType, IntegerType, MapType, StringType,
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
        # implied </p>: a block-level (or sibling p) start tag closes an
        # open p.description capture, as net/html would (ADVICE r4) — the
        # set lives beside the selector engine (_P_CLOSERS below)
        if self._desc_depth and tag in _P_CLOSERS:
            self._desc_depth = 0
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


# ---------------------------------------------------------------------------
# Vectorized anchor extraction — the link-discovery hot path.
#
# The stdlib HTMLParser costs ~0.4 ms/page of per-character Python; at crawl
# scale (10^6 pages/level and up) that is the single largest CPU line after
# URL work. Machine-generated HTML — the overwhelming majority of what a
# crawler parses — has a regular anchor shape that C-speed regexes
# (pandas .str.extractall) handle exactly. A page takes the fast path ONLY
# if it provably contains nothing the regex could misread:
#   * none of: comments, <script>/<style> (could contain "<a " as text),
#     CDATA/processing blocks;
#   * every "<a"/"<base" tag matches the strict shape: attrs are
#     whitespace-separated name="double-quoted-value" pairs with no
#     <, > or " inside values (count(any) == count(strict));
#   * no anchor repeats an attribute (HTMLParser keeps the LAST duplicate;
#     the fast extract takes the first — so duplicates disqualify the page).
# Everything else falls back to the HTMLParser path, row by row. Parity with
# parse_html on both synthetic-web output and adversarial fixtures is pinned
# in tests/test_resume_extract.py.
# ---------------------------------------------------------------------------

import html as _htmlmod
import re as _re

import numpy as np

_BAD_CONSTRUCT_RE = _re.compile(r"(?is)<!--|<script|<style|<!\[|<\?")
# a '<' inside a quoted attribute value (e.g. <div title="<a href=...">)
# means an <a the regex would extract may really be attribute TEXT of
# another tag — such pages are demoted to the HTMLParser path (ADVICE r2).
# May over-match in plain text ('=' then a quote then '<'), which only
# costs a fallback, never a divergence.
_QUOTED_LT_RE = _re.compile(r"(?s)=\s*\"[^\"]*<|=\s*'[^']*<")
_ANCHOR_ANY_RE = _re.compile(r"(?is)<a(?=[\s>/])")
_ANCHOR_STRICT_RE = _re.compile(
    r"(?is)<a((?:\s+[a-z_][\w-]*(?:\s*=\s*\"[^\"<>]*\")?)*)\s*/?>")
_BASE_ANY_RE = _re.compile(r"(?is)<base(?=[\s>/])")
_BASE_STRICT_RE = _re.compile(
    r"(?is)<base((?:\s+[a-z_][\w-]*(?:\s*=\s*\"[^\"<>]*\")?)*)\s*/?>")
# (?<![\w-]) not \b: \b matches between '-' and 'h', so data-href= /
# data-rel= would be misread as href=/rel= (ADVICE r2); HTMLParser treats
# data-* as distinct attributes, and so must the fast path.
_HREF_RE = _re.compile(r"(?is)(?<![\w-])href\s*=\s*\"([^\"]*)\"")
_REL_RE = _re.compile(r"(?is)(?<![\w-])rel\s*=\s*\"([^\"]*)\"")
# entity / charref anywhere in a value → decode (cheap per-value fallback)
_ENTITY_RE = _re.compile(r"&[#a-zA-Z]")


def _unescape_series(s: pd.Series) -> pd.Series:
    """Decode HTML entities in attribute values, vectorized for the common
    case (no '&' at all); rows containing any entity-ish '&' go through
    html.unescape — exactly what HTMLParser(convert_charrefs=True) does."""
    has = s.str.contains(_ENTITY_RE, na=False)
    if has.any():
        s = s.copy()
        s[has] = [_htmlmod.unescape(v) for v in s[has]]
    return s


def extract_links_fast(html: pd.Series):
    """(base_href Series, links DataFrame[page, href, rel, pos]) for the
    pages of ``html`` — fast-path extraction with per-row HTMLParser
    fallback; elementwise identical to ``parse_html`` on the
    (base_href, links[href, rel, pos]) projection."""
    idx = html.index
    s = html.astype("object")
    notna = s.notna()
    simple = (notna & ~s.str.contains(_BAD_CONSTRUCT_RE, na=False)
              & ~s.str.contains(_QUOTED_LT_RE, na=False))
    n_any = s.str.count(_ANCHOR_ANY_RE).where(notna, 0).astype(int)
    n_strict = s.str.count(_ANCHOR_STRICT_RE).where(notna, 0).astype(int)
    b_any = s.str.count(_BASE_ANY_RE).where(notna, 0).astype(int)
    b_strict = s.str.count(_BASE_STRICT_RE).where(notna, 0).astype(int)
    fast = simple & (n_any == n_strict) & (b_any == b_strict)

    base_href = pd.Series([None] * len(s), index=idx, dtype="object")
    parts = []

    fs = s[fast]
    if len(fs):
        # anchors: (page, match) MultiIndex of strict attr strings
        m = fs.str.extractall(_ANCHOR_STRICT_RE)
        if len(m):
            attrs = m[0]
            # an attr string with a duplicated href/rel diverges from
            # HTMLParser's last-wins dict — demote those PAGES to fallback
            dup = (attrs.str.count(_HREF_RE) > 1) | \
                  (attrs.str.count(_REL_RE) > 1)
            if dup.any():
                bad_pages = set(attrs.index[dup].get_level_values(0))
                fast = fast.copy()
                fast[list(bad_pages)] = False
                attrs = attrs[~attrs.index.get_level_values(0).isin(
                    bad_pages)]
            href = attrs.str.extract(_HREF_RE, expand=False)
            keep = href.notna()
            if keep.any():
                href = _unescape_series(href[keep])
                rel = _unescape_series(
                    attrs[keep].str.extract(_REL_RE, expand=False)
                    .fillna(""))
                page = href.index.get_level_values(0)
                pos = pd.Series(np.arange(len(href)), index=href.index)
                pos -= pos.groupby(page).transform("min")
                parts.append(pd.DataFrame({
                    "page": page, "href": href.values, "rel": rel.values,
                    "pos": pos.values.astype("int32")}))
        # base href: first <base> with an href (parse_html keeps the first)
        for i in idx[fast & (b_any > 0)]:
            for bm in _BASE_STRICT_RE.finditer(s[i]):
                hm = _HREF_RE.search(bm.group(1))
                if hm:
                    v = hm.group(1)
                    base_href[i] = (_htmlmod.unescape(v)
                                    if _ENTITY_RE.search(v) else v)
                    break

    slow_idx = idx[notna & ~fast]
    for i in slow_idx:
        r = parse_html(s[i])
        if r is None:
            continue
        base_href[i] = r["base_href"]
        if r["links"]:
            parts.append(pd.DataFrame({
                "page": [i] * len(r["links"]),
                "href": [lk["href"] for lk in r["links"]],
                "rel": [lk["rel"] for lk in r["links"]],
                "pos": np.array([lk["pos"] for lk in r["links"]],
                                dtype="int32")}))

    links = (pd.concat(parts, ignore_index=True) if parts else
             pd.DataFrame({"page": pd.Series([], dtype="object"),
                           "href": pd.Series([], dtype="object"),
                           "rel": pd.Series([], dtype="object"),
                           "pos": pd.Series([], dtype="int32")}))
    return base_href, links


# ---------------------------------------------------------------------------
# User-supplied CSS-selector extraction (SURVEY.md S4 generality; VERDICT r3
# item 2) — the reference lets users register ARBITRARY selectors
# (OnHTML("p.description"), roddy.go:497-531) and read the matched element's
# text/attributes (ChildText/ChildAttr, element.go:77-88). The fixed
# PARSED_SCHEMA covers the reference's own tests; this slot covers every
# other selector a migrating colly/roddy user brings, without writing UDFs.
#
# Selector grammar (the subset those APIs actually exercise, extended with
# the goquery forms most common in real colly migrations — VERDICT r4
# item 7): comma groups, descendant (space), child (>), adjacent-sibling
# (+) and general-sibling (~) combinators, compounds of
#   tag  .class  #id  [attr]  [attr=v] [attr^=v] [attr$=v] [attr*=v]
#   [attr~=v] [attr|=v]  (v bare or quoted; quoted values may contain
#   space/','/'>')  :first-child  :nth-child(n)  :first-of-type
#   :nth-of-type(n)  :not(compound)
# Start tags apply the HTML5 implied-end-tag rules (optional end tags:
# p/li/dt/dd/tr/td/th/option/...), matching net/html's tree for the
# real-world HTML that omits them (ADVICE r4).
# Matching walks the open-element stack during the SAME single HTMLParser
# pass as everything else — cost is O(open-captures) per character, not a
# re-parse per selector. Rows come back in document order of the matched
# element's start tag, with text = trimmed concatenation of all character
# data inside the element (goquery .Text() + TrimSpace — element.go:77-79).
# ---------------------------------------------------------------------------

_SEL_PART_RE = _re.compile(
    r"([a-zA-Z][\w-]*)"            # tag
    r"|\.([\w-]+)"                 # .class
    r"|#([\w-]+)"                  # #id
    r"|\[([\w-]+)(?:([~^$*|]?=)(?:\"([^\"]*)\"|'([^']*)'|([^\]\"']*)))?\]"
    # [attr], [attr=v], and the goquery-common substring forms
    # [attr^=v] [attr$=v] [attr*=v] [attr~=v] [attr|=v] (VERDICT r4 item 7)
    r"|:([\w-]+)(?:\(((?:[^()]|\([^()]*\))*)\))?")
    # :first-child / :nth-of-type(n) / :not(compound) — the argument class
    # admits ONE nesting level of parens so :not(:nth-child(2)) parses
    # (a compound argument cannot itself contain :not, so one level is
    # the grammar's full depth)

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr"
    .split())

# HTML5 implied-end-tag rules (ADVICE r4): real-world HTML omits optional
# end tags ('<p>one<p>two', '<ul><li>a<li>b'), and net/html — what goquery
# and therefore the reference's selectors see — auto-closes the open
# sibling before pushing the new start tag. Without this the selector
# stack nests siblings as children and ChildText / child-combinator
# results diverge. Each entry: incoming start tag → (tags it implicitly
# closes, scope-boundary tags that stop the downward scan).
_IMPLIED_SIBLINGS = {
    "li": (frozenset({"li"}), frozenset({"ul", "ol"})),
    "dt": (frozenset({"dt", "dd"}), frozenset({"dl"})),
    "dd": (frozenset({"dt", "dd"}), frozenset({"dl"})),
    "tr": (frozenset({"tr", "td", "th"}), frozenset({"table"})),
    "td": (frozenset({"td", "th"}), frozenset({"table", "tr"})),
    "th": (frozenset({"td", "th"}), frozenset({"table", "tr"})),
    "option": (frozenset({"option"}), frozenset({"select", "datalist"})),
    "optgroup": (frozenset({"option", "optgroup"}), frozenset({"select"})),
    "tbody": (frozenset({"tr", "td", "th", "thead", "tbody"}),
              frozenset({"table"})),
    "tfoot": (frozenset({"tr", "td", "th", "thead", "tbody"}),
              frozenset({"table"})),
    "colgroup": (frozenset({"colgroup"}), frozenset({"table"})),
}
# start tags that act as </p> when a p is open in button scope
# (WHATWG 13.2.6.4.7 "in body"; li/dd/dt close p too)
_P_CLOSERS = frozenset(
    "address article aside blockquote center details dialog dir div dl "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header "
    "hgroup hr main menu nav ol p pre section summary table ul li dd dt"
    .split())
_P_SCOPE_BOUNDARY = frozenset(
    {"table", "td", "th", "caption", "select", "button"})


# pseudo-classes decidable at the element's START tag in one pass
# (:last-child / :last-of-type need the parent's END — unsupported, loud)
_PSEUDOS = frozenset({"first-child", "nth-child",
                      "first-of-type", "nth-of-type", "not"})


def _compile_compound(s: str):
    """'span.price[data-x^=1]:nth-of-type(2)' →
    (tag, classes, id, [(attr, op, val)...], [(pseudo, n)...])"""
    tag, classes, id_, preds, pseudos = None, [], None, [], []
    pos = 0
    while pos < len(s):
        m = _SEL_PART_RE.match(s, pos)
        if not m:
            raise ValueError(f"unsupported selector syntax at {s[pos:]!r}")
        t, cls, i, attr, op, v1, v2, v3, ps, psn = m.groups()
        if t:
            if pos != 0:
                raise ValueError(f"tag must lead the compound: {s!r}")
            tag = t.lower()
        elif cls:
            classes.append(cls)
        elif i:
            id_ = i
        elif attr:
            val = v1 if v1 is not None else v2 if v2 is not None else v3
            preds.append((attr.lower(), op, val if op else None))
        else:
            if ps not in _PSEUDOS:
                raise ValueError(
                    f"unsupported pseudo-class :{ps} (supported: "
                    f"{', '.join(sorted(_PSEUDOS))})")
            if ps == "not":
                if not psn or not psn.strip():
                    raise ValueError(
                        f":not() needs a compound argument: {s!r}")
                # one COMPOUND (cascadia's common form); combinators
                # inside :not() are not supported and fail loudly here
                inner = _compile_compound(psn.strip())
                if any(ips == "not" for ips, _ in inner[4]):
                    # CSS3: the negation argument is a simple selector,
                    # never another negation
                    raise ValueError(f"nested :not() is invalid: {s!r}")
                pseudos.append(("not", inner))
            else:
                if ps.startswith("nth-") and (psn is None
                                              or not psn.isdigit()):
                    raise ValueError(f":{ps} needs an (n) argument: {s!r}")
                pseudos.append((ps, int(psn) if psn else None))
        pos = m.end()
    return tag, tuple(classes), id_, tuple(preds), tuple(pseudos)


def _split_respecting_quotes(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside single/double-quoted spans — naive
    str.split broke quoted attribute values containing the separator
    (a[title="x > y"], ADVICE r4)."""
    parts, buf, q = [], [], None
    for ch in s:
        if q:
            if ch == q:
                q = None
            buf.append(ch)
        elif ch in "\"'":
            q = ch
            buf.append(ch)
        elif ch == sep:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _tokenize_group(group: str) -> list[str]:
    """One selector group → compound / combinator ('>', '+', '~') tokens.
    Combinator characters inside quoted attribute values or inside
    []/() (e.g. ``[attr~=v]``, ``:not(.x)``) stay part of the compound;
    unspaced forms (``a+b``, ``ul>li``) split correctly."""
    toks, i, n = [], 0, len(group)
    while i < n:
        c = group[i]
        if c.isspace():
            i += 1
            continue
        if c in ">+~":
            toks.append(c)
            i += 1
            continue
        j, q, depth = i, None, 0
        while j < n:
            ch = group[j]
            if q:
                if ch == q:
                    q = None
            elif ch in "\"'":
                q = ch
            elif ch in "[(":
                depth += 1
            elif ch in "])":
                depth = max(0, depth - 1)
            elif depth == 0 and (ch.isspace() or ch in ">+~"):
                break
            j += 1
        toks.append(group[i:j])
        i = j
    return toks


_COMBINATORS = {">": "child", "+": "adj", "~": "sib"}


def compile_selector(selector: str):
    """CSS selector string → list of chains; each chain is a list of
    (combinator, compound) with combinator ∈ {'desc', 'child', 'adj',
    'sib'} naming how the compound relates to the one BEFORE it (the
    first's is ignored)."""
    chains = []
    for group in _split_respecting_quotes(selector, ","):
        group = group.strip()
        if not group:
            raise ValueError(f"empty selector group in {selector!r}")
        chain, comb = [], "desc"
        for tok in _tokenize_group(group):
            if tok in _COMBINATORS:
                if comb != "desc" or not chain:
                    raise ValueError(f"dangling {tok!r} in {selector!r}")
                comb = _COMBINATORS[tok]
                continue
            chain.append((comb, _compile_compound(tok)))
            comb = "desc"
        if comb != "desc" or not chain:
            raise ValueError(f"dangling combinator in {selector!r}")
        chains.append(chain)
    return chains


def _attr_op_matches(op: str, have: str, want: str) -> bool:
    if op == "=":
        return have == want
    if op == "^=":
        return bool(want) and have.startswith(want)
    if op == "$=":
        return bool(want) and have.endswith(want)
    if op == "*=":
        return bool(want) and want in have
    if op == "~=":
        return want in have.split()
    if op == "|=":
        return have == want or have.startswith(want + "-")
    raise ValueError(f"unsupported attribute operator {op!r}")


def _compound_matches(comp, el) -> bool:
    """``el`` is a stack frame: (tag, attrs, child_idx, type_idx, _)."""
    tag, attrs, child_idx, type_idx = el[0], el[1], el[2], el[3]
    ctag, classes, id_, preds, pseudos = comp
    if ctag is not None and tag != ctag:
        return False
    if id_ is not None and attrs.get("id") != id_:
        return False
    if classes:
        have = (attrs.get("class") or "").split()
        if any(c not in have for c in classes):
            return False
    for name, op, val in preds:
        if name not in attrs:
            return False
        if op and not _attr_op_matches(op, attrs.get(name) or "", val):
            return False
    for ps, n in pseudos:
        if ps == "first-child" and child_idx != 1:
            return False
        if ps == "nth-child" and child_idx != n:
            return False
        if ps == "first-of-type" and type_idx != 1:
            return False
        if ps == "nth-of-type" and type_idx != n:
            return False
        if ps == "not" and _compound_matches(n, el):
            return False
    return True


def _chain_matches(chain, stack, root_counters) -> bool:
    """Right-to-left match of ``chain`` against the open-element ``stack``
    (innermost last); the rightmost compound must match the top element.

    Sibling combinators ('adj' = ``+``, 'sib' = ``~``) match against the
    parent frame's recorded closed-sibling summaries (4-tuples of
    (tag, attrs, child_idx, type_idx) appended at each child's start tag)
    — preceding siblings of an open element are always fully recorded by
    the time it starts, so the one-pass property is preserved. A sibling
    shares the open element's ancestor chain, so the rest of the chain
    continues from the same stack position."""
    def sibs(si: int):
        counters = stack[si - 1][4] if si > 0 else root_counters
        return counters.get("__sibs", ())

    def rec(ci: int, si: int, el) -> bool:
        if not _compound_matches(chain[ci][1], el):
            return False
        if ci == 0:
            return True
        comb = chain[ci][0]
        if comb == "child":
            return si > 0 and rec(ci - 1, si - 1, stack[si - 1])
        if comb == "adj":
            want = el[2] - 1
            return any(rec(ci - 1, si, s) for s in sibs(si)
                       if s[2] == want)
        if comb == "sib":
            return any(rec(ci - 1, si, s) for s in sibs(si)
                       if s[2] < el[2])
        return any(rec(ci - 1, sj, stack[sj])
                   for sj in range(si - 1, -1, -1))
    return rec(len(chain) - 1, len(stack) - 1, stack[-1])


class _SelectorExtractor(HTMLParser):
    """One-pass multi-selector element capture over the open-element stack.

    Stack frames are (tag, attrs, child_idx, type_idx, child_counters):
    child_idx = 1-based index among the parent's element children (for
    :first-child / :nth-child), type_idx = index among same-tag siblings
    (:nth-of-type); child_counters accumulates those for the frame's own
    children. Start tags first apply the HTML5 implied-end-tag rules
    (ADVICE r4) so '<ul><li>a<li>b' yields SIBLING li elements exactly as
    net/html/goquery — the reference's selector substrate — builds them."""

    def __init__(self, compiled: list) -> None:
        super().__init__(convert_charrefs=True)
        self.compiled = compiled          # [(selector_string, chains)]
        self.stack: list = []
        self.open: list = []              # captures awaiting their end tag
        self.rows: list = []
        self._pos = [0] * len(compiled)   # per-selector document-order rank
        self._root_counters: dict = {}
        # sibling summaries cost one tuple per element; record them only
        # when some chain actually uses a sibling combinator
        self._need_sibs = any(
            comb in ("adj", "sib")
            for _sel, chains in compiled
            for chain in chains for comb, _c in chain)

    def _push(self, tag: str, attrs: dict) -> None:
        counters = self.stack[-1][4] if self.stack else self._root_counters
        counters["__n"] = child_idx = counters.get("__n", 0) + 1
        counters[tag] = type_idx = counters.get(tag, 0) + 1
        if self._need_sibs:
            counters.setdefault("__sibs", []).append(
                (tag, attrs, child_idx, type_idx))
        self.stack.append((tag, attrs, child_idx, type_idx, {}))

    def _pop_to(self, si: int) -> None:
        """Close every frame above (and including) index ``si``, finishing
        captures opened at each popped depth."""
        while len(self.stack) > si:
            depth = len(self.stack)  # captures store post-push size
            for ci in range(len(self.open) - 1, -1, -1):
                if self.open[ci]["depth"] == depth:
                    self._finish(self.open.pop(ci))
            self.stack.pop()

    def _implied_end(self, tag: str) -> None:
        rule = _IMPLIED_SIBLINGS.get(tag)
        if rule:
            # Re-run the scan after each pop (ADVICE r5): a <tr> arriving
            # over [table, tr, td] must close BOTH the td and the tr —
            # popping only the topmost closee nests the new row inside the
            # old one, diverging from net/html on end-tag-omitting tables.
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

    def _try_open(self, tag: str, attrs: dict, void: bool) -> None:
        for k, (sel, chains) in enumerate(self.compiled):
            if any(_chain_matches(ch, self.stack, self._root_counters)
                   for ch in chains):
                cap = {"selector": sel, "pos": self._pos[k], "tag": tag,
                       "parts": [], "attrs": dict(attrs),
                       "depth": len(self.stack)}
                self._pos[k] += 1
                if void:
                    self._finish(cap)
                else:
                    self.open.append(cap)

    def _finish(self, cap: dict) -> None:
        self.rows.append({
            "selector": cap["selector"], "pos": cap["pos"],
            "tag": cap["tag"], "text": "".join(cap["parts"]).strip(),
            "attrs": cap["attrs"]})

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        self._implied_end(tag)
        if tag in _VOID_TAGS:
            self._push(tag, a)
            self._try_open(tag, a, void=True)
            self.stack.pop()
            return
        self._push(tag, a)
        self._try_open(tag, a, void=False)

    def handle_startendtag(self, tag, attrs):  # <x/> never nests
        a = dict(attrs)
        self._implied_end(tag)
        self._push(tag, a)
        self._try_open(tag, a, void=True)
        self.stack.pop()

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        # lenient recovery: close down to the nearest matching open tag
        for si in range(len(self.stack) - 1, -1, -1):
            if self.stack[si][0] == tag:
                self._pop_to(si)
                break

    def handle_data(self, data):
        for cap in self.open:
            cap["parts"].append(data)

    def close(self):
        super().close()
        while self.open:                  # unclosed elements at EOF
            self._finish(self.open.pop())


SELECTED_SCHEMA = ArrayType(StructType([
    StructField("selector", StringType()),
    StructField("pos", IntegerType()),
    StructField("tag", StringType()),
    StructField("text", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
]))


def select_html(html: str | None, compiled: list) -> list[dict]:
    if not html:
        return []
    p = _SelectorExtractor(compiled)
    try:
        p.feed(html)
        p.close()
    except RecursionError:
        # the one genuinely DATA-dependent blowup (absurd nesting depth in a
        # pathological page) — skip the page. Engine bugs raise loudly: a
        # blanket except here made a selector-engine defect indistinguishable
        # from "no matches" (ADVICE r4), against the fail-loudly policy.
        return []
    return sorted(p.rows, key=lambda r: (r["selector"], r["pos"]))


def select_css(df, selectors, html_col: str = "body_html",
               keep: tuple = ("url_norm", "depth", "seq")):
    """One row per (page, selector, matched element): the engine's slot for
    the reference's user-registered OnHTML(selector) callbacks. ``text`` is
    the element's trimmed inner text (ChildText); ``attrs`` carries every
    attribute of the matched element (ChildAttr reads one key from it).

    Selectors are compiled ONCE driver-side and shipped in the UDF closure;
    matching rides the Arrow-batched parse pass — page bodies cross into
    Python once and are never shuffled, exactly like ``expand``."""
    compiled = [(s, compile_selector(s)) for s in selectors]

    @F.pandas_udf(SELECTED_SCHEMA)
    def sel_udf(html: pd.Series) -> pd.Series:
        return pd.Series([select_html(h, compiled) for h in html])

    keep = [c for c in keep if c in df.columns]
    return (df.withColumn("__el", F.explode(sel_udf(F.col(html_col))))
            .select(*keep, "__el.selector", "__el.pos", "__el.tag",
                    "__el.text", "__el.attrs"))
