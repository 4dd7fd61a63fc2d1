"""User-registered CSS-selector extraction (SURVEY.md S4 generality;
reference OnHTML(selector) roddy.go:497-531, ChildText/ChildAttr
element.go:77-88): the migration slot for arbitrary colly/roddy selector
callbacks the fixed PARSED_SCHEMA doesn't cover."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roddy_spark.config import CrawlConfig
from roddy_spark.extract import compile_selector, parse_html, select_html
from roddy_spark.plans.crawl import Crawler

_DOC = """<html><head><title>Shop</title></head><body>
<div class="card"><span class="price" data-sku="a1">19.99</span></div>
<div class="card"><span class="price" data-sku="b2"> 5.00 </span></div>
<span class="price">stray</span>
<p class="description">First paragraph</p>
<p class="description">Second <b>bold</b> paragraph</p>
<p>plain</p>
<div id="nav"><a href="/x">go <i>now</i></a><img src="/i.png" alt="pic"></div>
</body></html>"""


def _rows(selector, html=_DOC):
    return select_html(html, [(selector, compile_selector(selector))])


# -- selector engine unit semantics ------------------------------------------

def test_child_combinator_excludes_non_children():
    got = _rows("div.card > span.price")
    assert [(r["pos"], r["text"], r["attrs"]["data-sku"]) for r in got] == [
        (0, "19.99", "a1"), (1, "5.00", "b2")]


def test_descendant_id_attr_and_void_elements():
    assert [r["text"] for r in _rows("#nav a")] == ["go now"]
    assert [r["attrs"]["alt"] for r in _rows("img[alt]")] == ["pic"]
    assert [r["attrs"]["data-sku"] for r in _rows('span[data-sku="b2"]')] \
        == ["b2"]
    assert _rows('span[data-sku="zz"]') == []


def test_comma_group_and_bare_tag():
    got = _rows("title, p.description")
    assert len(got) == 3  # 1 title + 2 descriptions
    assert sorted(r["tag"] for r in got) == ["p", "p", "title"]


def test_text_is_trimmed_nested_text():
    # ChildText semantics (element.go:77-79): goquery .Text() + TrimSpace —
    # nested element text folds in, surrounding whitespace stripped
    got = _rows("p.description")
    assert [r["text"] for r in got] == ["First paragraph",
                                       "Second bold paragraph"]


def test_p_description_parity_with_fixed_schema():
    """The generic selector path must agree with the hardwired
    descriptions extraction (roddy_test.go:140-168 selector: count=2)."""
    fixed = parse_html(_DOC)["descriptions"]
    generic = [r["text"] for r in _rows("p.description")]
    assert len(generic) == len(fixed) == 2
    assert generic == [d.strip() for d in fixed]


def test_unsupported_selector_raises():
    for bad in ("p:last-child", "", "div >", "a + > b", "~ b",
                "p:nth-of-type", "p:not()", "p:not(a b)"):
        with pytest.raises(ValueError):
            compile_selector(bad)


# -- engine slot: one Arrow pass, exploded element rows ----------------------

def test_crawler_selected_table(spark, tmp_path):
    """A crawl registered with a custom selector the fixed schema has no
    column for (span.price with data-sku) lands one durable row per matched
    element, keyed like every other per-batch table."""
    pages = spark.createDataFrame(
        [("http://h0.test/", 200, "text/html",
          _DOC + '<a href="/next">n</a>'),
         ("http://h0.test/next", 200, "text/html",
          '<div class="card"><span class="price" data-sku="c3">7</span>'
          "</div>")],
        "url string, status int, content_type string, body_html string")
    st = Crawler(spark, CrawlConfig(max_depth=2), pages,
                 str(tmp_path / "sel"),
                 selectors=["div.card > span.price", "p.description"]
                 ).run(["http://h0.test/"])
    sel = st.selected(spark)
    got = sorted((r["selector"], r["url_norm"], r["pos"], r["text"],
                  (r["attrs"] or {}).get("data-sku"))
                 for r in sel.collect())
    assert got == [
        ("div.card > span.price", "http://h0.test/", 0, "19.99", "a1"),
        ("div.card > span.price", "http://h0.test/", 1, "5.00", "b2"),
        ("div.card > span.price", "http://h0.test/next", 0, "7", "c3"),
        ("p.description", "http://h0.test/", 0, "First paragraph", None),
        ("p.description", "http://h0.test/", 1, "Second bold paragraph",
         None),
    ]
    # rows carry the crawl keys (joinable back to visited/fetches)
    assert {"url_norm", "depth", "seq", "batch"} <= set(sel.columns)


# -- round-5 grammar extensions + HTML5 implied end tags ---------------------

def test_implied_end_tags_siblings_not_nested():
    """net/html auto-closes optional end tags (ADVICE r4): '<ul><li>a<li>b'
    must yield sibling li elements, not nested ones."""
    assert [r["text"] for r in _rows("li", "<ul><li>a<li>b<li>c</ul>")] == \
        ["a", "b", "c"]
    assert [r["text"] for r in _rows("ul > li",
                                     "<ul><li>a<li>b</ul>")] == ["a", "b"]
    assert [r["text"] for r in _rows("p", "<p>one<p>two")] == ["one", "two"]
    # block start tag closes an open p (button-scope rule)
    assert [r["text"] for r in _rows("p", "<div><p>x<div>y</div></div>")] \
        == ["x"]
    # table rows/cells
    got = _rows("tr > td", "<table><tr><td>1<td>2<tr><td>3</table>")
    assert [r["text"] for r in got] == ["1", "2", "3"]
    # dl / select
    assert [r["text"] for r in _rows("dt", "<dl><dt>a<dd>x<dt>b</dl>")] == \
        ["a", "b"]
    assert [r["text"] for r in
            _rows("option", "<select><option>a<option>b</select>")] == \
        ["a", "b"]
    # nested list stays INSIDE the li (ul does not imply </li>)
    assert [r["text"] for r in
            _rows("li > i", "<ul><li>a<ul><li><i>n</i></ul></ul>")] == ["n"]


def test_implied_end_cascades_through_open_cells():
    """ADVICE r5: a <tr> arriving over an open td must close BOTH the cell
    and the row — popping only the topmost closee nests the new row inside
    the old one, leaking row text across siblings and corrupting
    child-combinator / nth-* results on end-tag-omitting tables."""
    doc = "<table><tr><td>1<td>2<tr><td>3</table>"
    assert [r["text"] for r in _rows("tr", doc)] == ["12", "3"]
    assert _rows("tr > tr", doc) == []
    assert [r["text"] for r in _rows("tr:nth-of-type(2)", doc)] == ["3"]
    # tbody after an open tr/td closes the whole section, not just the cell
    doc2 = "<table><tbody><tr><td>a<tbody><tr><td>b</table>"
    assert [r["text"] for r in _rows("tbody", doc2)] == ["a", "b"]
    assert _rows("tbody tbody", doc2) == []
    # optgroup after an open option inside an optgroup closes both
    doc3 = ("<select><optgroup label=g1><option>x"
            "<optgroup label=g2><option>y</select>")
    assert [r["text"] for r in _rows("optgroup", doc3)] == ["x", "y"]
    assert _rows("optgroup optgroup", doc3) == []


def test_parse_html_descriptions_implied_close():
    # '<p class=description>one<p>two' — the second p closes the first, so
    # 'two' must NOT leak into the description (same bug class, fixed in
    # _Extractor too)
    r = parse_html('<p class="description">one<p>two</p>')
    assert r["descriptions"] == ["one"]


def test_pseudo_classes():
    doc = "<div><span>s</span><p>p1</p><p>p2</p><p>p3</p></div>"
    assert [r["text"] for r in _rows("p:first-of-type", doc)] == ["p1"]
    assert [r["text"] for r in _rows("p:nth-of-type(2)", doc)] == ["p2"]
    assert [r["text"] for r in _rows("p:nth-child(3)", doc)] == ["p2"]
    assert [r["text"] for r in _rows("span:first-child", doc)] == ["s"]
    assert [r["text"] for r in _rows("p:first-child", doc)] == []


def test_attr_substring_ops():
    doc = ('<a href="https://x.test/a.jpg" lang="en-US" class="big red">1'
           '</a><a href="http://y.test/b.png">2</a>')
    assert [r["text"] for r in _rows('a[href^="https"]', doc)] == ["1"]
    assert [r["text"] for r in _rows('a[href$=".png"]', doc)] == ["2"]
    assert [r["text"] for r in _rows('a[href*="y.test"]', doc)] == ["2"]
    assert [r["text"] for r in _rows('a[class~="red"]', doc)] == ["1"]
    assert [r["text"] for r in _rows('a[lang|="en"]', doc)] == ["1"]
    # CSS: empty value never matches for substring ops
    assert _rows('a[href^=""]', doc) == []


def test_quoted_attr_values_with_separators():
    """Quoted values containing space / ',' / '>' parse and match
    (ADVICE r4: the old split()-based lexer raised ValueError)."""
    doc = ('<a title="x > y">q</a><a title="a,b c">r</a><i>u</i>')
    assert [r["text"] for r in _rows('a[title="x > y"]', doc)] == ["q"]
    assert [r["text"] for r in _rows('a[title="a,b c"]', doc)] == ["r"]
    got = _rows('i, a[title="a,b c"]', doc)
    assert sorted(r["text"] for r in got) == ["r", "u"]


def test_selector_engine_bugs_raise_loudly():
    """select_html no longer swallows engine defects behind a blanket
    except (ADVICE r4): a malformed compiled structure must raise, not
    return zero rows."""
    with pytest.raises(Exception):
        select_html("<p>x</p>", [("p", "not-a-chain-list")])


def test_sibling_combinators():
    """goquery/cascadia `+` (adjacent) and `~` (general) sibling
    combinators, matched one-pass against recorded closed-sibling
    summaries."""
    h = ("<div><h2>t</h2><p>one</p><p>two</p><span>s</span>"
         "<p>three</p></div>")
    assert [r["text"] for r in _rows("h2 + p", h)] == ["one"]
    # 'three' follows a span, not a p — adjacency is strict
    assert [r["text"] for r in _rows("p + p", h)] == ["two"]
    assert [r["text"] for r in _rows("h2 ~ p", h)] == [
        "one", "two", "three"]
    assert [r["text"] for r in _rows("p ~ p", h)] == ["two", "three"]
    assert [r["text"] for r in _rows("h2+p", h)] == ["one"]  # unspaced


def test_sibling_scope_does_not_cross_parents():
    h = ("<div><p class=x>a</p><b>m</b><p>b</p></div>"
         "<div><p>c</p></div>")
    # 'c' lives in the next div — sibling scope is the shared parent
    assert [r["text"] for r in _rows("p.x ~ p", h)] == ["b"]
    assert [r["text"] for r in _rows(".x + b + p", h)] == ["b"]


def test_sibling_chain_continues_from_shared_ancestors():
    # the compound left of a sibling step shares the right side's
    # ancestor chain: em must sit under the div ADJACENT to h1
    h = ("<article><h1>t</h1><div><em>e</em></div></article>"
         "<div><em>f</em></div>")
    assert [r["text"] for r in _rows("h1 + div em", h)] == ["e"]
    h2 = ("<section><div><p>a</p></div>"
          "<div><span>q</span><p>b</p></div></section>")
    assert [r["text"] for r in _rows("div + div > p", h2)] == ["b"]


def test_sibling_combinator_with_implied_end_tags():
    # implied-end siblings (li closes li) are recorded like explicit ones
    h = "<ul><li>1<li>2<li>3</ul>"
    assert [r["text"] for r in _rows("li + li", h)] == ["2", "3"]
    assert [r["text"] for r in _rows("li:first-child ~ li", h)] == [
        "2", "3"]


def test_not_pseudo_class():
    h = "<ul><li class=a>1<li>2<li class=a>3</ul>"
    assert [r["text"] for r in _rows("li:not(.a)", h)] == ["2"]
    assert [r["text"] for r in _rows("li:not(:first-child)", h)] == [
        "2", "3"]
    h2 = '<p class="a b">x</p><p class="ab">y</p>'
    assert [r["text"] for r in _rows("p:not([class~=b])", h2)] == ["y"]
    # parenthesized pseudo inside :not() (one nesting level)
    assert [r["text"] for r in _rows("li:not(:nth-child(2))", h)] == [
        "1", "3"]
    with pytest.raises(ValueError):
        compile_selector("p:not(:not(.a))")  # CSS3: no nested negation
    # attr-op inside :not() parens survives tokenization ([class|=a]
    # matches the WHOLE value 'a' or an 'a-' prefix)
    h3 = '<p class="a-x">x</p><p class="ab">y</p>'
    assert [r["text"] for r in _rows('p:not([class|=a])', h3)] == ["y"]
