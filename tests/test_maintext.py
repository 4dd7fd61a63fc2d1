"""Main-content extraction (operators/maintext.py): the boilerpipe-style
word-count + link-density block classifier over a streaming HTML pass,
with net/html-compatible implied-end-tag segmentation."""

from __future__ import annotations

from roddy_spark.operators.maintext import extract_main_text, main_text_of


def test_keep_and_drop_by_word_count():
    text, n_blocks, n_kept = main_text_of(
        "<html><body><p>one two three four five</p>"
        "<p>short</p></body></html>")
    assert text == "one two three four five"
    assert (n_blocks, n_kept) == (2, 1)


def test_suppressed_containers_drop_subtrees():
    text, n_blocks, n_kept = main_text_of(
        "<body><nav><li>home page link list here</li></nav>"
        "<p>real article body with many words</p>"
        "<footer><p>copyright two thousand something inc</p></footer>"
        "<script>var x = 'not text at all here';</script></body>")
    assert text == "real article body with many words"
    assert (n_blocks, n_kept) == (1, 1)


def test_link_density_drops_linkfarm_block():
    html = ('<p><a href="/a">all of this text is linked</a></p>'
            '<p><a href="/b">tiny</a> anchor inside a mostly plain '
            "sentence of words</p>")
    text, n_blocks, n_kept = main_text_of(html)
    assert text == "tiny anchor inside a mostly plain sentence of words"
    assert (n_blocks, n_kept) == (2, 1)


def test_text_belongs_to_innermost_block():
    # div direct text is its own (short, dropped) block; the nested p is
    # kept independently
    text, n_blocks, n_kept = main_text_of(
        "<div>posted today<p>the actual five word body</p>"
        "by admin</div>")
    assert text == "the actual five word body"
    # div block collected "posted today" + "by admin"
    assert (n_blocks, n_kept) == (2, 1)


def test_implied_end_tags_segment_blocks():
    # li/p siblings without end tags split into separate blocks, as
    # net/html parses them
    text, n_blocks, n_kept = main_text_of(
        "<ul><li>alpha beta gamma delta epsilon<li>two words</ul>")
    assert text == "alpha beta gamma delta epsilon"
    assert (n_blocks, n_kept) == (2, 1)
    text2, nb2, nk2 = main_text_of(
        "<p>first paragraph has five words<p>second one also has five")
    assert text2 == ("first paragraph has five words\n"
                     "second one also has five")
    assert (nb2, nk2) == (2, 2)


def test_void_br_separates_words():
    text, _, n_kept = main_text_of("<p>one<br>two three four five</p>")
    assert text == "one two three four five"
    assert n_kept == 1


def test_whitespace_normalized_and_empty_inputs():
    text, n_blocks, n_kept = main_text_of(
        "<p>  spaced\n\tout   words over here </p>")
    assert text == "spaced out words over here"
    assert (n_blocks, n_kept) == (1, 1)
    assert main_text_of(None) == ("", 0, 0)
    assert main_text_of("") == ("", 0, 0)
    assert main_text_of("<p>   </p>") == ("", 0, 0)


def test_extract_main_text_spark(spark):
    rows = [
        ("u1", "<nav><li>menu menu menu menu menu</li></nav>"
               "<p>kept article body of five words</p>"),
        ("u2", '<p><a href="/x">entirely linked block of text</a></p>'),
        ("u3", None),
    ]
    df = spark.createDataFrame(rows, ["url_norm", "body_html"])
    got = {r["url_norm"]: r for r in
           extract_main_text(df, keep=("url_norm",)).collect()}
    assert got["u1"]["main_text"] == "kept article body of five words"
    assert (got["u1"]["n_blocks"], got["u1"]["n_kept"]) == (1, 1)
    assert got["u2"]["main_text"] == ""
    assert (got["u2"]["n_blocks"], got["u2"]["n_kept"]) == (1, 0)
    assert got["u3"]["main_text"] == ""
    assert (got["u3"]["n_blocks"], got["u3"]["n_kept"]) == (0, 0)
