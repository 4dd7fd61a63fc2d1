"""Line-level cleaning operators (operators/lines.py): global line dedup
and the C4 quality rules."""

from __future__ import annotations

import pytest

from roddy_spark.operators import lines as LN


def test_dedup_lines_first_occurrence_wins(spark):
    docs = spark.createDataFrame([
        (1, "alpha beta\nfollow us\ngamma"),
        (2, "follow us\ndelta"),
        (3, "ALPHA   beta\nepsilon"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in LN.dedup_lines(docs).collect()}
    # doc 1 keeps everything (first occurrences)
    assert got[1]["text"] == "alpha beta\nfollow us\ngamma"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 3)
    # doc 2 loses the boilerplate line to doc 1
    assert got[2]["text"] == "delta"
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (2, 1)
    # doc 3's first line matches doc 1's after case/whitespace folding
    assert got[3]["text"] == "epsilon"
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (2, 1)


def test_dedup_lines_within_doc_and_empty(spark):
    docs = spark.createDataFrame([
        (1, "same line\nsame line\n\n  \nother"),
        (2, "same line"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in LN.dedup_lines(docs).collect()}
    # in-doc duplicate collapses; blank lines don't count
    assert got[1]["text"] == "same line\nother"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)
    # doc 2 loses its only line -> empty but present
    assert got[2]["text"] == ""
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (1, 0)


def test_dedup_lines_matches_python_reference(spark):
    """Seeded randomized corpus with a tiny line vocabulary (forcing heavy
    cross-doc collisions) must match a sequential first-occurrence scan."""
    import random
    rng = random.Random(8642)
    vocab = [f"line number {i} of text." for i in range(12)]
    docs = []
    for i in range(80):
        n = rng.randint(1, 6)
        docs.append((i, "\n".join(rng.choice(vocab) for _ in range(n))))

    seen: set[str] = set()
    expect: dict[int, tuple[str, int, int]] = {}
    for i, text in docs:  # doc order == (doc_id, line_no) order here
        kept = []
        lines = [l for l in text.split("\n") if l.strip()]
        for line in lines:
            norm = " ".join(line.lower().split())
            if norm not in seen:
                seen.add(norm)
                kept.append(line)
        expect[i] = ("\n".join(kept), len(lines), len(kept))

    got = {r["doc_id"]: r for r in LN.dedup_lines(
        spark.createDataFrame(docs, ["doc_id", "text"])).collect()}
    assert len(got) == 80
    for i, (text, n_lines, n_kept) in expect.items():
        r = got[i]
        assert (r["text"], r["n_lines"], r["n_kept"]) == (
            text, n_lines, n_kept), i


def test_c4_filters_line_and_doc_rules(spark):
    docs = spark.createDataFrame([
        # two good sentences + one unterminated + one short
        (1, "this first line has enough words.\nno terminal mark here at "
            "all\nclick here\nanother fine sentence right here!"),
        # kept lines but only two sentence marks -> dropped
        (2, "one good sentence sits right here.\nsecond decent sentence "
            "lives here."),
        # lorem ipsum nukes the page even with good lines
        (3, "a perfectly good sentence is here.\nmore fine text follows "
            "this one.\nthird one also reads well.\nlorem ipsum dolor "
            "sit amet."),
        # curly brace in original text nukes the page
        (4, "good sentence number one is here.\ngood sentence number two "
            "is here.\ngood sentence number three here.\nvar f = {}"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in LN.c4_quality_filters(docs).collect()}
    r1 = got[1]
    assert r1["text"] == ("this first line has enough words.\n"
                          "another fine sentence right here!")
    assert (r1["n_lines"], r1["n_kept"]) == (4, 2)
    # both kept lines end in a mark: 2 sentence marks -> below 3 -> drop
    assert r1["n_sentences"] == 2 and not r1["keep_doc"]
    assert got[2]["n_kept"] == 2 and not got[2]["keep_doc"]
    # doc 3: 4 kept lines / 4 marks but lorem ipsum -> drop
    assert got[3]["n_kept"] == 4 and got[3]["n_sentences"] == 4
    assert not got[3]["keep_doc"]
    # doc 4: brace -> drop, though line rules pass
    assert got[4]["n_kept"] == 3 and not got[4]["keep_doc"]


def test_c4_filters_keeps_clean_doc(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps high.\nsecond sentence also has "
            "words.\na third sentence closes it out."),
    ], ["doc_id", "text"])
    (r,) = LN.c4_quality_filters(docs).collect()
    assert r["n_kept"] == 3 and r["n_sentences"] == 3
    assert r["keep_doc"]


def test_c4_filters_quote_terminal_and_whitespace(spark):
    docs = spark.createDataFrame([
        (1, '  she said "we are going home."  \n'
            "trailing spaces after the mark .  "),
    ], ["doc_id", "text"])
    (r,) = LN.c4_quality_filters(docs).collect()
    # both lines end in ./" after trimming; kept text is trimmed
    assert r["text"] == ('she said "we are going home."\n'
                         "trailing spaces after the mark .")
    assert r["n_kept"] == 2
