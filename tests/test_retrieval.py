"""BM25 retrieval (operators/retrieval.py) vs a sequential pure-Python
reference."""

from __future__ import annotations

import math
import random

import pytest

from roddy_spark.operators.retrieval import bm25_topk


def _ref_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, _ in corpus:
        dl = len(toks[i])
        s = 0.0
        for t in terms:
            tf = toks[i].count(t)
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        scores[i] = round(s, 4)
    return scores


def test_bm25_matches_python_reference(spark):
    rng = random.Random(777)
    vocab = "red green blue cyan teal gray pink gold jade rust".split()
    corpus = [(i, " ".join(rng.choice(vocab)
                           for _ in range(rng.randint(3, 30))))
              for i in range(60)]
    terms = ["red", "jade"]
    expect = _ref_bm25(corpus, terms)
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = [(r["doc_id"], r["score"])
           for r in bm25_topk(df, terms, k=10).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gid, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), gid


def test_bm25_ranks_matching_doc_first(spark):
    df = spark.createDataFrame([
        (1, "apple pie with extra apple slices"),
        (2, "banana bread and butter"),
        (3, "apple juice"),
    ], ["doc_id", "text"])
    got = bm25_topk(df, ["apple"], k=3).collect()
    assert got[0]["doc_id"] in (1, 3)  # both contain the term
    assert got[-1]["doc_id"] == 2 and got[-1]["score"] == 0.0
    assert got[0]["score"] > 0


def test_bm25_empty_query_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(df, [])
