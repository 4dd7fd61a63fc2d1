"""PageRank (operators/linkgraph.py): integer-quantized recurrence vs a
sequential pure-Python reference, plus structural invariants."""

from __future__ import annotations

import random

import pytest

from roddy_spark.operators.linkgraph import Q, pagerank


def _ref_pagerank(edges, iterations=5, dp=85):
    """Sequential twin of the quantized recurrence."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (Q * (100 - dp)) // (100 * n)
    rank = {v: Q // n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // deg[s]
        dangling = sum(rank[v] for v in nodes if v not in deg)
        rank = {v: base + (dp * (contrib[v] + dangling // n)) // 100
                for v in nodes}
    return rank


def test_pagerank_matches_python_reference(spark):
    rng = random.Random(1357)
    edges = list({(rng.randint(0, 40), rng.randint(0, 50))
                  for _ in range(300)})
    expect = _ref_pagerank(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_q"] for r in pagerank(df).collect()}
    assert got == expect


def test_pagerank_star_graph_and_mass(spark):
    # hub <- many leaves; leaves are dangling
    edges = [(i, 99) for i in range(1, 20)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = pagerank(df, iterations=5).collect()
    by = {r["node"]: r for r in rows}
    # the hub out-ranks every leaf, leaves are symmetric
    assert all(by[99]["rank_q"] > by[i]["rank_q"] for i in range(1, 20))
    leaf_ranks = {by[i]["rank_q"] for i in range(1, 20)}
    assert len(leaf_ranks) == 1
    # integer division sheds < N*(iters+1) quanta; mass stays ~1.0
    total = sum(r["rank_q"] for r in rows)
    assert Q - 20 * 6 * 100 <= total <= Q
    # readable rank column mirrors rank_q
    assert by[99]["rank"] == pytest.approx(by[99]["rank_q"] / Q, abs=1e-6)


def test_pagerank_deterministic_across_partitioning(spark):
    rng = random.Random(8)
    edges = list({(rng.randint(0, 30), rng.randint(0, 30))
                  for _ in range(150)})
    df1 = spark.createDataFrame(edges, ["src", "dst"]).repartition(1)
    df2 = spark.createDataFrame(edges, ["src", "dst"]).repartition(16)
    r1 = {r["node"]: r["rank_q"] for r in pagerank(df1, iterations=4).collect()}
    r2 = {r["node"]: r["rank_q"] for r in pagerank(df2, iterations=4).collect()}
    assert r1 == r2
