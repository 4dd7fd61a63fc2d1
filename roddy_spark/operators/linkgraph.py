"""Link-graph analytics for crawl prioritization: PageRank over the
host/page graph. Production web pipelines rank hosts by centrality to
allocate crawl budget (CommonCrawl publishes exactly this ranking); the
crawler's frontier priority can then seed from it. No counterpart in the
reference crawler — pipeline-brief scope — but DuckDB-oracled (contract
entry ``pagerank`` with the iteration unrolled in portable SQL).

Determinism contract: all arithmetic is INTEGER-QUANTIZED. Ranks live as
``rank_q`` = rank × 10^12 in BIGINT; per-edge contributions use integer
division (``div``), damping is ``(x * dp) div 100``, and the teleport
term is ``(Q * (100-dp)) div (100 * N)``. Integer sums are exact and
order-free, so the result is bit-identical at any parallelism, on any
engine — float PageRank can differ in the last ulp per reduction order,
which would break hash-compared oracles.

Scale shape: out-degrees are joined to the edge list ONCE and the result
persisted, so each iteration is one equi-join (ranks × edges on src, both
sides pre-partitionable on the join key) plus one partial-aggregated
``groupBy(dst)`` — hub pages collapse map-side, skew-safe. The dangling
mass is a one-row aggregate cross-joined back (no driver round-trip). At
web scale each iteration's ranks should be checkpointed (the disk-backed
round-state pattern of plans/dfs.py); at contract scale persist()
suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1_000_000_000_000  # rank quantization: rank_q = rank * Q


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, damping_pct: int = 85) -> DataFrame:
    """Integer-quantized PageRank over distinct directed edges.

    Returns (node, rank_q, rank): ``rank_q`` BIGINT (exact, the oracle
    compares this), ``rank`` = round(rank_q / 10^12, 6) for reading.
    Dangling nodes (no out-edges) spread their mass uniformly. Ranks sum
    to ~1 (integer division sheds < N*(iterations+1) quanta of 10^-12)."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n_nodes = nodes.count()  # one small job; also materializes the persist
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # degree rides every iteration's join — attach it to the edges once
    ed = e.join(deg, "src").persist()
    ed.count()

    dp = damping_pct
    base_q = (Q * (100 - dp)) // (100 * n_nodes)
    ranks = nodes.withColumn("rank_q", F.lit(Q // n_nodes).cast("long"))
    for _ in range(iterations):
        ranks = ranks.persist()
        contribs = (ed.join(ranks, ed.src == ranks.node)
                    .select(F.col("dst").alias("node"),
                            F.expr("rank_q div out_deg").alias("c"))
                    .groupBy("node").agg(F.sum("c").alias("c_sum")))
        dangling = (ranks.join(deg, ranks.node == deg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank_q"), F.lit(0))
                         .alias("d_sum")))
        ranks = (nodes.join(contribs, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit(base_q) + F.expr(
                             f"({dp} * (coalesce(c_sum, 0) "
                             f"+ (d_sum div {n_nodes}))) div 100"))
                         .cast("long").alias("rank_q")))
    return ranks.select(
        "node", "rank_q",
        F.round(F.col("rank_q") / F.lit(float(Q)), 6).alias("rank"))
