"""Sync-DFS visit order (SURVEY.md D3, reference roddy.go:142-154 /
examples/basic) — reproduced AT SCALE as a dataflow fixpoint.

The reference's sync mode visits depth-first in document order: one page at
a time, recursing into each link before its next sibling. That control flow
is inherently sequential — but its OUTPUT is not: the DFS preorder equals
ordering every reachable URL by the lexicographically smallest root-path
(sequence of link positions) that reaches it, with the node's depth taken
from that path. That characterization is computable with iterative
DataFrame self-joins (the north rule's phrase exactly):

  pending(url, path) ─ min path per url ─ keep improvements vs best ─
  admission filters (depth = len(path), regex, domain, robots) ─ fetch ─
  extract links ─ children(path ⊕ [pos]) → next pending … until fixpoint.

A node whose best path improves re-expands, so better prefixes propagate to
descendants; paths descend lexicographically and are bounded, so the loop
terminates (tree-ish webs converge in ~max-depth iterations). Budgets and
politeness are BFS-loop concepts (they depend on arrival batches) and are
intentionally not supported here; equality with a literal recursive-DFS
oracle is pinned in tests/test_dfs.py.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from roddy_spark.config import CrawlConfig
from roddy_spark.fetch import fetch_join
from roddy_spark.functions import urls as U
# rolling on-disk round state, shared with the other fixpoints
# (operators/scratch.py) — the plan-truncation device the BFS loop gets
# from its SnapshotStore, applied to iterative self-joins
from roddy_spark.operators.scratch import _Scratch, scratch_root

_PENDING_SCHEMA = StructType([
    StructField("url_norm", StringType()),
    StructField("path", ArrayType(IntegerType())),
])


def _admissible(df: DataFrame, config: CrawlConfig,
                robots_map: dict | None) -> DataFrame:
    """The DFS-relevant admission filters (depth comes from the path)."""
    if config.max_depth:
        df = df.filter(F.size("path") <= config.max_depth)
    for pat in config.disallowed_url_filters:
        df = df.filter(~F.col("url_norm").rlike(pat))
    if config.url_filters:
        df = df.filter(reduce(lambda a, b: a | b,
                              [F.col("url_norm").rlike(p)
                               for p in config.url_filters]))
    host = U.host_of("url_norm")
    if config.disallowed_domains:
        df = df.filter(~host.isin(*config.disallowed_domains))
    if config.allowed_domains:
        df = df.filter(host.isin(*config.allowed_domains))
    if config.respect_robots and robots_map:
        from roddy_spark.robots import robots_gate_series
        bc = df.sparkSession.sparkContext.broadcast(robots_map)

        @F.pandas_udf("boolean")
        def ok(url: pd.Series, h: pd.Series) -> pd.Series:
            return robots_gate_series(h, url, bc.value)

        df = df.filter(ok(F.col("url_norm"), host))
    return df


_EDGE_SCHEMA = StructType([
    StructField("url_norm", StringType()),   # parent
    StructField("pos", IntegerType()),
    StructField("child", StringType()),
])


def _extract_edges(fetched: DataFrame) -> DataFrame:
    """fetched(url_norm, body_html, …) → edges(url_norm, pos, child):
    resolved+canonicalized outgoing links in document order."""
    import pandas as pd

    from roddy_spark.extract import extract_links_fast
    from roddy_spark.functions.urlkernel import resolve_series

    html = fetched.filter(
        F.col("success") & ((F.col("content_type") == "text/html")
                            | ((F.col("status") >= 300)
                               & (F.col("status") < 400))))
    src = html.select("url_norm", "body_html")

    def gen(batches):
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            base_href, links = extract_links_fast(pdf["body_html"])
            if not len(links):
                continue
            base = resolve_series(pdf["url_norm"], base_href)
            base = base.where(base.notna(), pdf["url_norm"])
            page = links["page"].to_numpy()
            child = resolve_series(
                base.iloc[page].reset_index(drop=True),
                links["href"].reset_index(drop=True))
            out = pd.DataFrame({
                "url_norm": pdf["url_norm"].to_numpy()[page],
                "pos": links["pos"].to_numpy().astype("int32"),
                "child": child.to_numpy(),
            })
            yield out[out["child"].notna()]

    return src.mapInPandas(gen, _EDGE_SCHEMA)




def dfs_preorder(spark: SparkSession, pages: DataFrame, seeds: list[str],
                 config: CrawlConfig, robots_map: dict | None = None,
                 fetcher=fetch_join, max_iters: int = 200,
                 stats: dict | None = None,
                 scratch_dir: str | None = None) -> DataFrame:
    """The reference's sync-DFS visit order: (url_norm, depth, seq) with
    seq = DFS preorder rank.

    The DFS visit path is the unique fixpoint of
        P(v) = min over ADMISSIBLE edges u→v of  P(u) ⊕ [pos],
        P(seed_i) ≤ [i]
    under lexicographic path order. (The UNCONSTRAINED min graph path is
    NOT correct — a path routing through an inadmissible prefix, or past
    the depth bound, is not one DFS can take; the per-extension
    ``_admissible`` filter is part of the operator.)

    Iteration is TARGETED Jacobi — the semi-naive form this operator
    admits (VERDICT r2 item 7): each round recomputes ONLY the nodes with
    an in-edge from a node whose estimate changed last round, but
    recomputes those from ALL their in-edges against the CURRENT estimate
    table. A node with no changed parent keeps its value because the
    operator reads nothing else. Plain delta-extension with
    min-accumulation would be WRONG here: lexicographic descent can
    LENGTHEN a path ((0,0,5) < (0,1) but is longer), pushing a parent's
    extensions past the depth bound — the child's old estimate (and its
    whole subtree) must then be RETRACTED, which an accumulate-only fold
    never does. Full per-node recomputation over current estimates handles
    retraction exactly like whole-table Jacobi, while per-round join input
    drops from |all paths| × |edges| to |in-edges of affected nodes| — on
    tree-like webs each node is recomputed O(1) times, so total work is
    ~|edges| instead of rounds × |edges|. Each URL is fetched once — edges
    accumulate in a cached table; rounds are bounded by the longest
    dependency chain (≲ longest admissible path).

    ``stats`` (optional dict) receives {"rounds", "delta_rows"} (changed
    URLs per round) for instrumentation/tests.

    Iteration state (paths/changed/edges/fetched_urls) rolls through an
    on-disk parquet scratch, one live version per frame (``_Scratch``) —
    bounded disk, flat executor storage memory at any round count."""
    import shutil

    root = scratch_dir or scratch_root(spark, "roddy_dfs_")
    sc = _Scratch(spark, root)
    try:
        seed_rows = [(u, [i]) for i, u in enumerate(seeds)]
        seeds_df = (spark.createDataFrame(seed_rows, ["raw_url", "path"])
                    .withColumn("url_norm", U.canonicalize("raw_url"))
                    .filter(F.col("url_norm").isNotNull())
                    .select("url_norm", F.col("path").cast("array<int>")
                            .alias("path")))
        seeds_df = sc.roll(_admissible(seeds_df, config, robots_map),
                           "seeds")
        paths = seeds_df           # current estimate P (url_norm, path)
        changed = seeds_df.select("url_norm")  # changed last round
        edges: DataFrame | None = None  # (url_norm parent, pos, child)
        fetched_urls: DataFrame | None = None
        if stats is not None:
            stats["rounds"] = 0
            stats["delta_rows"] = [changed.count()]
        for _ in range(max_iters):
            if stats is not None:
                stats["rounds"] += 1
            # fetch + extract edges for changed nodes present in the
            # estimate table and not yet fetched (each url once)
            to_fetch = changed.join(paths, "url_norm", "left_semi")
            if fetched_urls is not None:
                to_fetch = to_fetch.join(fetched_urls, "url_norm",
                                         "left_anti")
            if not to_fetch.isEmpty():
                new_edges = _extract_edges(fetcher(to_fetch, pages))
                edges = sc.roll(new_edges if edges is None else
                                edges.unionByName(new_edges), "edges")
                fetched_urls = sc.roll(
                    to_fetch if fetched_urls is None else
                    fetched_urls.unionByName(to_fetch), "fetched")
            if edges is None:
                break
            # affected = nodes with an in-edge from a changed node;
            # recompute each from ALL its in-edges over the CURRENT
            # estimates (exact operator, restricted — handles retraction)
            aff = sc.roll(edges.join(changed, "url_norm", "left_semi")
                          .select(F.col("child").alias("url_norm"))
                          .distinct(), "aff")
            in_edges = edges.join(aff.withColumnRenamed("url_norm", "child"),
                                  "child", "left_semi")
            ext = (in_edges.join(paths.select("url_norm",
                                              F.col("path").alias("ppath")),
                                 "url_norm")
                   .select(F.col("child").alias("url_norm"),
                           F.concat(F.col("ppath"),
                                    F.array(F.col("pos"))).alias("path")))
            ext = _admissible(ext, config, robots_map)
            cand = ext.unionByName(seeds_df.join(aff, "url_norm",
                                                 "left_semi"))
            new_est = sc.roll(cand.groupBy("url_norm")
                              .agg(F.min("path").alias("path")), "est")
            old_aff = paths.join(aff, "url_norm", "left_semi")
            changed = sc.roll(
                new_est.join(old_aff, ["url_norm", "path"], "left_anti")
                .unionByName(old_aff.join(new_est, ["url_norm", "path"],
                                          "left_anti"))
                .select("url_norm").distinct(), "changed")
            paths = sc.roll(paths.join(aff, "url_norm", "left_anti")
                            .unionByName(new_est), "paths")
            if stats is not None:
                n_changed = changed.count()
                stats["delta_rows"].append(n_changed)
                if n_changed == 0:
                    break
            elif changed.isEmpty():
                break
        # preorder rank: lexicographic path order (shorter prefix first —
        # Spark array ordering — which is exactly parent-before-child)
        from roddy_spark.operators.rank import (ordered_seq,
                                                release_rank_caches)
        out = (ordered_seq(paths, ["path"], "seq")
               .select("url_norm", F.size("path").alias("depth"), "seq"))
        # the ONE checkpoint left: detach the result from the scratch files
        # deleted below (bounded — it is the final output, not round state)
        out = out.localCheckpoint(eager=True)
        release_rank_caches()
        return out
    finally:
        if scratch_dir is None:
            shutil.rmtree(root, ignore_errors=True)
