#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline metric: frontier throughput (URLs fetched+deduped per second) of
the full BFS crawl loop over a generated synthetic web (the engine's real
workload), measured at two parallelism levels (local[N] and local[4N]) on
IDENTICAL input to evidence the north rule's two-cluster-size scaling
criterion in-sandbox: efficiency = (thr_4N / thr_N) / 4.

Also times the contract queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Usage: python bench.py            # full run (scaling + queries)
       python bench.py --quick    # skip the scaling pair (single crawl)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_HOSTS = int(os.environ.get("RODDY_BENCH_HOSTS", "40"))
BENCH_PAGES = int(os.environ.get("RODDY_BENCH_PAGES", "20000"))
SCALE_CORES_N = int(os.environ.get("RODDY_BENCH_CORES_N", str(max(CPUS // 4, 1))))

QUERY_NAMES = [
    "frontier_admission", "visited_antijoin", "first_occurrence",
    "politeness_rank", "bfs_expand", "domain_filter", "salted_agg",
    "token_stats", "quality_scores", "lang_id", "fingerprints",
    "dedup_exact", "ngram_jaccard", "minhash_signatures", "simhash",
    "embedding_neardup", "ann_topk", "sessionize", "hourly_rollup",
]


def build_session(cores: int):
    from roddy_spark.session import build_session as bs
    return bs(app_name=f"roddy-bench-{cores}", cores=cores,
              shuffle_partitions=cores)


def materialize_web(spark, path: str) -> None:
    from roddy_spark.sources.synthweb import WebConfig, synthweb_df
    cfg = WebConfig(n_hosts=BENCH_HOSTS, n_pages=BENCH_PAGES, n_corpus=1000)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synthweb_df(spark, cfg, partitions=32).write.mode(
            "overwrite").parquet(path)


def crawl_throughput(spark, web_path: str) -> dict:
    from roddy_spark.config import CrawlConfig
    from roddy_spark.plans.crawl import Crawler
    pages = spark.read.parquet(web_path)
    seeds = [f"http://h{k}.test/" for k in range(BENCH_HOSTS)]
    ckpt = tempfile.mkdtemp(prefix="roddy_bench_ckpt_")
    try:
        t0 = time.time()
        state = Crawler(spark, CrawlConfig(max_depth=0), pages, ckpt,
                        max_batches=64).run(seeds)
        secs = time.time() - t0
        n_candidates = sum(b["candidates"] for b in state.batches)
        n_fetched = sum(b["fetched"] for b in state.batches)
        return {
            "secs": round(secs, 2),
            "batches": len(state.batches),
            "urls_admitted": state.admitted_count,
            "urls_fetched": n_fetched,
            "candidates_deduped": n_candidates,
            "throughput_urls_per_sec": round(
                (n_fetched + n_candidates) / secs, 1),
            "fetched_per_sec": round(n_fetched / secs, 1),
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def run_queries(spark) -> dict:
    from roddy_spark.plans import contract
    out = {}
    for name in QUERY_NAMES:
        fn = contract.QUERIES[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
        out[f"{name}_rows"] = n
    return out


def main() -> None:
    quick = "--quick" in sys.argv
    web_path = os.path.join(
        tempfile.gettempdir(),
        f"roddy_bench_web_{BENCH_HOSTS}x{BENCH_PAGES}")

    scaling = {}
    if not quick:
        # small-parallelism crawl first (same input!)
        spark_n = build_session(SCALE_CORES_N)
        materialize_web(spark_n, web_path)
        r_n = crawl_throughput(spark_n, web_path)
        spark_n.stop()
    spark = build_session(CPUS)
    materialize_web(spark, web_path)
    r_4n = crawl_throughput(spark, web_path)
    if not quick:
        eff = (r_4n["throughput_urls_per_sec"]
               / r_n["throughput_urls_per_sec"]) / (CPUS / SCALE_CORES_N)
        scaling = {
            "cores_n": SCALE_CORES_N, "cores_4n": CPUS,
            "throughput_n": r_n["throughput_urls_per_sec"],
            "throughput_4n": r_4n["throughput_urls_per_sec"],
            "secs_n": r_n["secs"], "secs_4n": r_4n["secs"],
            "efficiency": round(eff, 3),
        }

    qtimes = run_queries(spark)
    queries = {k: v for k, v in qtimes.items() if not k.endswith("_rows")}

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "frontier_throughput_urls_per_sec",
        "value": r_4n["throughput_urls_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": r_4n,
        "scaling": scaling,
        "bench_web": {"hosts": BENCH_HOSTS, "pages": BENCH_PAGES},
        "query_rows": {k[:-5]: v for k, v in qtimes.items()
                       if k.endswith("_rows")},
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
