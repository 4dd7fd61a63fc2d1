"""Seeded randomized end-to-end test — the analog of the reference's
QueueSuite (queue/queue_test.go:17-142: seeded random seed set, corrupt
queue items injected, invariants items==requests and
success+failure==requests)."""

from __future__ import annotations

import random

import pytest

from roddy_spark.config import CrawlConfig
from roddy_spark.oracle import crawl_oracle, pages_dict_from_pandas
from roddy_spark.plans.crawl import Crawler
from roddy_spark.sources.synthweb import (WebConfig, synthweb_df,
                                          synthweb_pandas)

SEED = 12387123712321232  # the reference queue test's pinned seed
WEB = WebConfig(n_hosts=3, n_pages=100, n_corpus=20)


@pytest.fixture(scope="module")
def web(spark):
    pdf = synthweb_pandas(WEB)
    df = synthweb_df(spark, WEB, partitions=2)
    df.persist().count()
    yield pages_dict_from_pandas(pdf), df
    df.unpersist()


def _random_seeds(rng: random.Random) -> list[str]:
    """Random seed set with duplicates + corrupt entries (the corrupt-item
    injection of queue_test.go:62-69)."""
    seeds = []
    for _ in range(30):
        roll = rng.random()
        if roll < 0.5:
            k = rng.randrange(WEB.n_hosts)
            j = rng.randrange(20)
            seeds.append(f"http://h{k}.test/p/{j}" if j else
                         f"http://h{k}.test/")
        elif roll < 0.7:  # pre-canonical variants (dupes after canon)
            k = rng.randrange(WEB.n_hosts)
            seeds.append(f"HTTP://H{k}.TEST")
        elif roll < 0.85:  # dangling but well-formed → 404 failures
            seeds.append(f"http://h0.test/missing/{rng.randrange(99)}")
        else:  # corrupt: unparseable / non-http → dropped at the gate
            seeds.append(rng.choice(
                ["not a url", "mailto:x@y", "://broken", "", "http://"]))
    return seeds


@pytest.mark.parametrize("case", range(3))
def test_randomized_crawl_invariants(spark, web, tmp_path, case):
    pages_dict, pages_df = web
    rng = random.Random(SEED + case)
    seeds = _random_seeds(rng)
    config = CrawlConfig(
        max_depth=rng.choice([1, 2, 3]),
        per_host_budget=rng.choice([0, 2, 5]),
        max_requests=rng.choice([0, 0, 25]),
    )
    expected = crawl_oracle(pages_dict, seeds, config)
    state = Crawler(spark, config, pages_df,
                    str(tmp_path / f"rnd{case}")).run(seeds)

    # exact equivalence: crawl ordering + URL-seen set
    got = [(r["url_norm"], r["depth"], r["seq"]) for r in
           state.visited(spark).orderBy("seq").collect()]
    exp = [(u, d, s) for u, d, s, _ in
           sorted(expected.admitted, key=lambda a: a[2])]
    assert got == exp, f"case {case}: ordering mismatch"

    # QueueSuite invariants
    fetches = state.fetches(spark).collect()
    n_ok = sum(1 for f in fetches if f["success"])
    n_fail = len(fetches) - n_ok
    assert n_ok + n_fail == len(fetches)           # success+failure==fetched
    if not config.per_host_budget:
        assert len(fetches) == state.admitted_count  # admitted==fetched
    # fetched URLs are unique — a failed fetch is never retried
    urls = [f["url_norm"] for f in fetches]
    assert len(urls) == len(set(urls))
