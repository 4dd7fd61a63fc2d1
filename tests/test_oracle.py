"""Oracle sanity tests on the synthetic web — these pin the SEMANTICS the
Spark engine is then tested against (tests/test_crawl_e2e.py)."""

from __future__ import annotations

import pytest

from roddy_spark.config import CrawlConfig
from roddy_spark.oracle import crawl_oracle, pages_dict_from_pandas
from roddy_spark.sources.synthweb import (WebConfig, default_seeds,
                                          robots_pandas, synthweb_pandas)


@pytest.fixture(scope="module")
def web():
    cfg = WebConfig(n_hosts=3, n_pages=120, n_corpus=50)
    pdf = synthweb_pandas(cfg)
    return cfg, pages_dict_from_pandas(pdf), robots_pandas(cfg)


def test_seed_dedup_and_depth1(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, default_seeds(cfg), CrawlConfig(max_depth=1))
    # 4 seed strings, 3 canonicalize to the same h0 root → 2 distinct
    assert res.order == ["http://h0.test/", "http://h1.test/"]
    assert res.rejected.get("visited", 0) == 2
    assert all(d == 1 for _, d, _, _ in res.admitted)


def test_max_depth_two(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"], CrawlConfig(max_depth=2))
    depths = {u: d for u, d, _, _ in res.admitted}
    assert depths["http://h0.test/"] == 1
    assert depths["http://h0.test/p/1"] == 2
    # depth-3 tree pages NOT admitted
    assert "http://h0.test/p/4" not in depths
    # percent page canonicalized and admitted at depth 2
    assert depths["http://h0.test/100%25"] == 2
    # paging chain: same-depth (2), crawled across batches even at max_depth
    assert depths["http://h0.test/list/0"] == 2
    assert depths["http://h0.test/list/1"] == 2
    assert depths["http://h0.test/list/2"] == 2
    # cross-host root reached at depth 2
    assert depths["http://h1.test/"] == 2
    assert res.rejected["max_depth"] > 0


def test_failed_fetch_stays_visited(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"], CrawlConfig(max_depth=4))
    boom = [f for f in res.fetches if f["url_norm"] == "http://h0.test/boom"]
    assert len(boom) == 1 and not boom[0]["success"]
    missing = [f for f in res.fetches if "/missing/" in f["url_norm"]]
    assert missing and all(not f["success"] for f in missing)
    # every fetch is unique (never retried)
    urls = [f["url_norm"] for f in res.fetches]
    assert len(urls) == len(set(urls))
    # invariant from queue_test.go:98-100: success + failure == fetched
    assert sum(b["success"] + b["failure"] for b in res.batches) == len(urls)
    # admitted == fetched (no budget/deferral in this config)
    assert len(res.admitted) == len(res.fetches)


def test_redirect_target_crawled(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"], CrawlConfig(max_depth=3))
    d = {u: dep for u, dep, _, _ in res.admitted}
    assert d["http://h0.test/redirect"] == 2
    assert d["http://h0.test/redirected/"] == 3


def test_base_href_resolution(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"], CrawlConfig(max_depth=3))
    vis = res.visited_urls
    assert "http://h0.test/deep/dir/leaf" in vis      # absolute <base href>
    assert "http://h0.test/deep2/leaf2" in vis        # relative <base href>


def test_domain_filters(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"],
                       CrawlConfig(max_depth=4, allowed_domains=("h0.test",)))
    assert all(h == "h0.test" for _, _, _, h in res.admitted)
    assert res.rejected["domain_allow"] > 0
    res2 = crawl_oracle(pages, ["http://h0.test/", "http://h1.test/"],
                        CrawlConfig(max_depth=2,
                                    disallowed_domains=("h1.test",)))
    assert all(h != "h1.test" for _, _, _, h in res2.admitted)


def test_url_regex_filters(web):
    cfg, pages, _ = web
    res = crawl_oracle(
        pages, ["http://h0.test/"],
        CrawlConfig(max_depth=3,
                    disallowed_url_filters=(r"/p/\d*[02468]$",)))
    assert not any(u.endswith("/p/2") for u in res.visited_urls)
    assert any(u.endswith("/p/1") for u in res.visited_urls)
    res2 = crawl_oracle(
        pages, ["http://h0.test/"],
        CrawlConfig(max_depth=3, url_filters=(r"h0\.test/$", r"/p/",)))
    assert all("/p/" in u or u == "http://h0.test/"
               for u in res2.visited_urls)


def test_max_requests_budget(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"],
                       CrawlConfig(max_depth=3, max_requests=7))
    assert len(res.admitted) == 7
    # deterministic prefix of the unbounded crawl
    full = crawl_oracle(pages, ["http://h0.test/"], CrawlConfig(max_depth=3))
    assert res.order == full.order[:7]


def test_per_host_politeness_deferral(web):
    cfg, pages, _ = web
    unlimited = crawl_oracle(pages, ["http://h0.test/"],
                             CrawlConfig(max_depth=2))
    polite = crawl_oracle(pages, ["http://h0.test/"],
                          CrawlConfig(max_depth=2, per_host_budget=3))
    # same final URL-seen set, just spread over more batches
    assert polite.visited_urls == unlimited.visited_urls
    assert polite.order == unlimited.order  # seq assigned at admission
    assert len(polite.batches) > len(unlimited.batches)
    assert any(b["deferred"] > 0 for b in polite.batches)
    # per-batch per-host fetch counts respect the budget
    for b_id in range(1, len(polite.batches) + 1):
        hosts: dict[str, int] = {}
        for f in polite.fetches:
            if f["batch"] == b_id:
                h = f["url_norm"].split("/")[2]
                hosts[h] = hosts.get(h, 0) + 1
        assert all(v <= 3 for v in hosts.values())


def test_robots(web):
    cfg, pages, robots = web
    rows = list(zip(robots["host"], robots["robots_txt"]))
    res = crawl_oracle(pages, ["http://h1.test/"],
                       CrawlConfig(max_depth=2, respect_robots=True),
                       robots_rows=rows)
    vis = res.visited_urls
    assert "http://h1.test/allowed" in vis
    assert "http://h1.test/disallowed" not in vis
    assert "http://h1.test/list/0" not in vis
    assert res.rejected["robots"] > 0
    # h0 (even host) robots allows everything
    res0 = crawl_oracle(pages, ["http://h0.test/"],
                        CrawlConfig(max_depth=2, respect_robots=True),
                        robots_rows=rows)
    assert "http://h0.test/disallowed" in res0.visited_urls


def test_allow_url_revisit(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test", "http://h0.test/"],
                       CrawlConfig(max_depth=1, allow_url_revisit=True))
    assert len(res.admitted) == 2  # both seed variants fetch


def test_max_responses(web):
    cfg, pages, _ = web
    res = crawl_oracle(pages, ["http://h0.test/"],
                       CrawlConfig(max_depth=4, max_responses=5))
    succ = sum(1 for f in res.fetches if f["success"])
    # batch-granular stop: ≥ 5 but bounded by one extra batch
    assert succ >= 5
    full = crawl_oracle(pages, ["http://h0.test/"], CrawlConfig(max_depth=4))
    assert succ < sum(1 for f in full.fetches if f["success"])
