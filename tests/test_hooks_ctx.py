"""Context propagation (context.go:8-52), max_page_num paging budget
(metric.go:5-24), OnRequest abort (roddy.go:206-208), and error
classification (F12) — Spark engine vs oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roddy_spark.config import CrawlConfig
from roddy_spark.oracle import crawl_oracle, pages_dict_from_pandas
from roddy_spark.plans.crawl import Crawler
from roddy_spark.sources.synthweb import WebConfig, synthweb_df, synthweb_pandas

WEB = WebConfig(n_hosts=2, n_pages=80, n_corpus=30)


@pytest.fixture(scope="module")
def web(spark):
    pdf = synthweb_pandas(WEB)
    df = synthweb_df(spark, WEB, partitions=2)
    df.persist().count()
    yield pages_dict_from_pandas(pdf), df
    df.unpersist()


def test_ctx_inherited_by_descendants(spark, web, tmp_path):
    pages_dict, pages_df = web
    seeds = [("http://h0.test/", {"job": "alpha", "user": "u1"})]
    cfg = CrawlConfig(max_depth=3)
    state = Crawler(spark, cfg, pages_df, str(tmp_path / "ctx")).run(seeds)
    rows = state.visited(spark).select("url_norm", "ctx").collect()
    assert len(rows) > 5
    for r in rows:  # every descendant inherits the seed's ctx
        assert dict(r["ctx"]) == {"job": "alpha", "user": "u1"}, r["url_norm"]
    # oracle agrees
    exp = crawl_oracle(pages_dict, seeds, cfg)
    assert {r["url_norm"] for r in rows} == exp.visited_urls
    assert all(exp.ctx_by_url[u] == {"job": "alpha", "user": "u1"}
               for u in exp.visited_urls)


def test_max_page_num_gates_paging(spark, web, tmp_path):
    pages_dict, pages_df = web
    cfg = CrawlConfig(max_depth=2, max_page_num=1)
    seeds = ["http://h0.test/"]
    state = Crawler(spark, cfg, pages_df, str(tmp_path / "pg")).run(seeds)
    exp = crawl_oracle(pages_dict, seeds, cfg)
    got = [(r["url_norm"], r["seq"]) for r in
           state.visited(spark).orderBy("seq").collect()]
    want = [(u, s) for u, d, s, _ in sorted(exp.admitted, key=lambda a: a[2])]
    assert got == want
    vis = {u for u, _ in got}
    # /list/0 fetched (1st paging page), /list/1 admitted via its next-link
    # only if budget allows: budget=1 → after /list/0 succeeds the gate
    # closes, so /list/2 (linked from /list/1) must NOT be crawled
    assert "http://h0.test/list/0" in vis
    assert "http://h0.test/list/2" not in vis
    # unlimited run DOES reach /list/2
    full = crawl_oracle(pages_dict, seeds, CrawlConfig(max_depth=2))
    assert "http://h0.test/list/2" in full.visited_urls


def test_on_request_abort(spark, web, tmp_path):
    pages_dict, pages_df = web
    cfg = CrawlConfig(max_depth=2)
    seeds = ["http://h0.test/"]

    def spark_hook(df):  # abort any /p/ page fetch (stays visited)
        return df.filter(~F.col("url_norm").rlike("/p/"))

    def oracle_hook(url, depth, ctx):
        return "/p/" not in url

    state = Crawler(spark, cfg, pages_df, str(tmp_path / "ab"),
                    on_request=spark_hook).run(seeds)
    exp = crawl_oracle(pages_dict, seeds, cfg, on_request=oracle_hook)
    got_fetched = {r["url_norm"] for r in state.fetches(spark).collect()}
    exp_fetched = {f["url_norm"] for f in exp.fetches}
    assert got_fetched == exp_fetched
    assert not any("/p/" in u for u in got_fetched)
    # aborted URLs are still visited-marked (never retried)
    got_visited = {r["url_norm"] for r in state.visited(spark).collect()}
    assert got_visited == exp.visited_urls
    assert any("/p/" in u for u in got_visited)


def test_error_classification_and_ignored(spark, web, tmp_path):
    _, pages_df = web
    cfg = CrawlConfig(max_depth=3, ignored_errors=("http_404",))
    state = Crawler(spark, cfg, pages_df, str(tmp_path / "err")).run(
        ["http://h0.test/"])
    f = state.fetches(spark)
    errs = {r["url_norm"]: (r["error"], r["error_effective"])
            for r in f.filter(~F.col("success")).collect()}
    assert errs, "expected failed fetches (boom/missing)"
    for url, (e, eff) in errs.items():
        if e == "http_404":
            assert eff is None          # F12: ignored error → effective NULL
        else:
            assert eff == e
    boom = [v for k, v in errs.items() if k.endswith("/boom")]
    assert boom and boom[0][0] == "http_500"


def test_on_response_suppress(spark, web, tmp_path):
    """OnResponse slot (roddy.go:185-248 order: after fetch, before
    extraction): rows it drops are suppressed — absent from the fetches
    table, uncounted, and their links never expand — but remain visited
    (they WERE fetched). Engine vs oracle."""
    pages_dict, pages_df = web
    cfg = CrawlConfig(max_depth=3)
    seeds = ["http://h0.test/"]

    def spark_hook(df):  # suppress /p/ responses: no storage, no expansion
        return df.filter(~F.col("url_norm").rlike("/p/"))

    def oracle_hook(url, depth, ctx):
        return "/p/" not in url

    state = Crawler(spark, cfg, pages_df, str(tmp_path / "resp"),
                    on_response=spark_hook).run(seeds)
    exp = crawl_oracle(pages_dict, seeds, cfg, on_response=oracle_hook)
    got_fetch = {(r["url_norm"], r["success"]) for r in
                 state.fetches(spark).collect()}
    exp_fetch = {(f["url_norm"], f["success"]) for f in exp.fetches}
    assert got_fetch == exp_fetch
    assert not any("/p/" in u for u, _ in got_fetch)
    got_visited = {r["url_norm"] for r in state.visited(spark).collect()}
    assert got_visited == exp.visited_urls
    assert any("/p/" in u for u in got_visited), \
        "suppressed responses must still be visited-marked"
    assert state.success_count == sum(
        1 for f in exp.fetches if f["success"])


def test_on_error_channel(spark, web, tmp_path):
    """OnError slot: failed fetches flow through the user transform into a
    durable errors table (roddy.go:332-345 analog)."""
    pages_dict, pages_df = web
    cfg = CrawlConfig(max_depth=3)
    seeds = ["http://h0.test/"]

    def on_error(df):
        return df.select("url_norm", "status", "error_effective", "batch")

    state = Crawler(spark, cfg, pages_df, str(tmp_path / "errs"),
                    on_error=on_error).run(seeds)
    exp = crawl_oracle(pages_dict, seeds, cfg)
    errs = state.errors(spark)
    assert errs is not None, "failed fetches expected (missing links)"
    got = {(r["url_norm"], r["status"]) for r in errs.collect()}
    want = {(e["url_norm"], e["status"]) for e in exp.errors}
    assert got == want and got
    assert set(errs.columns) == {"url_norm", "status", "error_effective",
                                 "batch"}


def test_on_scraped_channel(spark, web, tmp_path):
    """OnScraped slot: fired last, over the batch's successful fetches,
    into a durable scraped table (roddy.go:241-247 analog)."""
    pages_dict, pages_df = web
    cfg = CrawlConfig(max_depth=2)
    seeds = ["http://h0.test/"]

    def on_scraped(df):
        return df.select("url_norm", "depth", "seq")

    state = Crawler(spark, cfg, pages_df, str(tmp_path / "scr"),
                    on_scraped=on_scraped).run(seeds)
    exp = crawl_oracle(pages_dict, seeds, cfg)
    got = {(r["url_norm"], r["depth"], r["seq"]) for r in
           state.scraped(spark).collect()}
    want = {(s["url_norm"], s["depth"], s["seq"]) for s in exp.scraped}
    assert got == want and got


def test_hook_firing_order(spark, web, tmp_path):
    """Per-batch hook order matches the reference pipeline
    (roddy.go:185-248): OnRequest → OnResponse → OnError → OnScraped."""
    _, pages_df = web
    calls = []

    def mk(name, proj=None):
        def hook(df):
            calls.append(name)
            return df if proj is None else df.select(*proj)
        return hook

    Crawler(spark, CrawlConfig(max_depth=2), pages_df,
            str(tmp_path / "order"),
            on_request=mk("request"),
            on_response=mk("response"),
            on_error=mk("error", ["url_norm", "batch"]),
            on_scraped=mk("scraped", ["url_norm", "batch"])
            ).run(["http://h0.test/"])
    per_batch = [calls[i:i + 4] for i in range(0, len(calls) - 3, 4)]
    assert per_batch and all(
        b == ["request", "response", "error", "scraped"]
        for b in per_batch), calls


def test_hook_once_fires_single_batch(spark, web, tmp_path):
    """once()-wrapped hooks fire for exactly ONE batch then detach — the
    batch analog of the reference's self-removing callback registration
    (roddy.go:404-422 detach + callback_options.go wrappers)."""
    from roddy_spark.plans.crawl import once

    _, pages_df = web
    calls = []

    def on_scraped(df):
        calls.append(1)
        return df.select("url_norm", "batch")

    crawler = Crawler(spark, CrawlConfig(max_depth=3), pages_df,
                      str(tmp_path / "once"), on_scraped=once(on_scraped))
    state = crawler.run(["http://h0.test/"])
    assert len(state.batches) > 1, "fixture must crawl multiple batches"
    assert len(calls) == 1
    assert crawler.on_scraped is None
    # only batch 1 reached the scraped table
    batches = {r["batch"] for r in state.scraped(spark).collect()}
    assert batches == {1}


def test_hook_detach_return_mid_crawl(spark, web, tmp_path):
    """A hook that returns DETACH unregisters itself: the current batch
    proceeds as if the hook were absent and later batches never fire it.
    Here on_response suppresses every success in batch 1 (so the crawl
    would END if it stayed registered) and detaches in batch 2 — the
    crawl must continue past it."""
    from roddy_spark.plans.crawl import DETACH

    pages_dict, pages_df = web
    calls = []

    # batch 1: pass-through; batch 2: DETACH — everything flows
    # untouched afterwards and the slot clears
    def on_response2(df):
        calls.append(1)
        if len(calls) == 1:
            return df
        return DETACH

    crawler = Crawler(spark, CrawlConfig(max_depth=3), pages_df,
                      str(tmp_path / "detach"), on_response=on_response2)
    state = crawler.run(["http://h0.test/"])
    assert len(state.batches) > 2
    assert len(calls) == 2, "hook must not fire after returning DETACH"
    assert crawler.on_response is None
    # detach is behavior-neutral: same crawl as with no hook at all
    exp = crawl_oracle(pages_dict, ["http://h0.test/"],
                       CrawlConfig(max_depth=3))
    got = {r["url_norm"] for r in state.visited(spark).collect()}
    assert got == exp.visited_urls


def test_hook_returning_none_raises(spark, web, tmp_path):
    """A hook that falls through without a return (None) must fail LOUDLY
    — only the DETACH sentinel means 'proceed as if absent'. Silently
    treating None as 'keep everything' would mask the missing-return bug
    in a user filter hook (ADVICE r3)."""
    _pages_dict, pages_df = web

    def broken_hook(df):
        df.filter(F.col("depth") > 1)  # oops: no return

    with pytest.raises(TypeError, match="on_request hook returned None"):
        Crawler(spark, CrawlConfig(max_depth=2), pages_df,
                str(tmp_path / "none_hook"),
                on_request=broken_hook).run(["http://h0.test/"])
