"""Vectorized robots gate (robots.robots_gate_series) must be row-for-row
identical to the scalar reference robots_allowed(rules, robots_path_of(url))
— the admission hot path's per-row zip loop was replaced by per-host-group
vectorized longest-prefix evaluation (VERDICT r2 item 5)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from roddy_spark.robots import (build_robots_map, parse_robots,
                                robots_allowed, robots_gate_series,
                                robots_path_of)

RULES = {
    "a.test": parse_robots(
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Disallow: /tmp\nAllow: /\n"),
    "b.test": parse_robots("User-agent: *\nDisallow: /\nAllow: /pub\n"),
    "tie.test": [(False, "/x"), (True, "/x")],   # length tie → allow wins
    "empty.test": [],
}


def _check(hosts, urls):
    got = robots_gate_series(pd.Series(hosts), pd.Series(urls), RULES)
    for i, (h, u) in enumerate(zip(hosts, urls)):
        rules = RULES.get(h)
        want = (robots_allowed(rules, robots_path_of(u))
                if rules else True)
        assert bool(got.iloc[i]) == want, (h, u, want)


def test_gate_matches_scalar_on_crafted_cases():
    hosts = ["a.test", "a.test", "a.test", "a.test", "b.test", "b.test",
             "tie.test", "empty.test", "nrules.test", "a.test", "a.test",
             "b.test", "a.test"]
    urls = [
        "http://a.test/private/x",          # denied
        "http://a.test/private/ok/y",       # allow overrides (longer)
        "http://a.test/",                   # allowed
        "http://a.test/tmp?x=1",            # query included in match path
        "http://b.test/pub/z",              # allow island
        "http://b.test/other",              # catch-all deny
        "http://tie.test/x",                # tie → allow
        "http://empty.test/anything",       # empty rules → allowed
        "http://nrules.test/whatever",      # host absent from map
        "http://a.test:8080/private/p",     # port must not leak into path
        "http://a.test",                    # empty path → '/'
        "http://b.test/?",                  # '?' with empty query
        "http://a.test/private#frag",       # fragment excluded from path
    ]
    _check(hosts, urls)


def test_gate_matches_scalar_randomized():
    rng = random.Random(7)
    hosts_pool = list(RULES) + ["x.test"]
    segs = ["", "/", "/private", "/private/ok", "/pub", "/x", "/tmp",
            "/a/b/c", "/private/okextra", "/puB"]
    qs = ["", "?q=1", "?", "?a=b&c=d"]
    hosts, urls = [], []
    for _ in range(500):
        h = rng.choice(hosts_pool)
        u = f"http://{h}{rng.choice(segs)}{rng.choice(qs)}"
        hosts.append(h)
        urls.append(u)
    _check(hosts, urls)


def test_gate_scalar_fallback_for_unparseable():
    # rows without scheme://authority shape go through robots_path_of
    hosts = ["b.test", "b.test"]
    urls = ["not a url at all", "//b.test/pub"]
    _check(hosts, urls)


def test_gate_scalar_fallback_for_whitespace_and_brackets():
    """urlsplit strips \\t\\r\\n anywhere and validates bracket hosts; the
    regex split would diverge — such rows must take the scalar path
    (review finding r3)."""
    hosts = ["a.test", "a.test", "b.test", "b.test", "a.test"]
    urls = [
        "http://a.test/pri\tvate/x",     # tab inside path: urlsplit strips
        "http://a.test/priv\nate",       # newline
        "http://[::1/x",                 # malformed bracket host: raises
        "http://[::1]/pub",              # valid bracket host
        "http://a.test/private/ok y",    # raw space in path
    ]
    _check(hosts, urls)


def test_gate_in_spark_admission(spark):
    """End-to-end through admit(): same admitted set as scalar evaluation."""
    from pyspark.sql import functions as F

    from roddy_spark.config import CrawlConfig
    from roddy_spark.functions import urls as U
    from roddy_spark.operators.admission import admit

    rows = [(f"http://{h}.test/{p}", 1, 1, i, 0)
            for i, (h, p) in enumerate(
                (h, p) for h in ("a", "b", "x")
                for p in ("", "private", "private/ok", "pub", "tmp", "x"))]
    rm = build_robots_map([
        ("a.test", "User-agent: *\nDisallow: /private\nAllow: /private/ok"),
        ("b.test", "User-agent: *\nDisallow: /\nAllow: /pub"),
    ])
    df = (spark.createDataFrame(
            rows, "raw_url string, depth int, priority int, "
                  "parent_seq long, pos int")
          .withColumn("url_norm", U.canonicalize("raw_url"))
          .filter(F.col("url_norm").isNotNull())
          .drop("raw_url"))
    got = {r["url_norm"] for r in
           admit(df, CrawlConfig(respect_robots=True), None,
                 robots_map=rm).collect()}
    want = set()
    for r in df.collect():
        u = r["url_norm"]
        h = u.split("/")[2]
        rules = rm.get(h)
        if not rules or robots_allowed(rules, robots_path_of(u)):
            want.add(u)
    assert got == want and "http://a.test/private/ok" in got \
        and "http://b.test/pub" in got and "http://b.test/tmp" not in got
