"""Spark-side URL function parity: pandas UDFs vs the pure-Python kernel,
and kernel xxhash64 vs Spark's JVM ``F.xxhash64`` (the visited-set key must
be identical between the oracle and the engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from roddy_spark.functions import urls as U
from roddy_spark.functions.urlkernel import canonicalize_url, xxhash64


def test_xxhash64_matches_spark(spark):
    samples = [
        "", "a", "abc", "http://example.com/",
        "http://h0.test/p/123?q=1#frag",
        "x" * 31, "y" * 32, "z" * 100, "√ünïcödé-πäth/ƒ",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxhash64(s), f"hash mismatch for {s!r}"


def test_canonicalize_udf_matches_kernel(spark):
    raws = [
        "http://example.com", "HTTP://EXAMPLE.com:80/Path",
        "http://h.test/100%", "  http://h.test/a\tb  ",
        "http://h.test/a/./b/../c?x=1#f", "mailto:x@y", None,
    ]
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    rows = df.select("url", U.canonicalize("url").alias("c")).collect()
    for r in rows:
        assert r["c"] == canonicalize_url(r["url"])


def test_host_of_matches_kernel(spark):
    urls = ["http://A.B.test:8080/p", "https://x.test/", "http://h0.test/"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    canon = df.select(U.canonicalize("url").alias("u"))
    rows = canon.select("u", U.host_of("u").alias("h")).collect()
    from roddy_spark.functions.urlkernel import url_host
    for r in rows:
        assert r["h"] == url_host(r["u"])


def test_resolve_udf(spark):
    df = spark.createDataFrame(
        [("http://h.test/a/b", "c"), ("http://h.test/p", "#x"),
         ("http://h.test/", "/q?z=1")],
        ["base", "href"])
    rows = df.select(U.resolve("base", "href").alias("r")).collect()
    assert [r["r"] for r in rows] == [
        "http://h.test/a/c", None, "http://h.test/q?z=1"]
