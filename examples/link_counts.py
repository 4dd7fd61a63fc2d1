"""The reference's examples/scraper_server: per-page link histogram — the
``p.Links[link]++`` / ``p.Total++`` aggregation over every ``a[href]`` match
(scraper_server.go:34-42), re-expressed relationally: the crawl's expansion
stage already emits one row per resolved anchor, so the histogram is a
``groupBy(link).count()`` and the per-page Total a ``groupBy(page).count()``
— no callback state, distributed by construction.

The reference serves the JSON {Links, Total, Page} for ONE url per HTTP
request; here the same shape is computed for every crawled page at once
(what the server would accumulate across requests)."""

import json

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler, expand

from pyspark.sql import functions as F

spark, pages, ckpt = setup("link_counts")
state = Crawler(spark, CrawlConfig(max_depth=2), pages, ckpt).run(
    ["http://h0.test/"])

# expansion over the persisted fetches re-derives (parent_seq → link) rows;
# join back to visited for the parent URL (Page in the reference's struct)
links = (expand(state.fetches(spark))
         .join(state.visited(spark).select(F.col("seq").alias("parent_seq"),
                                           F.col("url_norm").alias("page")),
               "parent_seq"))

# Links map: count per (page, link) — duplicate anchors increment, exactly
# like p.Links[link]++ (and AbsoluteURL resolution already happened in the
# expand pass)
hist = (links.groupBy("page", F.col("url_norm").alias("link")).count()
        .orderBy("page", F.desc("count"), "link"))

# Total per page + the global most-linked URLs
totals = {r["page"]: r["total"] for r in
          links.groupBy("page").agg(F.count("*").alias("total")).collect()}

by_page: dict[str, dict] = {}
for r in hist.collect():
    info = by_page.setdefault(r["page"],
                              {"Links": {}, "Total": totals[r["page"]],
                               "Page": r["page"]})
    info["Links"][r["link"]] = r["count"]

for page in sorted(by_page)[:3]:
    print(json.dumps(by_page[page], indent=1)[:400])

top = (links.groupBy(F.col("url_norm").alias("link")).count()
       .orderBy(F.desc("count"), "link").limit(5).collect())
print("most-linked across the crawl:")
for r in top:
    print(f"  {r['count']:4d}  {r['link']}")
spark.stop()
