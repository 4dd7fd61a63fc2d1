"""The reference's examples/max_depth: MaxDepth(1) visits only the seeds."""

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("max_depth")
state = Crawler(spark, CrawlConfig(max_depth=1), pages, ckpt).run(
    ["http://h0.test/", "http://h1.test/"])
print("visited:", state.order(spark))
assert all(r["depth"] == 1 for r in state.visited(spark).collect())
spark.stop()
