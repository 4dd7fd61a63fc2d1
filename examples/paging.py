"""The reference's examples/old_reddit: follow rel="next" paging chains —
paging links run at priority 0 and keep the parent's depth."""

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("paging")
state = Crawler(spark, CrawlConfig(max_depth=2, max_page_num=2),
                pages, ckpt).run(["http://h0.test/"])
listing = [u for u in state.order(spark) if "/list/" in u]
print("paging chain crawled (max_page_num=2):", listing)
spark.stop()
