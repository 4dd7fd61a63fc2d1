"""The reference's examples/xkcd_store: write extracted rows to CSV."""

import tempfile

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("export_csv")
state = Crawler(spark, CrawlConfig(max_depth=2), pages, ckpt).run(
    ["http://h0.test/"])
out = tempfile.mkdtemp(prefix="roddy_csv_")
state.export_visited(spark, out, fmt="csv")
print("CSV export:", out)
print(spark.read.option("header", True).csv(out).count(), "rows")
spark.stop()
