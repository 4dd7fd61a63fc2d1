"""The reference's examples/basic: crawl from one seed, print each visited
URL and its extracted links (the OnHTML("a[href]") → Visit pattern)."""

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler, extractions

spark, pages, ckpt = setup("basic")
state = Crawler(spark, CrawlConfig(max_depth=2), pages, ckpt).run(
    ["http://h0.test/"])

for row in state.visited(spark).orderBy("seq").collect():
    print(f"visited[{row['seq']:3d}] depth={row['depth']} {row['url_norm']}")

ext = extractions(state.fetches(spark)).orderBy("seq").collect()
for row in ext[:5]:
    print(f"extracted: {row['url_norm']} title={row['title']!r} "
          f"links={row['n_links']}")
spark.stop()
