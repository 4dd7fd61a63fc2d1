"""The reference's examples/basic: crawl from one seed, print each visited
URL and its extracted links (the OnHTML("a[href]") → Visit pattern).
The reference's basic example runs in SYNC (DFS) mode — the true DFS visit
order is printed too (plans/dfs.py reproduces it as a dataflow fixpoint)."""

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler, extractions
from roddy_spark.plans.dfs import dfs_preorder

spark, pages, ckpt = setup("basic")
state = Crawler(spark, CrawlConfig(max_depth=2), pages, ckpt).run(
    ["http://h0.test/"])

for row in state.visited(spark).orderBy("seq").collect():
    print(f"visited[{row['seq']:3d}] depth={row['depth']} {row['url_norm']}")

print("sync-mode (DFS) visit order, as the reference's example would:")
for row in dfs_preorder(spark, pages, ["http://h0.test/"],
                        CrawlConfig(max_depth=2)).orderBy("seq").collect():
    print(f"dfs[{row['seq']:3d}] depth={row['depth']} {row['url_norm']}")

ext = extractions(state.fetches(spark)).orderBy("seq").collect()
for row in ext[:5]:
    print(f"extracted: {row['url_norm']} title={row['title']!r} "
          f"links={row['n_links']}")
spark.stop()
