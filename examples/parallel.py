"""The reference's examples/parallel: bounded parallel crawl — here the
per-host politeness budget bounds in-flight fetches per host per batch."""

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("parallel")
state = Crawler(spark, CrawlConfig(max_depth=2, per_host_budget=3),
                pages, ckpt).run(
    [f"http://h{k}.test/" for k in range(3)])
for b in state.batches:
    print(f"batch {b['batch']}: fetched={b['fetched']} "
          f"deferred→next={b['candidates']}")
print("total:", state.admitted_count, "URLs,", state.success_count, "ok")
spark.stop()
