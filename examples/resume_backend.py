"""The reference's examples/redis_backend: a durable queue backend that
survives restarts — here the snapshot store IS the durable backend; kill
after one batch, then resume to completion from the manifest."""

from _common import setup

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("resume_backend")
cfg = CrawlConfig(max_depth=3, per_host_budget=4)

Crawler(spark, cfg, pages, ckpt, max_batches=1).run(["http://h0.test/"])
print("interrupted after batch 1 →",
      Crawler(spark, cfg, pages, ckpt).store.manifest()["completed_batch"])

state = Crawler(spark, cfg, pages, ckpt).run(resume=True)
print("resumed to", len(state.batches), "batches,",
      state.admitted_count, "URLs total")
spark.stop()
