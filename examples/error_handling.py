"""The reference's examples/error_handling + the full callback registry
(roddy.go:360-483): OnRequest aborts, OnResponse reshapes successes,
OnError drains failures to a durable channel, OnScraped fires last."""

from _common import setup
from pyspark.sql import functions as F

from roddy_spark.config import CrawlConfig
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("error_handling")

state = Crawler(
    spark, CrawlConfig(max_depth=3), pages, ckpt,
    # abort fetching anything under /missing/ (it would 404 anyway)
    on_request=lambda df: df.filter(~F.col("url_norm").rlike("/missing/")),
    # tag each successful response (schema-preserving transform)
    on_response=lambda df: df.withColumn(
        "ctx", F.map_concat("ctx", F.create_map(F.lit("seen"), F.lit("1")))),
    # failures → durable errors table, user-shaped
    on_error=lambda df: df.select("url_norm", "status", "error_effective",
                                  "batch"),
    # OnScraped fires last, after expansion
    on_scraped=lambda df: df.select("url_norm", "depth", "seq", "batch"),
).run(["http://h0.test/"])

errs = state.errors(spark)
print("errors table:")
if errs is not None:
    for r in errs.orderBy("url_norm").collect():
        print(f"  {r['url_norm']} -> {r['status']} ({r['error_effective']})")

scraped = state.scraped(spark)
print(f"scraped rows: {scraped.count() if scraped is not None else 0}")
print(f"successes: {state.success_count}")
spark.stop()
