"""The reference's examples/login, batch-style: the browser form-fill is a
live-interaction non-goal (SURVEY S9), but the flow's OUTCOME — a login
response sets a session cookie, and subsequent fetches carry it to reach
gated pages — is exactly the engine's cookie write-back lifecycle (K3).

The crawl seeds at /login (whose response carries set_cookie and links to
the private area). The cookie-aware fetcher rejects /private/* without the
session cookie; because the jar updates between batches, the private pages
fetched in batch 2+ succeed."""

from _common import WEB, setup
from pyspark.sql import functions as F

from roddy_spark.config import CrawlConfig
from roddy_spark.fetch import fetch_join
from roddy_spark.plans.crawl import Crawler

spark, pages, ckpt = setup("login")

# a gated area on h0: /login sets the session cookie and links to /private/1;
# /private/* pages exist but the fetcher 403s them without the cookie
gated = spark.createDataFrame(
    [("http://h0.test/login", "h0.test", 200, "text/html", None,
      '<html><body><a href="/private/1">private</a></body></html>',
      "session=ok"),
     ("http://h0.test/private/1", "h0.test", 200, "text/html", None,
      '<html><body><a href="/private/2">next</a></body></html>', None),
     ("http://h0.test/private/2", "h0.test", 200, "text/html", None,
      "<html><body>secret</body></html>", None)],
    "url string, host string, status int, content_type string, "
    "base_href string, body_html string, set_cookie string")
pages_ck = (pages.withColumn("set_cookie", F.lit(None).cast("string"))
            .select(*gated.columns).unionByName(gated))


def session_fetcher(to_fetch, pages, frontier_rows=None, cookies=None):
    """Cookie-aware fetch: /private/* requires the h0 session cookie."""
    out = fetch_join(to_fetch, pages, frontier_rows=frontier_rows)
    if (cookies or {}).get("h0.test") != "session=ok":
        out = (out.withColumn(
            "status", F.when(F.col("url_norm").rlike("/private/"),
                             F.lit(403)).otherwise(F.col("status")))
               .withColumn("success", F.col("status") < 400))
    return out


state = Crawler(spark, CrawlConfig(max_depth=3), pages_ck, ckpt,
                fetcher=session_fetcher).run(["http://h0.test/login"])

for r in state.fetches(spark).orderBy("seq").collect():
    print(f"fetched[{r['seq']}] {r['url_norm']} -> {r['status']}")
ok = {r["url_norm"]: r["status"] for r in state.fetches(spark).collect()}
assert ok["http://h0.test/private/1"] == 200, "cookie must unlock /private"
assert ok["http://h0.test/private/2"] == 200
print("authenticated crawl OK")
spark.stop()
