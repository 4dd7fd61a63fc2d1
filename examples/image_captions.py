"""The image+caption payload pipeline (input_hint): crawl → extract
<img src> refs → join the corpus → decode + validate (PSNR/phash)."""

from _common import WEB, setup

from roddy_spark.config import CrawlConfig
from roddy_spark.operators.images import decode_validate, join_page_images
from roddy_spark.plans.crawl import Crawler, extractions
from roddy_spark.sources.corpus import corpus_df

spark, pages, ckpt = setup("image_captions")
corpus = corpus_df(spark, WEB.n_corpus, seed=42, partitions=2)

state = Crawler(spark, CrawlConfig(max_depth=2), pages, ckpt).run(
    ["http://h0.test/"])
pairs = join_page_images(extractions(state.fetches(spark)), corpus)
print("page→image pairs:", pairs.count())
for r in pairs.limit(3).collect():
    print(f"  {r['url_norm']} -> {r['image_id']} caption={r['caption'][:40]!r}")

dv = decode_validate(corpus)
ok = dv.filter("dims_ok and phash_ok and decode_error is null").count()
print(f"decode/validate: {ok}/{dv.count()} images pass dims+phash checks")
spark.stop()
