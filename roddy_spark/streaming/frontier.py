"""Streaming frontier ingestion — Structured Streaming as the crawl's
candidate INTAKE.

The BFS crawl itself is an iterative micro-batch loop (plans/crawl.py) —
its frontier feeds back into itself, which a linear streaming DAG cannot
express. What Structured Streaming DOES fit is the intake side a production
crawler has around that loop: seed lists, sitemap drops, and re-crawl
schedules arriving continuously as files/topics. This module runs that
intake as ``readStream → foreachBatch(admission)``: every micro-batch of
raw candidate URLs is canonicalized, filtered through the full admission
chain (depth/regex/domain/robots), deduplicated in-batch and against the
PERSISTENT visited store (mark-at-admission), and appended — exactly-once
per source file via the streaming checkpoint, resumable like everything
else in the engine.

Reference analog: roddy's queue wake-on-add loop (queue/queue.go:140-189)
— items added while the crawl runs are picked up continuously; here the
"queue" is a file/stream source and the consumer is a Spark streaming
query. Per-batch semantics are IDENTICAL to the batch loop's admission
(same ``admit`` operator), proven in tests/test_streaming_frontier.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from roddy_spark.config import CrawlConfig
from roddy_spark.functions import urls as U
from roddy_spark.operators.admission import admit
from roddy_spark.operators.rank import release_rank_caches
from roddy_spark.plans.crawl import SnapshotStore, _empty_visited

# raw intake rows: a URL plus optional scheduling attributes
INTAKE_SCHEMA = StructType([
    StructField("raw_url", StringType()),
    StructField("depth", IntegerType()),
    StructField("priority", IntegerType()),
])


class FrontierIngest:
    """Continuous candidate intake into a crawl's visited/admitted store.

    ``run_available_now`` drains everything currently in the source
    directory and stops (deterministic for tests/benches); a production
    deployment would use a continuous trigger instead — the dataflow is
    identical.
    """

    def __init__(self, spark: SparkSession, config: CrawlConfig,
                 intake_dir: str, store_dir: str, stream_ckpt: str,
                 robots_map: dict | None = None):
        self.spark = spark
        self.config = config
        self.intake_dir = intake_dir
        self.store = SnapshotStore(store_dir,
                                   visited_buckets=config.visited_buckets)
        self.stream_ckpt = stream_ckpt
        self.robots_map = robots_map or {}
        self._admitted_total = 0

    def _process_batch(self, raw: DataFrame, epoch_id: int) -> None:
        spark = self.spark
        cand = (raw.withColumn("url_norm", U.canonicalize("raw_url"))
                .filter(F.col("url_norm").isNotNull())
                .select("url_norm",
                        F.coalesce(F.col("depth"), F.lit(1)).alias("depth"),
                        F.coalesce(F.col("priority"), F.lit(1))
                        .alias("priority"),
                        F.monotonically_increasing_id().alias("parent_seq"),
                        F.lit(0).alias("pos"),
                        F.create_map().cast("map<string,string>")
                        .alias("ctx")))
        visited = self.store.read_visited(spark)
        admitted = admit(cand, self.config, visited, None, self.robots_map,
                         admitted_so_far=self._admitted_total)
        batch_no = int(epoch_id) + 1
        self.store.write_visited(
            admitted.withColumn("batch", F.lit(batch_no)), batch_no)
        release_rank_caches()
        n = self.store.read_visited(spark, batch_no).count()
        self._admitted_total += n
        self.store.commit_manifest({
            "completed_batch": batch_no,
            "admitted_count": self._admitted_total,
            "success_count": 0, "batches": [], "done": False,
            "config": repr(self.config)})

    def run_available_now(self) -> int:
        """Drain the intake directory; returns total admitted so far."""
        m = self.store.manifest()
        if m:
            self._admitted_total = m.get("admitted_count", 0)
            # a replayed epoch re-appends under the bucketed layout —
            # drop anything the manifest never acknowledged first
            self.store.rollback_visited(m["completed_batch"])
        src = (self.spark.readStream.schema(INTAKE_SCHEMA)
               .parquet(self.intake_dir))
        q = (src.writeStream
             .foreachBatch(self._process_batch)
             .option("checkpointLocation", self.stream_ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return self._admitted_total

    def visited(self) -> DataFrame:
        df = self.store.read_visited(self.spark)
        return df if df is not None else _empty_visited(self.spark)
