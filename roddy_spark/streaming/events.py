"""Streaming/event-time operators over the ``events`` table.

The reference crawler's "streaming" is a continuous pull loop with
wake-on-add (queue/queue.go:140-189) — no watermarks or event-time windows
exist there (SURVEY.md §2.6), and the crawl frontier feeds back into itself,
which Structured Streaming cannot express; the crawl therefore runs as an
iterative micro-batch loop (plans/crawl.py). THIS module covers the
event-analytics side a crawl pipeline still needs (fetch-metric streams,
rate monitoring): tumbling-window aggregation and gap-based sessionization,
each with a batch form (DuckDB-oracle-able) and a Structured Streaming form
(watermarked, availableNow) proven equivalent in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type (batch form)."""
    return (events
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                     F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.count_distinct("user_id").alias("n_users")))


def hourly_rollup_streaming(spark, parquet_path: str,
                            watermark: str = "2 hours") -> DataFrame:
    """The same rollup as a watermarked Structured Streaming query (late
    rows beyond the watermark are dropped); run with trigger(availableNow)
    over the parquet source for a deterministic, bounded replay."""
    src = (spark.readStream.schema(
        spark.read.parquet(parquet_path).schema).parquet(parquet_path))
    # watermarks require TIMESTAMP (not NTZ) event time
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (src.withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("hour"), "event_type",
                    "n_events", "sum_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``. Classic lag + running
    sum — one shuffle on user_id, windows stay partition-local."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (second-truncated casts would misclassify gaps
    # that straddle the boundary by sub-second amounts); NTZ needs the hop
    # through timestamp (session tz pinned to UTC)
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    starts = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000),
                    1).otherwise(0)
    sess = (events
            .withColumn("is_start", starts)
            .withColumn("session_id",
                        F.sum("is_start").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def fetch_rate_metrics(fetches: DataFrame) -> DataFrame:
    """Crawl-side metric rollup (SURVEY.md D10): per (batch, host) fetch
    counts and success rates — what `Collector.String()` debug counters
    become at scale (written per level to the metrics table)."""
    return (fetches.groupBy("batch", "host")
            .agg(F.count("*").alias("n_fetched"),
                 F.sum(F.col("success").cast("long")).alias("n_ok"),
                 F.round(F.avg(F.col("success").cast("double")), 4)
                  .alias("success_rate")))
