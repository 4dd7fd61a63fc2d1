"""Structured Streaming candidate intake (streaming/frontier.py): waves of
raw URL files drain through readStream → foreachBatch(admission) into the
persistent visited store, with the same semantics as batch admission."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roddy_spark.config import CrawlConfig
from roddy_spark.streaming.frontier import INTAKE_SCHEMA, FrontierIngest


def _write_wave(spark, intake_dir, rows):
    (spark.createDataFrame(rows, INTAKE_SCHEMA)
     .coalesce(1).write.mode("append").parquet(intake_dir))


@pytest.mark.parametrize("buckets", [0, 4])
def test_streaming_intake_admits_like_batch(spark, tmp_path, buckets):
    intake = str(tmp_path / f"intake_{buckets}")
    cfg = CrawlConfig(max_depth=2,
                      disallowed_url_filters=(r"/blocked/",),
                      allowed_domains=("h0.test", "h1.test"),
                      visited_buckets=buckets)
    ing = FrontierIngest(spark, cfg, intake,
                         str(tmp_path / f"store_{buckets}"),
                         str(tmp_path / f"sckpt_{buckets}"))

    # wave 1: mixed-quality candidates
    _write_wave(spark, intake, [
        ("HTTP://H0.TEST/a", 1, 1),        # canonicalizes + admits
        ("http://h0.test/a", 1, 1),        # dup after canonicalization
        ("http://h1.test/b?x=1", 2, 1),
        ("http://evil.test/c", 1, 1),      # domain filter drops
        ("http://h0.test/blocked/x", 1, 1),  # regex filter drops
        ("not a url", 1, 1),               # canonicalizer drops
        ("http://h0.test/deep", 3, 1),     # over max_depth
    ])
    total = ing.run_available_now()
    got = {r["url_norm"] for r in ing.visited().collect()}
    assert got == {"http://h0.test/a", "http://h1.test/b?x=1"}
    assert total == 2

    # wave 2: re-sends of wave-1 URLs must NOT re-admit (persistent store)
    _write_wave(spark, intake, [
        ("http://h0.test/a", 1, 1),
        ("http://h1.test/b?x=1", 2, 1),
        ("http://h1.test/new", 1, 1),
    ])
    total = ing.run_available_now()
    got = {r["url_norm"] for r in ing.visited().collect()}
    assert got == {"http://h0.test/a", "http://h1.test/b?x=1",
                   "http://h1.test/new"}
    assert total == 3

    # exactly-once: draining again with no new files is a no-op
    assert ing.run_available_now() == 3
    # seq stays a global admission order across waves
    seqs = sorted(r["seq"] for r in ing.visited().collect())
    assert seqs == [0, 1, 2]


def test_streaming_intake_resumes_fresh_instance(spark, tmp_path):
    """A NEW ingest instance over the same store + stream checkpoint picks
    up the admitted_count and skips already-processed files."""
    intake = str(tmp_path / "intake_r")
    cfg = CrawlConfig(max_depth=2)
    args = (spark, cfg, intake, str(tmp_path / "store_r"),
            str(tmp_path / "sckpt_r"))
    _write_wave(spark, intake, [("http://h0.test/one", 1, 1)])
    assert FrontierIngest(*args).run_available_now() == 1

    _write_wave(spark, intake, [("http://h0.test/two", 1, 1)])
    ing2 = FrontierIngest(*args)
    assert ing2.run_available_now() == 2
    seqs = {(r["url_norm"], r["seq"]) for r in ing2.visited().collect()}
    assert seqs == {("http://h0.test/one", 0), ("http://h0.test/two", 1)}
