"""Stateful-streaming operator equivalence + json-props contract addition."""

from __future__ import annotations

import shutil


def test_stateful_user_totals_matches_batch(spark, sf_dir, tmp_path):
    from roddy_spark.streaming.stateful import (user_totals_batch,
                                                user_totals_streaming)
    src = tmp_path / "ev"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    ev = spark.read.parquet(str(src))
    expected = {r["user_id"]: (r["n_events"], r["sum_value"])
                for r in user_totals_batch(ev).collect()}
    q = (user_totals_streaming(spark, str(src))
         .writeStream.format("memory").queryName("totals")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update mode with one availableNow batch → one final row per user
    got = {r["user_id"]: (r["n_events"], r["sum_value"])
           for r in spark.sql("select * from totals").collect()}
    assert got == expected
