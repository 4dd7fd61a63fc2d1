"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the pattern for crawl-side continuous state (e.g. per-host fetch-rate
accounting across micro-batches) that windowed aggregation can't express.

Demonstrated here as per-user running totals over the events stream: the
state (n_events, sum_value) persists in the state store across micro-
batches and each batch emits the UPDATED totals for the users it touched.
Batch-equivalence is proven in tests (availableNow replay == batch agg).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])
STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _update_user_totals(key, pdf_iter, state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [round(total, 2)]})


def user_totals_streaming(spark, parquet_dir: str) -> DataFrame:
    """Streaming per-user running totals with explicit state. Run with
    ``trigger(availableNow=True)`` for a bounded deterministic replay."""
    src = (spark.readStream.schema(
        spark.read.parquet(parquet_dir).schema).parquet(parquet_dir))
    return (src.groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def user_totals_batch(events: DataFrame) -> DataFrame:
    return (events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))
