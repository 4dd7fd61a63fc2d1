"""Deterministic sampling for training-data mixing: cap each group's
(domain's / language's / source's) contribution so head-heavy strata
don't dominate the mix — the "domain mixing" step of C4/RefinedWeb-style
pipelines. No counterpart in the reference crawler; pipeline-brief scope.
DuckDB-oracled (contract entry ``stratified_sample``).

Scale shape: one shuffle on the group key for the per-group rank window;
selection order is a pure hash of the id, so the sample is reproducible
across runs, engines, and cluster sizes — no RNG state, no seed
plumbing, and adding new rows to OTHER groups never changes a group's
picks."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from roddy_spark.functions import text as T


def stratified_sample(df: DataFrame, group_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """At most ``k`` rows per ``group_col`` value, chosen by hash order.

    Rows are ranked within each group by ``h32(id)`` (cross-engine md5
    prefix — the same primitive the oracles use), id breaking the
    (vanishingly rare) hash ties, and the first ``k`` survive. Hash
    order makes the pick a uniform-ish but DETERMINISTIC sample: the
    same rows survive on every engine and at every parallelism, and a
    group's selection only changes if that group's membership does.
    """
    h = T.h32(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))
