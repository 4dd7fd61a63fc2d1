"""Physical-plan assertions: the plans must be the ones you'd WANT at 100 TB
— column pruning and predicate pushdown reaching the parquet scans,
broadcast joins where a side is small, no cartesian products in the
similarity/dedup candidate generation, whole-stage codegen on the relational
spine."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_column_pruning_token_stats(spark, sf_dir):
    from roddy_spark.plans.contract import q_token_stats
    p = plan_of(q_token_stats(spark, sf_dir))
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan, p
    # only doc_id + text reach the scan — never lang/source/n_chars
    assert "text" in scan[0] and "doc_id" in scan[0]
    assert "lang" not in scan[0] and "source" not in scan[0]


def test_filter_pushdown_to_scan(spark, sf_dir):
    from roddy_spark.plans.contract import q_simhash
    p = plan_of(q_simhash(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,200)]" in p \
        or "LessThan(doc_id,200)" in p, p


def test_broadcast_join_in_topk(spark, sf_dir):
    from roddy_spark.operators.similarity import brute_force_topk
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 3)
    p = plan_of(brute_force_topk(q, embs, k=5))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p, p


def test_no_cartesian_in_lsh_ops(spark, sf_dir):
    from roddy_spark.operators.similarity import cosine_near_dup_pairs
    from roddy_spark.operators.textdedup import minhash_lsh_pairs
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p1 = plan_of(cosine_near_dup_pairs(embs.limit(50)))
    p2 = plan_of(minhash_lsh_pairs(docs.limit(50)))
    assert "CartesianProduct" not in p1, p1
    assert "CartesianProduct" not in p2, p2


def test_wholestage_codegen_on_relational_spine(spark, sf_dir):
    from roddy_spark.plans.contract import q_crawl_metrics
    df = q_crawl_metrics(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    p = plan_of(df, mode="simple")
    assert "isFinalPlan=true" in p, p
    assert "*(" in p, p  # WholeStageCodegen markers


def test_anti_join_broadcasts_small_visited(spark, sf_dir):
    from roddy_spark.plans.contract import q_visited_antijoin
    p = plan_of(q_visited_antijoin(spark, sf_dir))
    assert "LeftAnti" in p, p


def test_partial_aggregation_in_dedup(spark, sf_dir):
    """exact_dedup must do map-side partial aggregation (one shuffle)."""
    from roddy_spark.operators.textdedup import exact_dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(exact_dedup(docs), mode="simple")
    assert p.count("Exchange") == 1, p
    assert "partial_" in p, p  # HashAggregate(partial) before the shuffle


def test_politeness_single_shuffle_per_phase(spark):
    """The salted politeness pre-cut must not explode into extra exchanges
    beyond its two window phases."""
    from roddy_spark.operators.politeness import politeness_split
    df = spark.range(1000).select(
        F.concat(F.lit("u"), (F.col("id") % 7).cast("string")).alias("host"),
        F.col("id").alias("url_hash"),
        F.col("id").alias("seq"),
        F.lit(1).alias("priority"))
    to_fetch, deferred = politeness_split(df, per_host_budget=3)
    p = plan_of(to_fetch, mode="simple")
    # phase 1 shuffles on (host, salt), phase 2 on host — exactly 2
    assert p.count("Exchange hashpartitioning") <= 2, p
