"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composed frontier-admission query on
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
plus the training-data pipeline operators; ``oracle_sql()`` gives each one's
DuckDB ANSI-SQL twin. The iterative crawl loops are hash-oracled via
recursive CTEs over a relationally-defined web (``crawl_bfs_order`` /
``crawl_dfs_order``); only binary-decode ops and the synthetic-HTML-web
loop variants remain rows-only.

Implementations live in roddy_spark/plans/contract.py; the engine itself is
the roddy_spark package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from roddy_spark.plans import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: canonical URL synthesis →
    first-occurrence dedup → visited anti-join → deny-regex filter →
    per-host politeness window rank (the crawl admission pipeline,
    SURVEY.md §2.2/§2.5, expressed declaratively)."""
    return contract.q_frontier_admission(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
