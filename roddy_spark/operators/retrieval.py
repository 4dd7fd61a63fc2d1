"""Keyword retrieval over the corpus: BM25 scoring and top-k. The crawl
side of the engine produces documents; debugging a 100 TB corpus (why is
this page in the training set? what does the dedup cluster around query X
look like?) needs keyword search over it. Okapi BM25 with the Lucene
idf variant. No counterpart in the reference crawler — pipeline-brief
scope — DuckDB-oracled (contract entry ``bm25``).

Scale shape: ZERO explode, zero UDF. The query is a handful of terms, so
per-document term frequencies are row-local JVM higher-order-function
expressions over the token array (``size(filter(toks, = term))``) — the
corpus scan stays one WholeStageCodegen pass, no (doc, term) exchange.
The corpus statistics the formula needs (N, avgdl, per-term doc
frequencies) reduce to ONE partial-aggregated global aggregate whose
single row broadcasts back via cross join; top-k is a distributed
TakeOrdered, never a full sort.

Determinism contract: scores round to 4 decimals and the ordering ties
break on doc id, so the top-k SET is engine- and parallelism-stable.
Float constants are injected from Python ``repr`` so the Spark and SQL
expressions evaluate identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from roddy_spark.functions import text as T


def _idf(n: Column, df: Column) -> Column:
    # Lucene BM25 idf: ln(1 + (N - df + .5)/(df + .5)) — positive always
    return F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of query terms.

    Returns (id_col, score) ordered by (score DESC, id). ``score`` is
    rounded to 4 decimals; ties resolve by id, so the result is a pure
    function of the corpus."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    base = (docs.select(F.col(id_col), T.tokens(text_col).alias("toks"))
            .withColumn("dl", F.size("toks")))
    def _eq(term: str):
        lit = F.lit(term)
        # single-arg lambda: a 2-arg one would receive (element, INDEX)
        return lambda x: x == lit

    tf_cols = []
    for i, term in enumerate(query_terms):
        base = base.withColumn(
            f"tf_{i}", F.size(F.filter("toks", _eq(term))))
        tf_cols.append(f"tf_{i}")
    # materialize the NARROW per-doc stats once (id, dl, one int per
    # term): the global-stats aggregate and the scoring pass both need
    # them, and without this checkpoint each is a separate full scan
    # that re-tokenizes the corpus — tokenization is ~all of the
    # per-row cost (guide §2.3: don't compute things twice to avoid
    # storing a few bytes). Eager localCheckpoint also truncates the
    # plan so the TakeOrdered runs over the materialized rows.
    base = base.drop("toks").localCheckpoint(eager=True)
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(c) > 0).cast("long")).cast("double")
          .alias(f"df_{i}") for i, c in enumerate(tf_cols)])
    scored = base.crossJoin(F.broadcast(stats))
    # double literals from the same Python floats the SQL twin injects
    # via repr (repr round-trips, so both engines see identical bits)
    c_k1p1, c_k1, c_b, c_1mb = (float(k1 + 1), float(k1), float(b),
                                float(1 - b))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        part = (_idf(F.col("n_docs"), F.col(f"df_{i}"))
                * (tf * F.lit(c_k1p1))
                / (tf + F.lit(c_k1)
                   * (F.lit(c_1mb)
                      + F.lit(c_b) * F.col("dl") / F.col("avgdl"))))
        score = part if score is None else score + part
    return (scored.select(F.col(id_col),
                          F.round(score, 4).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def bm25_sql_twin(query_terms: list[str], k: int = 20, k1: float = 1.2,
                  b: float = 0.75, table: str = "documents",
                  toks_expr: str | None = None) -> str:
    """Portable-SQL twin of :func:`bm25_topk` over ``table`` (DuckDB
    dialect for the token split), kept next to the operator so the two
    expression shapes can't drift apart."""
    toks = toks_expr or ("list_filter(string_split(lower(text), ' '), "
                         "t -> t != '')")
    tf_defs = ",\n  ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(query_terms))
    df_defs = ",\n  ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}"
        for i in range(len(query_terms)))
    c_k1p1, c_k1, c_b, c_1mb = (repr(k1 + 1), repr(k1), repr(b),
                                repr(1 - b))
    parts = " + ".join(
        f"(ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (tf_{i}::DOUBLE * {c_k1p1}::DOUBLE)"
        f" / (tf_{i}::DOUBLE + {c_k1}::DOUBLE * ({c_1mb}::DOUBLE"
        f" + {c_b}::DOUBLE * dl / s.avgdl)))"
        for i in range(len(query_terms)))
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
base AS (
  SELECT doc_id, len(toks) AS dl,
  {tf_defs}
  FROM t),
s AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
  {df_defs}
  FROM base)
SELECT doc_id, round({parts}, 4) AS score
FROM base CROSS JOIN s
ORDER BY score DESC, doc_id LIMIT {k}
"""
