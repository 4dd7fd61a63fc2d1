"""Line-level corpus cleaning (the C4 / RefinedWeb recipe): global line
deduplication and the C4 line/document quality rules. No counterpart in
the reference crawler (coghost/roddy hands bodies to callbacks) — this is
pipeline-brief scope like textdedup/textquality — and both operators are
DuckDB-oracled (contract entries ``line_dedup`` and ``c4_filters``).

Scale shapes:

- ``dedup_lines`` is the skew-hardened form of "keep each line's first
  global occurrence". The naive window over the normalized line
  (``row_number() OVER (PARTITION BY line)``) melts on hot boilerplate
  lines ("follow us on twitter" appears on half the web, so one reducer
  gets half the corpus). Instead the winner per line is computed with
  ``groupBy(line).agg(min_by(...))`` — partial aggregation collapses every
  hot key to ONE row per map task before the exchange, so the shuffle
  carries ~one row per distinct line per partition regardless of skew,
  and no join back is needed: the aggregated winners ARE the kept lines.
  Two exchanges total (by line, then by doc for reassembly), both
  partial-aggregated; nothing document-sized crosses unsharded.
- ``c4_quality_filters`` is ZERO-shuffle: every rule (terminal
  punctuation, words-per-line, sentence count, lorem-ipsum/brace page
  drops) is a row-local JVM higher-order-function expression — a pure
  project over the scan, no explode, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lines match after lowercasing + whitespace collapse, the form C4's
# three-sentence-span dedup and RefinedWeb's exact-line dedup both use
_WS = r"\s+"


def _norm_line(c: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(c)), _WS, " ")


def dedup_lines(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep, for every distinct normalized line in the corpus, only its
    first global occurrence — ordered by (doc id, line position) — and
    reassemble each document from its surviving lines in original order.

    Returns (id_col, text, n_lines, n_kept); documents whose lines were
    all duplicates elsewhere come back with text='' / n_kept=0. Documents
    containing only empty lines are dropped (C4 drops empty pages).
    """
    lines = (docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("line_no", "line"))
        .withColumn("norm", _norm_line(F.col("line")))
        .filter(F.col("norm") != ""))
    # one surviving row per distinct line; min_by merges map-side, so a
    # boilerplate line on 10^9 pages still ships one candidate per task
    winners = (lines.groupBy("norm")
               .agg(F.min_by(F.struct("id", "line_no", "line"),
                             F.struct("id", "line_no")).alias("w"))
               .select("w.id", "w.line_no", "w.line"))
    kept = (winners.groupBy("id")
            .agg(F.count("*").cast("int").alias("n_kept"),
                 F.concat_ws("\n", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("line_no", "line"))),
                     lambda s: s["line"])).alias("text")))
    counts = (lines.groupBy("id")
              .agg(F.count("*").cast("int").alias("n_lines")))
    return (counts.join(kept, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("text", F.lit("")).alias("text"),
                    "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept")))


def c4_quality_filters(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_words_per_line: int = 5,
                       min_sentences: int = 3) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2), deterministic and
    row-local: retain only lines that end in a terminal punctuation mark
    (``.!?"``) and have at least ``min_words_per_line`` whitespace words;
    then flag the page for dropping unless the retained text has at least
    ``min_sentences`` sentence-ending marks, and drop any page whose
    ORIGINAL text mentions "lorem ipsum" or contains a curly brace.

    Returns (id_col, text, n_lines, n_kept, n_sentences, keep_doc) where
    text is the retained lines joined by newline.
    """
    raw_lines = F.split(F.col(text_col), "\n")
    is_good = (lambda l: (F.trim(l).rlike('[.!?"]$'))
               & (F.size(F.filter(F.split(F.trim(l), _WS),
                                  lambda w: w != ""))
                  >= min_words_per_line))
    kept_arr = F.filter(raw_lines, is_good)
    # NB: transform(col, F.trim) would call trim(element, index) — the
    # deprecated two-arg trimStr form — so the lambda must be explicit
    kept_txt = F.concat_ws("\n", F.transform(kept_arr,
                                             lambda l: F.trim(l)))
    nonempty = F.filter(raw_lines, lambda l: F.trim(l) != "")
    out = docs.select(
        F.col(id_col),
        kept_txt.alias("text"),
        F.size(nonempty).cast("int").alias("n_lines"),
        F.size(kept_arr).cast("int").alias("n_kept"),
        (F.length(kept_txt)
         - F.length(F.translate(kept_txt, ".!?", ""))).cast("int")
        .alias("n_sentences"),
        ((F.length(kept_txt)
          - F.length(F.translate(kept_txt, ".!?", ""))) >= min_sentences)
        .alias("_enough"),
        (~F.lower(F.col(text_col)).contains("lorem ipsum")
         & ~F.col(text_col).contains("{")
         & ~F.col(text_col).contains("}")).alias("_clean"))
    return (out.withColumn("keep_doc", F.col("_enough") & F.col("_clean"))
            .drop("_enough", "_clean"))
