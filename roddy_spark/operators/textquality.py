"""Statistical quality filtering for training-data pipelines: the
Gopher/MassiveText token-level repetition rules (``repetition_stats``)
and CCNet-style language-model perplexity scoring (``lm_crossentropy``).
Documents dominated by a few repeated n-grams are boilerplate/SEO spam;
documents a reference-corpus LM finds surprising are noise/gibberish —
both get filtered before training. No counterpart in the reference
crawler (coghost/roddy) — this is pipeline-brief scope like
textdedup/similarity — but both ARE DuckDB-oracled: contract entries
``repetition_stats`` and ``lm_perplexity`` hash-check every value
against independent SQL twins.

Scale shape: ZERO shuffles. Repetition metrics are a pure per-document
function, so they are computed row-local with JVM higher-order functions
(sort the doc's n-gram array, one linear run-length scan via
``F.aggregate``) inside whole-stage codegen — no explode, no
aggregation exchange, no join. A first draft used
explode → groupBy(id, gram) → groupBy(id) → join-back; that ships every
n-gram of the corpus through two shuffles to compute numbers each row
already contains, and its join-back only broadcasts at toy scale. At
100 TB the row-local form is embarrassingly parallel and reads/writes
nothing but the documents scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from roddy_spark.functions import text as T


def _run_length_stats(grams: Column) -> Column:
    """One linear pass over a SORTED string array → struct(max_c, dup_c):
    the highest occurrence count of any element, and the number of
    elements belonging to values occurring more than once. Equal values
    are adjacent after the sort, so counts are run lengths. The ""
    sentinel for ``prev`` is safe: grams are built from non-empty
    tokens, so no gram is the empty string."""
    acc0 = F.struct(F.lit("").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("max_run"),
                    F.lit(0).alias("dup"))

    def step(acc, x):
        same = acc["prev"] == x
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["max_run"])
            .otherwise(F.greatest(acc["max_run"], acc["run"]))
            .alias("max_run"),
            (acc["dup"] + F.when(~same & (acc["run"] > 1), acc["run"])
             .otherwise(F.lit(0))).alias("dup"))

    def finish(acc):
        return F.struct(
            F.greatest(acc["max_run"], acc["run"]).alias("max_c"),
            (acc["dup"] + F.when(acc["run"] > 1, acc["run"])
             .otherwise(F.lit(0))).alias("dup_c"))

    return F.aggregate(grams, acc0, step, finish)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2,
                     top_frac_threshold: float = 0.20,
                     dup_frac_threshold: float = 0.50) -> DataFrame:
    """Per-document n-gram repetition metrics + a ``repetitive`` flag.

    Returns one row per input doc:
      - ``total_ngrams``  — number of word n-grams (0 for docs < n tokens)
      - ``top_ngram_frac``  — occurrences of the single most frequent
        n-gram / total (Gopher's "top n-gram fraction", token-count form)
      - ``dup_ngram_frac``  — occurrences belonging to n-grams that appear
        more than once / total ("duplicated n-gram fraction")
      - ``repetitive``  — top_ngram_frac > top_frac_threshold OR
        dup_ngram_frac > dup_frac_threshold

    Docs too short to form an n-gram come out 0.0/0.0/false (too-short is
    a LENGTH rule's business, not a repetition rule's).
    """
    grams = F.array_sort(T.word_ngrams(text_col, n))
    total = F.size(grams)
    st = _run_length_stats(grams)
    denom = F.greatest(total, F.lit(1))
    out = df.select(
        F.col(id_col),
        total.cast("long").alias("total_ngrams"),
        (st["max_c"] / denom).cast("double").alias("top_ngram_frac"),
        (st["dup_c"] / denom).cast("double").alias("dup_ngram_frac"))
    return out.withColumn(
        "repetitive",
        (F.col("top_ngram_frac") > top_frac_threshold)
        | (F.col("dup_ngram_frac") > dup_frac_threshold))


def unigram_lm(ref: DataFrame, text_col: str = "text",
               vocab_size: int = 500) -> DataFrame:
    """Unigram language model from a reference corpus: the ``vocab_size``
    most frequent whitespace tokens with their counts (ties broken by
    token, so the model is deterministic at any parallelism). The cap is
    the scale contract: the model is FIXED-SIZE regardless of reference
    size, so it always broadcasts. Columns: (token, tok_count)."""
    toks = ref.select(F.explode(T.tokens(text_col)).alias("token"))
    return (toks.groupBy("token").agg(F.count("*").alias("tok_count"))
            .orderBy(F.col("tok_count").desc(), "token")
            .limit(vocab_size))


def lm_crossentropy(docs: DataFrame, ref: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    vocab_size: int = 500,
                    threshold: float = 4.93) -> DataFrame:
    """CCNet-style perplexity filtering: score each document's tokens
    against an add-one-smoothed unigram LM trained on ``ref`` (CCNet
    trains KenLM on Wikipedia and drops the high-perplexity tail; same
    shape, closed-form model so DuckDB can re-derive it exactly).

    Per doc: ``xent_bits`` = mean over tokens of
    ``log2(T + V + 1) - log2(count(token) + 1)`` where T = total count
    and V = vocab size of the retained model (the +1 mass covers OOV),
    rounded to 4 decimals; ``hi_perplexity`` = rounded value > threshold
    (computed from the ROUNDED value so both engines flag identically).
    Zero-token docs score 0.0 / false.

    Scale shape: the model build shuffles only the REFERENCE corpus
    (tiny vs the 100 TB scoring corpus) and distributed-TakeOrdereds the
    top-K; scoring is explode → broadcast hash join (model ≤ vocab_size
    rows, broadcast explicitly) → one partial-aggregated groupBy on the
    doc id — exploded token rows never leave their input partition, so
    the only exchange carries ~one row per document. ``explode_outer``
    keeps empty docs in-band: no second pass or join-back over the
    corpus."""
    model = unigram_lm(ref, text_col, vocab_size)
    stats = model.agg(
        F.sum("tok_count").cast("double").alias("lm_total"),
        F.count("*").cast("double").alias("lm_vocab"))
    tok = docs.select(
        F.col(id_col), F.explode_outer(T.tokens(text_col)).alias("token"))
    scored = (tok.join(F.broadcast(model), "token", "left")
              .join(F.broadcast(stats)))
    surprisal = (
        F.log2(F.col("lm_total") + F.col("lm_vocab") + F.lit(1.0))
        - F.log2(F.coalesce(F.col("tok_count"), F.lit(0)).cast("double")
                 + F.lit(1.0)))
    per_doc = scored.groupBy(id_col).agg(
        F.count("token").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("token").isNotNull(), surprisal)).alias("_s"))
    out = per_doc.select(
        F.col(id_col), F.col("n_tokens"),
        F.round(F.coalesce(F.col("_s") / F.col("n_tokens"), F.lit(0.0)),
                4).alias("xent_bits"))
    return out.withColumn("hi_perplexity", F.col("xent_bits") > threshold)


def nb_quality_score(docs: DataFrame, good_ref: DataFrame,
                     bad_ref: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", vocab_size: int = 500,
                     threshold: float = 0.0) -> DataFrame:
    """DCLM/fastText-style contrastive quality filter as Naive-Bayes
    log-odds: two add-one-smoothed unigram LMs — one trained on a
    known-good reference (Wikipedia in the production recipe), one on a
    known-bad slice (raw crawl) — and each document scores the mean over
    tokens of log2 P(t|good) - log2 P(t|bad). Positive means the good
    model explains the document better. ``good`` flags score > threshold
    (computed from the 4-decimal-rounded score so engines agree).

    Scale shape: both models are fixed-size broadcasts (vocab cap =
    the scale contract, as in lm_crossentropy); scoring is explode →
    two broadcast joins → one partial-aggregated groupBy on the doc id,
    so only ~one row per document crosses the exchange."""
    gm = unigram_lm(good_ref, text_col, vocab_size) \
        .withColumnRenamed("tok_count", "g_cnt")
    bm = unigram_lm(bad_ref, text_col, vocab_size) \
        .withColumnRenamed("tok_count", "b_cnt")
    gs = gm.agg(F.sum("g_cnt").cast("double").alias("g_total"),
                F.count("*").cast("double").alias("g_vocab"))
    bs = bm.agg(F.sum("b_cnt").cast("double").alias("b_total"),
                F.count("*").cast("double").alias("b_vocab"))
    tok = docs.select(
        F.col(id_col), F.explode_outer(T.tokens(text_col)).alias("token"))
    scored = (tok.join(F.broadcast(gm), "token", "left")
              .join(F.broadcast(bm), "token", "left")
              .join(F.broadcast(gs)).join(F.broadcast(bs)))
    odds = (
        (F.log2(F.coalesce(F.col("g_cnt"), F.lit(0)).cast("double")
                + F.lit(1.0))
         - F.log2(F.col("g_total") + F.col("g_vocab") + F.lit(1.0)))
        - (F.log2(F.coalesce(F.col("b_cnt"), F.lit(0)).cast("double")
                  + F.lit(1.0))
           - F.log2(F.col("b_total") + F.col("b_vocab") + F.lit(1.0))))
    per_doc = scored.groupBy(id_col).agg(
        F.count("token").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("token").isNotNull(), odds)).alias("_s"))
    out = per_doc.select(
        F.col(id_col), F.col("n_tokens"),
        F.round(F.coalesce(F.col("_s") / F.col("n_tokens"), F.lit(0.0)),
                4).alias("log_odds"))
    return out.withColumn("good", F.col("log_odds") > threshold)


def gopher_line_stats(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      dup_count_threshold: float = 0.30,
                      dup_char_threshold: float = 0.20) -> DataFrame:
    """The Gopher/MassiveText duplicate-LINE rules (complementing the
    n-gram rules of :func:`repetition_stats`): fraction of lines that
    are repeats of an earlier line, and fraction of characters living in
    such repeated lines; pages past either threshold are boilerplate
    listings/chat logs and get flagged. ZERO shuffle — `array_distinct`
    keeps first occurrences, so both fractions are row-local array
    arithmetic; the fractions are exact integer divisions, so the DuckDB
    twin (contract `line_repetition`) matches bitwise."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"),
                    lambda l: F.trim(l)),
        lambda l: l != "")
    uniq = F.array_distinct(lines)
    chars = F.aggregate(lines, F.lit(0),
                        lambda acc, l: acc + F.length(l))
    uchars = F.aggregate(uniq, F.lit(0),
                         lambda acc, l: acc + F.length(l))
    n, un = F.size(lines), F.size(uniq)
    out = docs.select(
        F.col(id_col),
        n.cast("int").alias("n_lines"),
        ((n - un).cast("double")
         / F.greatest(n, F.lit(1)).cast("double")).alias("dup_line_frac"),
        ((chars - uchars).cast("double")
         / F.greatest(chars, F.lit(1)).cast("double"))
        .alias("dup_char_frac"))
    return out.withColumn(
        "line_repetitive",
        (F.col("dup_line_frac") > dup_count_threshold)
        | (F.col("dup_char_frac") > dup_char_threshold))
