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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from roddy_spark.functions import text as T


def _fold_udf(spark, table: dict[str, float], default: float):
    """Vectorized scorer: per document, LEFT-TO-RIGHT fold of the
    per-token contribution over the token array in document order.

    The contribution values are PRECOMPUTED IN THE JVM (same log2
    bits as the r6 expression shape); Python only adds IEEE doubles in
    a fixed order — bit-identical to the same fold on any engine — and
    the dict lookup is O(1) where a Spark ``element_at(map, k)`` is a
    linear scan of the whole vocab per token (measured 1.4× slower at
    sf0.1 and linearly worse with corpus size). The dict is a fixed-size
    sparkContext broadcast (≤ 2·vocab_size entries — the vocab cap is
    the scale contract), shipped once per executor."""
    bc = spark.sparkContext.broadcast(table)

    @F.pandas_udf("double")
    def _ssum(toks: pd.Series) -> pd.Series:
        get = bc.value.get

        def fold(ts):
            if ts is None:
                return 0.0
            s = 0.0
            for t in ts:
                s = s + get(t, default)
            return s

        return toks.map(fold)

    return _ssum


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
    Zero-token docs score 0.0 / false. One output row per input row.

    Scale shape + determinism contract (r7, ADVICE r6): the model build
    shuffles only the REFERENCE corpus (tiny vs the 100 TB scoring
    corpus) and distributed-TakeOrdereds the top-K; the retained model
    collects to the driver as exact integer counts (bounded by the vocab
    cap), the per-token surprisal table is computed ONCE with libm log2
    (bitwise the oracle's log2 — the JVM's differs in the last ulp on
    ~28% of integer inputs, the class of drift that flips a 4-decimal
    rounding boundary), and scoring is ONE vectorized Arrow stage that
    folds each doc's token array left-to-right in document order against
    the broadcast dict. Zero explode, zero join, zero exchange of the
    corpus; the per-doc FP sum is a fixed in-order fold — bit-identical
    at any parallelism or partition count and the same accumulation
    order as the DuckDB twin's per-group scan-order sum. The previous
    explode → broadcast-join → groupBy(doc) shape left both the log2
    bits and the signed-double reduction order to the engine
    (CORRECTNESS_r06 ``nb_quality`` hash flake)."""
    import math

    # bounded driver collect (≤ vocab_size rows of exact INTEGER counts —
    # fixed-size by the vocab-cap scale contract); the surprisal doubles
    # are then computed with libm log2 (math.log2), the SAME libm the
    # DuckDB oracle calls — the JVM's Log2 differs from libm in the last
    # ulp on ~28% of integer inputs (measured), which is exactly the
    # class of difference that flips a 4-decimal rounding boundary
    # (the CORRECTNESS_r06 nb_quality hash flake)
    model = {r["token"]: int(r["tok_count"])
             for r in unigram_lm(ref, text_col, vocab_size).collect()}
    norm = math.log2(sum(model.values()) + len(model) + 1.0)
    table = {t: norm - math.log2(c + 1.0) for t, c in model.items()}
    default = norm - math.log2(1.0)
    ssum = _fold_udf(docs.sparkSession, table, default)

    toks = T.tokens(text_col)
    n_tok = F.size(toks)
    out = docs.select(
        F.col(id_col), n_tok.cast("long").alias("n_tokens"),
        F.round(F.when(n_tok > 0, ssum(toks) / n_tok).otherwise(F.lit(0.0)),
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

    Scale shape + determinism contract (r7, ADVICE r6 HIGH): both
    models collect to the driver as exact integer counts (bounded by
    the vocab cap), the per-token log-odds table is computed ONCE with
    libm log2 (bitwise the oracle's log2 — the JVM's drifts a last ulp
    on ~28% of integer inputs), and every document scores in ONE
    vectorized Arrow stage folding its token array left-to-right in
    document order against the broadcast dict. Zero explode, zero
    per-token join, zero exchange of the corpus. The per-doc sum of
    SIGNED doubles (cancellation makes 4-decimal rounding boundaries
    likelier here than in the all-positive lm_crossentropy sum) is a
    fixed in-order fold — bit-identical at any parallelism or
    shuffle-partition count and the same accumulation order as the
    DuckDB twin's per-group scan-order sum — where the previous
    explode → broadcast-join → groupBy(doc) shape left both the log2
    bits and the reduction order to the engine (the CORRECTNESS_r06
    ``nb_quality`` hash-mismatch). One output row per input row."""
    import math

    # ONE bounded driver collect (≤ 2·vocab_size rows of exact INTEGER
    # counts); the log-odds doubles are computed with libm log2
    # (math.log2) — bitwise the log2 the DuckDB oracle calls, where the
    # JVM's Log2 drifts a last ulp on ~28% of integer inputs (the
    # CORRECTNESS_r06 nb_quality hash flake; ADVICE r6 HIGH)
    gm = unigram_lm(good_ref, text_col, vocab_size)
    bm = unigram_lm(bad_ref, text_col, vocab_size)
    rows = (gm.select(F.lit(0).alias("m"), "token", "tok_count")
            .unionByName(bm.select(F.lit(1).alias("m"), "token",
                                   "tok_count"))).collect()
    g = {r["token"]: int(r["tok_count"]) for r in rows if r["m"] == 0}
    b = {r["token"]: int(r["tok_count"]) for r in rows if r["m"] == 1}
    g_norm = math.log2(sum(g.values()) + len(g) + 1.0)
    b_norm = math.log2(sum(b.values()) + len(b) + 1.0)

    def odds(t):
        return ((math.log2(g.get(t, 0) + 1.0) - g_norm)
                - (math.log2(b.get(t, 0) + 1.0) - b_norm))

    table = {t: odds(t) for t in set(g) | set(b)}
    default = odds(None)
    ssum = _fold_udf(docs.sparkSession, table, default)

    toks = T.tokens(text_col)
    n_tok = F.size(toks)
    out = docs.select(
        F.col(id_col), n_tok.cast("long").alias("n_tokens"),
        F.round(F.when(n_tok > 0, ssum(toks) / n_tok).otherwise(F.lit(0.0)),
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
