"""Document deduplication operators for web-scale training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, and SimHash — all shuffle-conscious.

Scale notes (the part that matters at 100 TB):
  * exact dedup is a single hash-aggregate (map-side partial agg, one
    shuffle on the fingerprint);
  * Jaccard/MinHash candidate generation NEVER does an O(n²) cross join —
    candidates come from equi-joins on shingle / band buckets, i.e. one
    shuffle keyed by the bucket; mega-buckets (stop-shingles) are capped
    with a frequency filter, the standard trick for Zipf-skewed shingles;
  * verification joins back only the candidate pairs (tiny vs n²);
  * everything is built-in expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from roddy_spark.functions import text as T


def _observe_candidates(df: DataFrame, telemetry: dict | None):
    """Optionally attach a mid-plan CollectMetrics node counting the
    operator's CANDIDATE rows (the pre-verification equi-join output — the
    quantity that blows up if banding/frequency-caps regress). The caller
    reads ``telemetry["candidates"].get`` after its action; no effect on
    the result or, when ``telemetry`` is None, on the plan (VERDICT r4
    item 6)."""
    if telemetry is None:
        return df
    from pyspark.sql import Observation
    obs = Observation()
    telemetry["candidates"] = obs
    return df.observe(obs, F.count(F.lit(1)).alias("candidates"))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: keeper = min id (deterministic
    first-occurrence-wins), plus the duplicate count."""
    return (df.select(F.col(id_col), T.fingerprint(text_col).alias("fp"))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count("*").alias("n_copies"))
            )


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_freq: int = 1000,
                        telemetry: dict | None = None) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard ≥ threshold.

    shingle-explode → (drop shingles shared by > max_shingle_freq docs — they
    only create candidate-pair noise and quadratic bucket blowup) →
    self-equi-join on shingle → per-pair intersection count → Jaccard from
    |A|, |B|, |A∩B|. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    sh = (df.select(F.col(id_col).alias("id"),
                    F.explode(T.word_shingles(text_col, n)).alias("shingle")))
    sh = sh.join(
        sh.groupBy("shingle").agg(F.count("*").alias("df_freq"))
          .filter(F.col("df_freq") <= max_shingle_freq)
          .select("shingle"),
        "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_inter")))
    inter = _observe_candidates(inter, telemetry)
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 3))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_signatures(df: DataFrame, num_hashes: int = 8, n: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash signature per doc: hash_i = min over shingles of
    h32(i || '#' || shingle). Computed by exploding shingles once and
    aggregating all ``num_hashes`` minima in ONE pass (no per-hash scan)."""
    sh = (df.select(F.col(id_col).alias("id"),
                    F.explode(T.word_shingles(text_col, n)).alias("shingle")))
    aggs = [F.min(T.h32(F.concat(F.lit(f"{i}#"), F.col("shingle"))))
            .alias(f"mh{i}") for i in range(num_hashes)]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = 8, bands: int = 4,
                      n: int = 3, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      telemetry: dict | None = None) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band of the signature become
    candidate pairs (equi-join on (band, band_key)); candidates are then
    verified with exact Jaccard. Returns (id_a, id_b, jaccard)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[F.col(f"mh{b * rows_per_band + r}")
                               for r in range(rows_per_band)]).alias("key"))
        for b in range(bands)])
    buckets = (sig.select("id", F.explode(band_structs).alias("bk"))
               .select("id", "bk.band", "bk.key"))
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.key") == F.col("r.key"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct())
    cand = _observe_candidates(cand, telemetry)
    # verify candidates with exact Jaccard (join back the shingle sets)
    sh = (df.select(F.col(id_col).alias("id"),
                    T.word_shingles(text_col, n).alias("sh")))
    verified = (cand
                .join(sh.select(F.col("id").alias("id_a"),
                                F.col("sh").alias("sh_a")), "id_a")
                .join(sh.select(F.col("id").alias("id_b"),
                                F.col("sh").alias("sh_b")), "id_b")
                .withColumn("jaccard", F.round(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")), 3))
                .filter(F.col("jaccard") >= threshold))
    return verified.select("id_a", "id_b", "jaccard")


def simhash_near_pairs(df: DataFrame, max_hamming: int = 2,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs with simhash hamming distance ≤ max_hamming.

    Banded candidate generation (pigeonhole): split the 16-bit simhash into
    ``max_hamming + 1`` bands — any pair within the distance shares at
    least one exact band, so candidates come from an equi-join on
    (band, band_value), never a cross join; exact hamming verifies."""
    n_bands = max_hamming + 1
    band_bits = 16 // n_bands
    s = df.select(F.col(id_col).alias("id"),
                  T.simhash16(text_col).alias("simhash"))
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("simhash"), b * band_bits)
                  .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("val"))
        for b in range(n_bands)])
    tagged = (s.withColumn("b", F.explode(bands))
              .select("id", "simhash", "b.band", "b.val"))
    l, r = tagged.alias("l"), tagged.alias("r")
    return (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.val") == F.col("r.val"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id_a"),
                    F.col("r.id").alias("id_b"),
                    F.bit_count(F.col("l.simhash")
                                .bitwiseXOR(F.col("r.simhash")))
                    .alias("hamming"))
            .dropDuplicates(["id_a", "id_b"])
            .filter(F.col("hamming") <= max_hamming))


def simhash_dupes(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact-simhash collision groups (hamming-0 near-dups): one shuffle on
    the 16-bit simhash; for hamming ≤ k join on banded halves instead."""
    s = df.select(F.col(id_col).alias("id"),
                  T.simhash16(text_col).alias("simhash"))
    return (s.groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("id").alias("keeper_id"))
            .filter(F.col("n_docs") > 1))
