"""Per-host politeness scheduler (SURVEY.md D5/D6) — the north rule's
"salted repartition-by-domain with window-ranked priority queues".

The reference only has a GLOBAL delay + semaphore (roddy.go:683-690,
bot.go:98-104; the per-host LimitRule ancestor is stubbed out,
collector.go:104); this implements the upgraded per-host semantics: within a
micro-batch, at most ``per_host_budget`` URLs per host are released to the
fetch stage — ordered by (priority, seq), i.e. paging links first, then
discovery order — and the overflow is DEFERRED to the next batch (kept
queued, not dropped; deferred rows are already visited-marked so they skip
re-admission — SURVEY.md §7.4.3).

Skew: one mega-host would put a whole level's rows in one window partition.
The window only needs per-host ORDER, so we salt the *shuffle* (repartition
on host ⊕ salt buckets keeps upstream stages balanced) while the window
itself partitions by host; AQE's skew handling covers the residual. With a
budget B the per-host rank can also short-circuit: rows are first cut to
the top-B per (host, salt) slice — a correct upper bound since the final
per-host top-B is a subset of the union of per-salt top-Bs — shrinking the
host-window input from N_host to salt·B before the authoritative rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_split(pool: DataFrame, per_host_budget: int,
                     salt_buckets: int = 8) -> tuple[DataFrame, DataFrame]:
    """pool (url_norm, url_hash, host, depth, priority, seq) →
    (to_fetch, deferred). Budget 0 ⇒ everything fetches."""
    if not per_host_budget:
        return pool, pool.limit(0)

    # Phase 1 — salted pre-cut: rank within (host, salt). A row ranked > B
    # inside its salt slice alone already has ≥ B same-host rows ahead of it
    # in (priority, seq) order, so it cannot make the per-host top-B: defer
    # it without ever entering the per-host window. Survivors ≤ salt·B/host.
    salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets))
    pre = Window.partitionBy("host", salt).orderBy("priority", "seq")
    tagged = pool.withColumn("__pre", F.row_number().over(pre))
    survivors = tagged.filter(F.col("__pre") <= per_host_budget).drop("__pre")
    cut_early = tagged.filter(F.col("__pre") > per_host_budget).drop("__pre")

    # Phase 2 — authoritative per-host rank over the bounded survivor set
    w = Window.partitionBy("host").orderBy("priority", "seq")
    ranked = survivors.withColumn("__rank", F.row_number().over(w))
    to_fetch = ranked.filter(F.col("__rank") <= per_host_budget).drop("__rank")
    deferred = (ranked.filter(F.col("__rank") > per_host_budget)
                .drop("__rank").unionByName(cut_early))
    return to_fetch, deferred
