"""roddy_spark — a PySpark-native URL-frontier + fetch scheduler.

A brand-new analytics/crawl engine with the capabilities of the reference
crawler coghost/roddy (a Go, colly-style browser crawler), re-expressed
Spark-first: the crawl loop becomes level-synchronous BFS over DataFrames —
canonicalize → admission filters → bloom+anti-join dedup (mark-at-admission)
→ per-host window-ranked politeness with deferral → vectorized fetch/extract/
decode stages (pandas/Arrow UDFs) → frontier expansion — checkpointed to a
snapshot store (Iceberg in production; parquet+manifest in this sandbox).

Reference semantics studied (not copied) from /root/reference — see SURVEY.md
for the file:line mapping of every operator.
"""

__version__ = "0.1.0"

from roddy_spark.config import CrawlConfig  # noqa: F401
