"""Rolling parquet scratch for iterative-fixpoint round state.

``localCheckpoint`` pins blocks in executor STORAGE MEMORY and the pinned
lineage grows with round count on deep iterations (VERDICT r3 item 6).
This is the alternative the engine's fixpoints share (DFS preorder,
connected components): write + re-read each round truncates the plan, each
named frame keeps exactly ONE on-disk version, and rolling a new version
deletes the superseded one (safe: the write action that produced the new
version was the last reader of the old). Disk is bounded by the live state
size and executor storage stays flat at any round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class _Scratch:
    """One live parquet version per named frame; see module docstring."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark, self.root, self.n = spark, root, 0
        self.live: dict[str, str] = {}

    def roll(self, df: DataFrame, name: str) -> DataFrame:
        import os
        self.n += 1
        path = os.path.join(self.root, f"{name}_{self.n}")
        df.write.mode("overwrite").parquet(path)
        prev = self.live.get(name)
        if prev:
            import shutil
            shutil.rmtree(prev, ignore_errors=True)
        self.live[name] = path
        return self.spark.read.parquet(path)
