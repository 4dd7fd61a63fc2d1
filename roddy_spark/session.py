"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the crawl workload (SURVEY.md §4): AQE on (skew joins in the
visited anti-join), Arrow on (all Python stages are pandas UDFs), and
shuffle partitions sized to the core count for local mode. On a real
cluster these come from spark-submit conf; the factory only sets ones the
engine depends on.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def build_session(app_name: str = "roddy-spark", cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or (os.cpu_count() or 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # floor scan parallelism at 2 waves per core (scale-adaptive: the
        # knob tracks cluster width, it is not a size constant) — the
        # 128 MiB default split packs a bench-scale table into a handful
        # of tasks and leaves most cores idle through every scan stage;
        # tiny inputs are unaffected (openCostInBytes still bounds
        # over-splitting of small files)
        .config("spark.sql.files.minPartitionNum",
                str(2 * (cores or (os.cpu_count() or 8))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("RODDY_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
