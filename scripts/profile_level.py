#!/usr/bin/env python
"""Per-stage profile of one frontier level at a pinned core count.

Runs bench.py's ``frontier_level_throughput`` exactly as the scaling pair
does (same pinning, same session confs, same warmup), then dumps every job
and stage of the timed run from the Spark UI REST API (the profile session
re-enables the UI): wall time between job submission and completion,
per-stage task counts, executor run/CPU time, JVM GC time, shuffle bytes.
The dump is what attributes a non-scaling fraction (VERDICT r4 item 1) to
a named stage instead of a guess.

Usage: python scripts/profile_level.py CORES RUNS SCALE_WEB SMALL_WEB PAIR_4N
Prints one JSON line per run: {"cores": N, "secs": ..., "jobs": [...]}.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _ts(s: str | None) -> float | None:
    if not s:
        return None
    return datetime.datetime.strptime(
        s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.load(r)


def dump_jobs(spark, min_job_id: int) -> list[dict]:
    base = (spark.sparkContext.uiWebUrl + "/api/v1/applications/"
            + spark.sparkContext.applicationId)
    jobs = _get(base, "/jobs?status=succeeded") + _get(
        base, "/jobs?status=failed")
    stages = {s["stageId"]: s for s in _get(base, "/stages")}
    out = []
    for j in jobs:
        if j["jobId"] < min_job_id:
            continue
        sub, comp = _ts(j.get("submissionTime")), _ts(j.get("completionTime"))
        jd = {
            "job": j["jobId"],
            "name": (j.get("name") or "")[:120],
            "wall_s": round(comp - sub, 2) if sub and comp else None,
            "tasks": j.get("numTasks"),
            "stages": [],
        }
        for sid in j.get("stageIds", []):
            s = stages.get(sid)
            if s is None or s.get("status") == "SKIPPED":
                continue
            ssub = _ts(s.get("firstTaskLaunchedTime"))
            scomp = _ts(s.get("completionTime"))
            jd["stages"].append({
                "stage": sid,
                "name": (s.get("name") or "")[:90],
                "tasks": s.get("numCompleteTasks"),
                "wall_s": round(scomp - ssub, 2) if ssub and scomp else None,
                "run_s": round(s.get("executorRunTime", 0) / 1000, 1),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "gc_s": round(s.get("jvmGcTime", 0) / 1000, 1),
                "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            })
        out.append(jd)
    return sorted(out, key=lambda d: d["job"])


def build_session_with_ui(cores: int, scan_bytes: int,
                          shuffle_partitions: int):
    from roddy_spark.session import build_session as bs
    extra = {"spark.ui.enabled": "true"}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/roddy_spark_local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    extra["spark.sql.files.maxPartitionBytes"] = str(scan_bytes)
    extra["spark.sql.files.openCostInBytes"] = str(64 * 1024)
    spark = bs(app_name=f"roddy-prof-{cores}", cores=cores,
               shuffle_partitions=shuffle_partitions, extra_conf=extra)
    bench.warmup(spark, cores)
    return spark


def main() -> None:
    cores, runs = int(sys.argv[1]), int(sys.argv[2])
    scale_web, small_web = sys.argv[3], sys.argv[4]
    pair_4n = int(sys.argv[5])
    os.sched_setaffinity(0, set(range(cores)))
    spark = build_session_with_ui(
        cores, bench._scan_split_bytes(scale_web, pair_4n),
        shuffle_partitions=pair_4n * 4)
    bench.warm_level(spark, small_web)

    def max_job_id():
        try:
            return max((j["job"] for j in dump_jobs(spark, 0)), default=-1)
        except Exception:
            return -1

    for _ in range(runs):
        spark._jvm.System.gc()
        first = max_job_id() + 1
        t0 = time.time()
        r = bench.frontier_level_throughput(spark, scale_web)
        total = time.time() - t0
        jobs = dump_jobs(spark, first)
        print(json.dumps({"cores": cores, "secs": round(total, 2),
                          "level": r, "jobs": jobs}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
