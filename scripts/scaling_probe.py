#!/usr/bin/env python
"""Box-scaling probe — attributes the 8→32 scaling gap (VERDICT r4 item 1).

Runs two Spark-free workloads in K pinned worker PROCESSES (no GIL, no JVM,
no shuffle — nothing the engine controls) and reports aggregate throughput
at each K:

  * ``canon``: the engine's pure-Python URL-canonicalize kernel over a
    fixed synthetic batch — string/allocator/memory-bandwidth heavy,
    the exact per-row work of the level's dominant stage.
  * ``alu``: a tight integer loop with an L1-resident working set —
    pure execution units, no memory traffic.

If ``canon`` itself stops scaling past 8 processes while ``alu`` holds,
the limit is the box's shared memory subsystem, not the engine; if both
collapse, it is host-level vCPU contention. Either way the engine's plan
is exonerated for that fraction — a real N→4N-executor cluster multiplies
boxes (memory channels and all), not workers on one box.

Usage: python scripts/scaling_probe.py [K ...]   (default: 1 8 32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N_URLS = 200_000
ALU_ITERS = 30_000_000


def _mk_urls(n: int) -> list[str]:
    return [
        f"HTTP://H{i % 64}.TEST/cat{i % 37}/page{i}?q={i % 101}&r=2#frag"
        for i in range(n)
    ]


def _canon_worker(cpu: int, secs: float, out):
    os.sched_setaffinity(0, {cpu})
    import pandas as pd

    from roddy_spark.functions.urlkernel import canonicalize_series
    urls = pd.Series(_mk_urls(N_URLS))
    done = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        canonicalize_series(urls)
        done += len(urls)
    out.put(done / (time.time() - t0))


def _alu_worker(cpu: int, secs: float, out):
    os.sched_setaffinity(0, {cpu})
    done = 0
    t0 = time.time()
    x = 1
    while time.time() - t0 < secs:
        for _ in range(ALU_ITERS // 1000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        done += ALU_ITERS // 1000
    out.put(done / (time.time() - t0))


def run(worker, k: int, secs: float = 12.0) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(i, secs, q)) for i in range(k)]
    for p in procs:
        p.start()
    # A worker that dies before putting (e.g. an import failure inside
    # _canon_worker) must surface as an error, not a forever-blocked
    # q.get() stalling bench's launch until its subprocess timeout
    # (ADVICE r5): bound each get well past the measurement window and
    # report which workers died and how.
    rates = []
    for _ in procs:
        try:
            rates.append(q.get(timeout=secs * 3 + 30))
        except Exception:
            break
    if len(rates) < len(procs):
        # exitcode None = still running (hung), nonzero = died — name both;
        # terminate + join so no zombies outlive the probe in the parent
        dead = [(p.pid, p.exitcode) for p in procs if p.exitcode not in
                (0, None)]
        hung = [p.pid for p in procs if p.exitcode is None]
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=5)
        raise RuntimeError(
            f"probe workers failed: got {len(rates)}/{len(procs)} results, "
            f"dead (pid, exitcode): {dead}, hung pids: {hung}")
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if sys.argv[1:2] == ["--canon"]:
        # single canon-rate sample for bench.py's post-run contemporaneous
        # probe: a fresh subprocess (not a fork of the Spark driver, which
        # still carries py4j threads after spark.stop()) pinned by the
        # inherited affinity mask. Prints ONE number.
        k, secs = int(sys.argv[2]), float(sys.argv[3])
        print(round(run(_canon_worker, k, secs=secs), 1))
        return
    ks = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    res = {"ks": ks, "canon_per_sec": {}, "alu_per_sec": {}}
    for k in ks:
        res["canon_per_sec"][str(k)] = round(run(_canon_worker, k), 1)
    for k in ks:
        res["alu_per_sec"][str(k)] = round(run(_alu_worker, k), 1)
    if len(ks) >= 2:
        lo, hi = min(ks), max(ks)
        for name in ("canon_per_sec", "alu_per_sec"):
            r = res[name]
            res[name.replace("_per_sec", f"_eff_{lo}_{hi}")] = round(
                (r[str(hi)] / r[str(lo)]) / (hi / lo), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
