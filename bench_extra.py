#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py is FROZEN for the
driver's measurement; this sidecar exists so per-change before/after
numbers and plan captures don't touch it — guide §1.4/§1.5).

Per contract query: min-of-N ``.count()`` wall time (the frozen bench's
methodology) plus an optional ``.explain("formatted")`` capture to
``plans/r07/<query>_<label>.txt``. Jobs are labelled for the UI.

Usage:
  python bench_extra.py                          # all queries, 3 reps
  python bench_extra.py --queries bm25,pagerank  # subset
  python bench_extra.py --plans before           # also write plan files
  python bench_extra.py --out /tmp/base.json
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import time

os.environ.setdefault("RODDY_DRIVER_MEM", "32g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default="",
                    help="label; writes plans/r07/<q>_<label>.txt")
    ap.add_argument("--out", default="")
    ap.add_argument("--sink", choices=["count", "noop"], default="count")
    args = ap.parse_args()

    os.sched_setaffinity(0, set(range(CPUS)))
    import bench
    from roddy_spark.plans import contract
    spark = bench.build_session(CPUS)

    names = ([q.strip() for q in args.queries.split(",") if q.strip()]
             or list(bench.QUERY_NAMES))
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r07")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    out = {"sf_dir": SF_DIR, "sink": args.sink, "queries": {}, "rows": {}}
    for name in names:
        fn = contract.QUERIES[name]
        if args.plans:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir,
                                   f"{name}_{args.plans}.txt"), "w") as f:
                f.write(buf.getvalue())
        best, n = None, 0
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out["queries"][name] = round(best, 3)
        out["rows"][name] = n
        print(f"{name}: {best:.3f}s rows={n}", flush=True)
    total = round(sum(out["queries"].values()), 3)
    out["total"] = total
    print(json.dumps({"total": total, "queries": out["queries"]}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
