#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure
first). For each named query: time DataFrame construction and the
count() action separately over N reps, count the Spark jobs each phase
launches (statusTracker job ids), and dump .explain('formatted') to
plans/<tag>/<query>_<suffix>.txt.

Usage:
    python scripts/profile_queries.py q_a q_b ... [--reps 3]
        [--sf /root/testdata/sf0.1] [--plans r17 --suffix before]

Prints one JSON line per query:
    {"query": ..., "construct": [..], "count": [..], "jobs_construct": n,
     "jobs_count": n, "total_median": s}
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dynamodb_streaming_datalake_spark.registry import all_queries  # noqa: E402
from dynamodb_streaming_datalake_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None, help="plans/<tag> dir to dump explain into")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark(app_name="profile", extra_conf={"spark.ui.enabled": "false"})
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()

    names = []
    for n in args.queries:
        if n == "ALL_TOP":
            continue
        if n not in qs:
            print(f"unknown query {n}", file=sys.stderr)
            sys.exit(2)
        names.append(n)

    # warmup
    qs[sorted(qs)[0]](spark, args.sf).count()

    for name in names:
        cons, cnts = [], []
        jobs_c = jobs_n = 0
        for r in range(args.reps):
            def _next_job_id() -> int:
                v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
                return v if isinstance(v, int) else v.get()

            sj0 = _next_job_id()
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            t1 = time.perf_counter()
            sj1 = _next_job_id()
            df.count()
            t2 = time.perf_counter()
            sj2 = _next_job_id()
            cons.append(round(t1 - t0, 3))
            cnts.append(round(t2 - t1, 3))
            if r == args.reps - 1:
                jobs_c, jobs_n = sj1 - sj0, sj2 - sj1
        if args.plans:
            pdir = Path(__file__).resolve().parent.parent / "plans" / args.plans
            pdir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf)
            (pdir / f"{name}_{args.suffix}.txt").write_text(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print(
            json.dumps(
                {
                    "query": name,
                    "construct": cons,
                    "count": cnts,
                    "jobs_construct": jobs_c,
                    "jobs_count": jobs_n,
                    "total_median": round(
                        statistics.median(c + n for c, n in zip(cons, cnts)), 3
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
