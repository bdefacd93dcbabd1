"""Survey driver-side plan-BUILD latency for the gate window.

Four plan-build chatter collapses so far (minhash r09, simhash r10,
packing-bucket r10, ewma r11) each came from the same defect class: a
Python loop constructing O(terms) Column objects at ~4 Py4J
round-trips each. This tool measures, for each gated query, the time
to construct the DataFrame and force analysis (no execution), so the
next offender is found by measurement instead of by reading code.

PERF.md §Round 8 measured ~75% of pair-join "warm time" as driver-side
plan build — at 100 TB the EXECUTION dominates, but in interactive /
many-small-queries use the build cost is the floor, and it is pure
driver-side Py4J chatter that no cluster size amortizes.

    python tools/plan_build_survey.py [--reps 3] [--top 15] [--all]
    python tools/plan_build_survey.py --json PLANBUILD_r13.json

Prints per-query median build ms, slowest first. Medians over reps
(first build per JVM pays codegen/warmup noise; reps>=3 and median
damp it). ``--json`` additionally writes the per-round artifact
(VERDICT r12 ask #2): import wall + session start + per-query build
ms/jobs, so round-over-round session-constant drift is diffed from
committed numbers instead of re-adjudicated from bench one-shots.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--all", action="store_true", help="whole registry, not just the gate window")
    ap.add_argument(
        "--headline",
        action="store_true",
        help="survey bench.HEADLINE (frozen at r01) — the cross-round drift comparator",
    )
    ap.add_argument("--json", default=None, help="write the per-round JSON artifact here")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
    args = ap.parse_args()

    # Session-constant costs the bench's one-shot leg pays per fresh
    # session: package import (registry construction, GATE_PRIORITY
    # reorder) and JVM/session start. Measured here once each.
    t0 = time.perf_counter()
    import __spark_entry__ as entrymod
    import_wall_ms = (time.perf_counter() - t0) * 1000

    from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
    from big_data_movie_recommendation_and_customer_segmentation_spark.plans import GATE_PRIORITY

    t0 = time.perf_counter()
    spark = get_spark(app_name="plan-build-survey")
    session_start_ms = (time.perf_counter() - t0) * 1000
    queries = entrymod.queries()
    if args.headline:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in queries]
    elif args.all:
        names = list(queries)
    else:
        names = [n for n in GATE_PRIORITY if n in queries]

    if not names:
        sys.exit("no queries in selected window — check --headline/--all vs registry")

    # warm the session (parquet footer caches, first-plan JIT)
    queries[names[0]](spark, args.sf_dir)._jdf.queryExecution().analyzed()

    # A big build time means one of two very different things:
    #   jobs > 0 — the builder runs EAGER Spark work (approxQuantile
    #     boundaries, a seeded fit, an eager checkpoint): legitimate
    #     bounded driver-side compute, not a chatter defect;
    #   jobs == 0 — pure Py4J/analysis chatter: the collapsible class.
    tracker = spark.sparkContext.statusTracker()

    def _n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return (max(ids) + 1) if ids else 0

    rows = []
    for name in names:
        times = []
        jobs = 0
        for _ in range(args.reps):
            j0 = _n_jobs()
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf_dir)
            df._jdf.queryExecution().analyzed()
            times.append((time.perf_counter() - t0) * 1000)
            jobs = _n_jobs() - j0
        rows.append((statistics.median(times), jobs, name))
    rows.sort(reverse=True)

    total = sum(ms for ms, _, _ in rows)
    print(f"# import {import_wall_ms:.0f} ms, session start {session_start_ms:.0f} ms")
    print(f"# {len(rows)} queries, reps={args.reps}, total median build {total:.0f} ms")
    print(f"# {'build ms':>9}  {'jobs':>4}  query   (jobs>0 = eager compute, not chatter)")
    for ms, jobs, name in rows[: args.top]:
        print(f"{ms:9.1f}  {jobs:4d}  {name}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "import_wall_ms": round(import_wall_ms, 1),
                    "session_start_ms": round(session_start_ms, 1),
                    "total_build_ms": round(total, 1),
                    "reps": args.reps,
                    "sf_dir": args.sf_dir,
                    "window": "headline" if args.headline else ("all" if args.all else "gate"),
                    "n_queries": len(rows),
                    "queries": {
                        name: {"build_ms": round(ms, 1), "jobs": jobs}
                        for ms, jobs, name in rows
                    },
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
