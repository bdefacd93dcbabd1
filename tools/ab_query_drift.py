"""Generic interleaved A/B for ONE query between HEAD and a baseline
build (replaces the pair-join-specific tools/ab_pairjoin_drift.py,
which produced AB_DRIFT_r08.json before being generalized and removed
— three invocations of this tool reproduce it; VERDICT r10 ask #4).

Cross-session bench numbers on this host carry ±15-25% noise (PERF.md
§Round 8), so a per-query regression claim is only admissible from
alternating fresh-JVM children on one quiet host: A B | B A | ...
(the mirrored order cancels monotonic host drift), each child timing
ONLY the query under test (warmup pass + N timed warm reps with GC
between, bench.py's warm protocol minus the preceding suite).

Usage:
    git worktree add .worktrees/<name> <baseline-sha>
    python tools/ab_query_drift.py --query part_copurchase_components \
        --baseline .worktrees/r09 [--reps 4] [--pairs 3] [--out AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Version-agnostic child: imports whatever build sits at cwd, warms
# up, then times `reps` warm executions of the one query.
CHILD = r"""
import gc, json, os, sys, time
sys.path.insert(0, os.getcwd())
from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

name = os.environ["AB_QUERY"]
sf_dir = os.environ["AB_SF_DIR"]
reps = int(os.environ["AB_REPS"])
spark = get_spark(app_name="ab-query-child")

def mat(df):
    df.write.format("noop").mode("overwrite").save()

def clean():
    gc.collect()
    spark._jvm.System.gc()

mat(QUERY_REGISTRY[name](spark, sf_dir))  # codegen + IO warmup
times = []
for _ in range(reps):
    clean()
    t0 = time.perf_counter()
    mat(QUERY_REGISTRY[name](spark, sf_dir))
    times.append(round(time.perf_counter() - t0, 3))
print("AB_RESULT " + json.dumps(times))
spark.stop()
"""


def run_child(build_dir: str, query: str, sf_dir: str, reps: int) -> list[float]:
    env = dict(os.environ, AB_QUERY=query, AB_SF_DIR=sf_dir, AB_REPS=str(reps))
    proc = subprocess.run(
        [sys.executable, "-c", CHILD],
        cwd=build_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = next(
        (
            ln[len("AB_RESULT ") :]
            for ln in reversed(proc.stdout.splitlines())
            if ln.startswith("AB_RESULT ")
        ),
        None,
    )
    if proc.returncode != 0 or line is None:
        raise RuntimeError(
            f"child in {build_dir} failed rc={proc.returncode}: "
            f"{proc.stderr[-500:]}"
        )
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--baseline", required=True, help="worktree dir of the baseline build")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    base = os.path.abspath(args.baseline)
    if not os.path.isdir(base):
        sys.exit(f"missing baseline worktree {base} — git worktree add it first")
    builds = {"head": REPO, "base": base}

    samples: dict[str, list[float]] = {b: [] for b in builds}
    for pair_i in range(args.pairs):
        order = ["head", "base"] if pair_i % 2 == 0 else ["base", "head"]
        for b in order:
            print(f"# pair {pair_i} running {b} ...", flush=True)
            samples[b].extend(run_child(builds[b], args.query, args.sf_dir, args.reps))

    summary = {
        b: {
            "median": round(statistics.median(v), 3),
            "mean": round(statistics.fmean(v), 3),
            "min": min(v),
            "max": max(v),
        }
        for b, v in samples.items()
    }
    summary["head_over_base_median"] = round(
        summary["head"]["median"] / summary["base"]["median"], 3
    )
    report = {
        "query": args.query,
        "baseline_dir": base,
        "sf_dir": args.sf_dir,
        "reps_per_child": args.reps,
        "pairs": args.pairs,
        "samples": samples,
        "summary": summary,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
