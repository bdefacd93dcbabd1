"""Controlled A/B for the pair-join warm-median drift (VERDICT r7 ask #2).

The cross-round BENCH series shows warm medians of the three pair-join
queries (top_similar_customer_pairs, minhash_duplicate_pairs,
ngram_duplicate_pairs) climbing 18-30% between r04 and r07 on code
that `git log` says is unchanged since r05. Two hypotheses:

  (a) build regression — something that shipped r04→HEAD (session
      config, registry import graph, shared subtree code) slowed the
      queries themselves;
  (b) measurement drift — bench-suite growth / JVM state / host noise
      changed WHAT the bench measures, not how fast the code is.

This harness separates them: it runs HEAD and the r04 end-of-round
build (git worktree at a95f363, `.worktrees/r04`) in ALTERNATING
fresh JVMs on one quiet host (A B / B A / A B — the mirrored order
cancels any monotonic host drift across the session), each child
measuring ONLY the three queries (warmup pass + N timed warm reps,
block-manager GC between reps, exactly bench.py's warm protocol but
with no preceding 14-query suite). If the per-query warm-median delta
reproduces here, the build regressed → bisect r04→r05. If both builds
measure the same, the drift lives in the bench harness/JVM state and
the code is exonerated.

Usage:  python tools/ab_pairjoin_drift.py [--reps 4] [--pairs 3]
Writes AB_DRIFT_r08.json next to the repo root and prints the table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = [
    "top_similar_customer_pairs",
    "minhash_duplicate_pairs",
    "ngram_duplicate_pairs",
]

# Version-agnostic child: imports whatever build sits at cwd, warms
# up, then times `reps` warm executions per query. Kept inline so the
# r04 worktree needs no file added to it.
CHILD = r"""
import gc, json, os, sys, time
sys.path.insert(0, os.getcwd())
from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

names = json.loads(os.environ["AB_QUERIES"])
sf_dir = os.environ["AB_SF_DIR"]
reps = int(os.environ["AB_REPS"])
spark = get_spark(app_name="ab-drift-child")

def mat(df):
    df.write.format("noop").mode("overwrite").save()

def clean():
    gc.collect()
    spark._jvm.System.gc()

for n in names:  # codegen + IO warmup pass
    mat(QUERY_REGISTRY[n](spark, sf_dir))
spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
    "noop").mode("overwrite").save()

out = {n: [] for n in names}
for _ in range(reps):
    for n in names:
        clean()
        t0 = time.perf_counter()
        mat(QUERY_REGISTRY[n](spark, sf_dir))
        out[n].append(round(time.perf_counter() - t0, 3))
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_child(build_dir: str, sf_dir: str, reps: int) -> dict[str, list[float]]:
    env = dict(
        os.environ,
        AB_QUERIES=json.dumps(QUERIES),
        AB_SF_DIR=sf_dir,
        AB_REPS=str(reps),
    )
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "AB_DRIFT_r08.json"))
    args = ap.parse_args()

    builds = {"head": REPO, "r04": os.path.join(REPO, ".worktrees", "r04")}
    if not os.path.isdir(builds["r04"]):
        sys.exit("missing .worktrees/r04 — run: git worktree add .worktrees/r04 a95f363")

    # mirrored interleave: A B | B A | A B | B A ... cancels linear drift
    samples: dict[str, dict[str, list[float]]] = {
        b: {q: [] for q in QUERIES} for b in builds
    }
    for pair_i in range(args.pairs):
        order = ["head", "r04"] if pair_i % 2 == 0 else ["r04", "head"]
        for b in order:
            print(f"# pair {pair_i} running {b} ...", flush=True)
            res = run_child(builds[b], args.sf_dir, args.reps)
            for q in QUERIES:
                samples[b][q].extend(res[q])

    report = {"sf_dir": args.sf_dir, "reps_per_child": args.reps,
              "pairs": args.pairs, "samples": samples, "summary": {}}
    print(f"\n{'query':34s} {'head med':>9s} {'r04 med':>9s} {'head/r04':>9s}")
    for q in QUERIES:
        mh = statistics.median(samples["head"][q])
        mr = statistics.median(samples["r04"][q])
        ratio = round(mh / mr, 3) if mr else None
        report["summary"][q] = {
            "head_median": round(mh, 3),
            "r04_median": round(mr, 3),
            "head_over_r04": ratio,
            "head_samples": samples["head"][q],
            "r04_samples": samples["r04"][q],
        }
        print(f"{q:34s} {mh:9.3f} {mr:9.3f} {ratio:9.3f}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
