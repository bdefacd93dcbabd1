"""Stage-level profile of one registry query (guide §1 empirical loop).

    python tools/profile_stages.py <query_name> [sf_dir] [warm_runs]

Runs the query via the noop sink with the Spark UI enabled, then reads
per-stage metrics (executor run time, shuffle read/write bytes, input
bytes, task count) from the UI REST API for the LAST (warm) run, so the
expensive stage is identified by measurement instead of plan-reading.
Job descriptions label the runs; only the final warm run is reported.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    warm_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark(
        app_name=f"stage-profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
    )
    queries = entrymod.queries()
    if name not in queries:
        raise SystemExit(f"unknown query {name!r}")

    sc = spark.sparkContext
    # warmup: absorb JVM/codegen startup on an unrelated plan
    sc.setJobDescription("warmup")
    queries["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times = []
    for i in range(warm_runs):
        sc._jvm.System.gc()
        sc.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: runs {times}")

    app_id = sc.applicationId
    # Derive the REST base from the session's actual UI URL (ADVICE
    # r15: if port 4048 is already bound Spark auto-increments, and a
    # hardcoded URL would read a DIFFERENT application's metrics).
    ui_url = sc.uiWebUrl or "http://localhost:4048"
    base = f"{ui_url}/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    jobs = get("/jobs")
    last_desc = f"{name} run {warm_runs - 1}"
    last_jobs = [j for j in jobs if j.get("description", "") == last_desc]
    stage_ids = sorted({s for j in last_jobs for s in j["stageIds"]})
    print(f"last warm run: {len(last_jobs)} job(s), {len(stage_ids)} stage(s)")
    rows = []
    for sid in stage_ids:
        try:
            st = get(f"/stages/{sid}")
        except Exception:
            continue
        for attempt in st:
            if attempt["status"] == "SKIPPED":
                rows.append((sid, 0.0, 0, 0, 0, 0, "SKIPPED", ""))
                continue
            rows.append(
                (
                    sid,
                    attempt["executorRunTime"] / 1000.0,
                    attempt["numCompleteTasks"],
                    attempt.get("inputBytes", 0),
                    attempt.get("shuffleReadBytes", 0),
                    attempt.get("shuffleWriteBytes", 0),
                    attempt["status"],
                    attempt["name"].split("\n")[0][:70],
                )
            )
    rows.sort(key=lambda r: -r[1])
    print(
        f"{'stage':>6} {'execSec':>8} {'tasks':>6} {'inputMB':>8} "
        f"{'shRdMB':>8} {'shWrMB':>8}  name"
    )
    for sid, es, nt, ib, srb, swb, status, nm in rows:
        print(
            f"{sid:>6} {es:8.2f} {nt:>6} {ib / 1e6:8.1f} "
            f"{srb / 1e6:8.1f} {swb / 1e6:8.1f}  [{status}] {nm}"
        )
    total = sum(r[1] for r in rows)
    print(f"total executor-seconds (last warm run): {total:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
