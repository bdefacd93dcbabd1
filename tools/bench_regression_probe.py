"""Measure the three r02 warm regressions solo vs in-bench-order.

VERDICT r2 #3: doc_quality_scores 0.60->3.80, knn_bruteforce
0.77->3.63, chronological_split_counts 0.61->2.67 warm-median at
sf0.1 on unchanged code. Hypotheses:
  (a) localCheckpoint block pressure from earlier materialize_pairs
      queries (can only explain queries AFTER position 8);
  (b) session-level config drift (driver heap 8g->48g landed r2);
  (c) host throttling (should hit solo and in-bench alike).

Modes:
  python tools/bench_regression_probe.py solo      # fresh session, each query alone
  python tools/bench_regression_probe.py ordered   # replay bench prefix order
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

# r06 probe targets (VERDICT r5 ask #4): the two shingle-bound dedup
# queries that slipped r04→r05 (ngram 2.81→3.06 wm, minhash
# 2.66→2.81 wm) on untouched code — noise-signature, settle it.
SUSPECTS = ["ngram_duplicate_pairs", "minhash_duplicate_pairs"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, spark, runs=5):
    out = []
    for _ in range(runs):
        gc.collect()
        t0 = time.perf_counter()
        mat(QUERY_REGISTRY[name](spark, SF_DIR))
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "solo"
    spark = get_spark(app_name=f"probe-{mode}")
    mat(QUERY_REGISTRY["pricing_summary"](spark, SF_DIR))
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    results = {}
    if mode == "solo":
        for name in SUSPECTS:
            results[name] = timed(name, spark)
    else:
        import bench

        for name in bench.HEADLINE:
            runs = timed(name, spark, runs=4 if name in SUSPECTS else 2)
            if name in SUSPECTS or runs[-1] > 2.0:
                results[name] = runs
    print(json.dumps({"mode": mode, "sf_dir": SF_DIR, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
