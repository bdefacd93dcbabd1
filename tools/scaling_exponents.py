"""Measured scaling exponents for the most expensive queries
(VERDICT r6 ask #7): run each at sf0.001 / sf0.01 / sf0.1 (100× data
span) in ONE session, take the median of 3 warm runs per point, and
fit the log-log slope. A slope near 2 on a pair-join query is the
100×-scale-up red flag; a slope near 0 means the sf0.1 cost is stage
latency, not data.

    python tools/scaling_exponents.py            # prints the table

Methodology notes:
- WARM medians, not one-shots: codegen compile is constant in SF and
  would flatten every slope at the small end.
- The 3-point fit AND the 0.01→0.1 two-point slope are both
  reported: at sf0.001 most of these plans bottom out at per-stage
  scheduling latency (~0.2-0.4 s), so the tail slope is the
  informative one for extrapolation; the 3-point fit shows how much
  latency floor is in the curve.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

# the warm-median top of BENCH_DETAIL_r06 + the pair-join dedup
# family the verdict names as the quadratic candidates
QUERIES = [
    "top_similar_customer_pairs",
    "ngram_duplicate_pairs",
    "minhash_duplicate_pairs",
    "fuzzy_duplicate_pairs",
    "semantic_dedup_survivors",
    "part_copurchase_components",
    "part_copurchase_pagerank",
    "pq_adc_knn",
]
SFS = [0.001, 0.01, 0.1]

# VERDICT r7 ask #5: extend the span to sf1 (10× the bench SF — the
# first point where local[32] actually saturates) for the three pair
# joins + the flagship scan. sf1 lives under the repo (bench-only,
# gitignored; recipe = tools/gen_benchdata.py, see TESTDATA.md).
# VERDICT r8 ask #4 widened the sf1 set to the expensive extended
# tier whose 100 TB story rests on cell routing (pq/ivfadc over sf1
# embeddings) and fixpoint round counts (graph queries over sf1
# lineitem), plus the stored-index build/search legs below.
SF1_QUERIES = {
    "top_similar_customer_pairs",
    "ngram_duplicate_pairs",
    "minhash_duplicate_pairs",
    "pricing_summary",
    "pq_adc_knn",
    "part_copurchase_components",
    "part_copurchase_pagerank",
    # r09 follow-on: the last two extended-tier queries without a
    # saturated point (fuzzy needs sf1 documents, semantic the r09
    # sf1 embeddings)
    "fuzzy_duplicate_pairs",
    "semantic_dedup_survivors",
}
SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1"
)


def _sf_dir(sf: float) -> str:
    if sf >= 1:
        return SF1_DIR
    return f"/root/testdata/sf{sf}"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # --queries q1,q2,... : measure an ad-hoc list instead of the
    # standing subjects (r11: scaling rows for rotation first-row
    # queries). sf1 points are taken when every table the query loads
    # exists under benchdata/sf1; the ivfadc lifecycle legs are
    # skipped in this mode.
    adhoc: list[str] | None = None
    if len(sys.argv) > 1 and sys.argv[1] == "--queries":
        # a missing/empty list must fail fast, not silently fall
        # through to the full multi-SF standing sweep (r11 self-review)
        if len(sys.argv) < 3 or not sys.argv[2].strip():
            raise SystemExit("usage: scaling_exponents.py --queries q1,q2,...")
        adhoc = [q.strip() for q in sys.argv[2].split(",") if q.strip()]
        unknown = [q for q in adhoc if q not in QUERY_REGISTRY]
        if unknown:
            raise SystemExit(f"not in registry: {unknown}")

    spark = get_spark(app_name="bdmrcs-scaling")
    import gc

    def clean() -> None:
        gc.collect()
        spark._jvm.System.gc()

    # warm the JVM + python worker pool once
    materialize(QUERY_REGISTRY["pricing_summary"](spark, "/root/testdata/sf0.01"))
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    if adhoc is not None:
        queries = adhoc
        sf1_queries = _sf1_capable(spark, adhoc)
        print(f"# sf1-capable: {sorted(sf1_queries)}", file=sys.stderr)
    else:
        queries = list(QUERIES) + [q for q in sorted(SF1_QUERIES) if q not in QUERIES]
        sf1_queries = SF1_QUERIES
    results: dict[str, dict[str, float]] = {}
    for name in queries:
        sfs = SFS + [1] if name in sf1_queries and os.path.isdir(SF1_DIR) else SFS
        per_sf: dict[str, float] = {}
        for sf in sfs:
            sf_dir = _sf_dir(sf)
            materialize(QUERY_REGISTRY[name](spark, sf_dir))  # warmup at this SF
            runs = []
            for _ in range(3):
                clean()
                t0 = time.perf_counter()
                materialize(QUERY_REGISTRY[name](spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            per_sf[str(sf)] = round(sorted(runs)[1], 3)
        results[name] = per_sf
        print(f"# {name}: {per_sf}", file=sys.stderr)

    if adhoc is None:
        results.update(ivfadc_lifecycle_points(spark, clean))
    print(json.dumps(make_report(results), indent=1))
    spark.stop()


def _sf1_capable(spark, names: list[str]) -> set[str]:
    """Queries whose plan builds successfully against benchdata/sf1 —
    i.e. every table they load exists there (sf1 carries only the
    bench-relevant tables: orders/lineitem/documents/embeddings)."""
    capable: set[str] = set()
    if not os.path.isdir(SF1_DIR):
        return capable
    for name in names:
        try:
            QUERY_REGISTRY[name](spark, SF1_DIR)
            capable.add(name)
        except Exception:  # noqa: BLE001 — missing table → no sf1 point
            pass
    return capable


def ivfadc_lifecycle_points(spark, clean) -> dict[str, dict[str, float]]:
    """sf-scaling for the stored-index legs bench.py times one-shot:
    build (parquet write, cell-partitioned) and search (cell-pruned
    read). Not registry queries, so measured here with the bench's
    exact parameters (n_cells=16, dim=64, m=8, pq_k=16, iters=2) —
    the slope, not the constant, is what the 100 TB claim rests on
    (VERDICT r8 ask #4). Median of 3 per point; search gets a warmup,
    build cannot (it IS a write job) so its first rep carries any
    residual compile cost — acceptable, identical across SFs."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        vectorops as VO,
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import (
        load_table,
    )

    sfs = SFS + ([1] if os.path.isdir(SF1_DIR) else [])
    build: dict[str, float] = {}
    search: dict[str, float] = {}
    for sf in sfs:
        emb = load_table(spark, _sf_dir(sf), "embeddings").select(
            "vec_id", "embedding"
        )
        # Materialize the 5 probe rows ONCE per SF: the lazy
        # filter-on-emb plan would re-scan the full embeddings
        # parquet inside every timed search — an O(N) leg that would
        # bias the search slope the measurement exists to establish
        # (r9 review finding).
        probe_rows = (
            emb.filter(F.col("vec_id") < 5)
            .select(
                F.col("vec_id").alias("probe_id"),
                F.col("embedding").alias("probe_vec"),
            )
            .collect()
        )
        probes = spark.createDataFrame(
            probe_rows, "probe_id long, probe_vec array<float>"
        )
        b_runs, s_runs = [], []
        for _ in range(3):
            idx_dir = tempfile.mkdtemp(prefix="scaling-ivfadc-")
            idx_path = os.path.join(idx_dir, "idx")
            try:
                clean()
                t0 = time.perf_counter()
                VO.build_ivfadc_index(
                    emb, idx_path, n_cells=16, dim=64, m=8, pq_k=16, iters=2
                )
                b_runs.append(time.perf_counter() - t0)
                materialize(  # warmup at this SF
                    VO.ivfadc_index_search(spark, idx_path, probes, k_neighbors=10)
                )
                clean()
                t0 = time.perf_counter()
                materialize(
                    VO.ivfadc_index_search(spark, idx_path, probes, k_neighbors=10)
                )
                s_runs.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(idx_dir, ignore_errors=True)
        build[str(sf)] = round(sorted(b_runs)[1], 3)
        search[str(sf)] = round(sorted(s_runs)[1], 3)
        print(
            f"# ivfadc sf{sf}: build {build[str(sf)]} search {search[str(sf)]}",
            file=sys.stderr,
        )
    return {"ivfadc_index_build": build, "ivfadc_index_search": search}


def make_report(results: dict[str, dict[str, float]]) -> dict:
    report = {}
    for name, per_sf in results.items():
        xs = [math.log10(float(s)) for s in per_sf]
        ys = [math.log10(v) for v in per_sf.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope3 = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        t01, t10 = per_sf["0.01"], per_sf["0.1"]
        tail = math.log10(t10 / t01)  # per decade of data
        report[name] = {
            "warm_median_sec": per_sf,
            "slope_3pt": round(slope3, 3),
            "slope_tail_0.01_to_0.1": round(tail, 3),
        }
        if "1" in per_sf:  # saturated-scale decade (sf0.1 → sf1)
            report[name]["slope_tail_0.1_to_1"] = round(
                math.log10(per_sf["1"] / t10), 3
            )
    return report


if __name__ == "__main__":
    main()
