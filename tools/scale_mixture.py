"""Measured scaling for the r15 mixture-materialization tier.

Claim under test: ``materialize_mixture`` is map-side only (broadcast
allocation + generator explode + hash-gate filter — zero data
shuffles), so wall should track the SCAN and the materialized row
count (~2× the corpus at the 2×-budget recipe), never a shuffle of
corpus text. The allocation itself is one #groups-sized aggregate.

Method: warm medians of 3 in one session at sf0.01 / sf0.1 / sf1
documents (500 → 50,000 docs, 100× span), log-log slopes — the
``tools/scaling_exponents.py`` methodology.

    python tools/scale_mixture.py   # → SCALING_MIXTURE_r15.json
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    corpus as CO,
    mixture as MX,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [
    (0.01, "/root/testdata/sf0.01/documents.parquet"),
    (0.1, "/root/testdata/sf0.1/documents.parquet"),
    (1.0, os.path.join(REPO, "benchdata", "sf1", "documents.parquet")),
]


def _slope(per_sf: dict[float, float]) -> dict[str, float]:
    xs = [math.log10(sf) for sf, _ in POINTS]
    ys = [math.log10(per_sf[sf]) for sf, _ in POINTS]
    k = len(xs)
    fit = (k * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        k * sum(x * x for x in xs) - sum(xs) ** 2
    )
    tail = (ys[2] - ys[1]) / (xs[2] - xs[1])
    return {"fit3": round(fit, 3), "tail_0.1_to_1": round(tail, 3)}


def _materialize_leg(spark, path):
    d = spark.read.parquet(path)
    budget = 2 * d.agg(F.sum("n_chars")).collect()[0][0]
    tplan = CO.temperature_mix_plan(d, "lang", "n_chars", alpha=0.5)
    alloc = MX.epoch_allocation(tplan, budget=budget, group_col="lang")
    return MX.materialize_mixture(
        d, alloc, group_col="lang", id_col="doc_id", seed="mix"
    )


def main() -> None:
    spark = get_spark(app_name="scale-mixture")
    out: dict = {"points": {}, "slopes": {}}

    per_sf: dict[float, dict] = {}
    for sf, p in POINTS:
        _materialize_leg(spark, p).count()  # warm
        walls, n = [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = _materialize_leg(spark, p).count()
            walls.append(time.perf_counter() - t0)
        per_sf[sf] = {"median_s": round(statistics.median(walls), 3), "rows": n}
        print(f"materialize_mixture sf{sf}: {per_sf[sf]}")
    out["points"]["materialize_mixture"] = {str(sf): v for sf, v in per_sf.items()}
    out["slopes"]["materialize_mixture"] = _slope(
        {sf: v["median_s"] for sf, v in per_sf.items()}
    )
    print(f"materialize_mixture slopes: {out['slopes']['materialize_mixture']}")

    dst = os.path.join(REPO, "SCALING_MIXTURE_r15.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
