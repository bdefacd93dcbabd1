"""Measured scaling for the r14/r15 packing + lineage tiers.

Claims under test:

- ``spfhp_pack_assignments``: the driver sees only the LENGTH
  HISTOGRAM (bounded by capacity), so corpus growth should cost one
  extra groupBy + the per-length window + broadcast join — near-linear
  wall, constant driver state.
- ``slice_lineage_manifest``: two per-slice XOR-fingerprint
  aggregations whose exchange carries one row per slice — wall should
  track the SCAN, not the slice count.

Method: warm medians of 3 in one session at sf0.01 / sf0.1 / sf1
documents (500 → 50,000 docs, 100× span), log-log slopes — the
``tools/scaling_exponents.py`` methodology.

    python tools/scale_packing_lineage.py   # → SCALING_PACKING_r15.json
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
from big_data_movie_recommendation_and_customer_segmentation_spark.functions import (
    textops as TX,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    lineage as LN,
    packing as PK,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [
    (0.01, "/root/testdata/sf0.01/documents.parquet"),
    (0.1, "/root/testdata/sf0.1/documents.parquet"),
    (1.0, os.path.join(REPO, "benchdata", "sf1", "documents.parquet")),
]
CAP = 512  # covers every generator's token range; histogram stays bounded


def _slope(per_sf: dict[float, float]) -> dict[str, float]:
    xs = [math.log10(sf) for sf, _ in POINTS]
    ys = [math.log10(per_sf[sf]) for sf, _ in POINTS]
    k = len(xs)
    fit = (k * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        k * sum(x * x for x in xs) - sum(xs) ** 2
    )
    tail = (ys[2] - ys[1]) / (xs[2] - xs[1])
    return {"fit3": round(fit, 3), "tail_0.1_to_1": round(tail, 3)}


def main() -> None:
    spark = get_spark(app_name="scale-packing-lineage")
    out: dict = {"points": {}, "slopes": {}}

    legs = {
        "spfhp_assignments": lambda d: PK.spfhp_pack_assignments(
            d.select("doc_id", TX.token_count("text").alias("n_tokens")).filter(
                (F.col("n_tokens") >= 1) & (F.col("n_tokens") <= CAP)
            ),
            "doc_id",
            "n_tokens",
            CAP,
        ),
        "lineage_manifest": lambda d: LN.slice_lineage_manifest(
            d, d.filter(F.col("doc_id") % 7 != 0), slice_col="source"
        ),
    }
    for leg, fn in legs.items():
        per_sf: dict[float, dict] = {}
        for sf, p in POINTS:
            d = spark.read.parquet(p)
            fn(d).count()  # warm
            walls, n = [], 0
            for _ in range(3):
                t0 = time.perf_counter()
                n = fn(d).count()
                walls.append(time.perf_counter() - t0)
            per_sf[sf] = {"median_s": round(statistics.median(walls), 3), "rows": n}
            print(f"{leg} sf{sf}: {per_sf[sf]}")
        out["points"][leg] = {str(sf): v for sf, v in per_sf.items()}
        out["slopes"][leg] = _slope({sf: v["median_s"] for sf, v in per_sf.items()})
        print(f"{leg} slopes: {out['slopes'][leg]}")

    dst = os.path.join(REPO, "SCALING_PACKING_r15.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
