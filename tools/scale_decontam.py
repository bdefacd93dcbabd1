"""Measured scaling for the incremental-decontamination tier
(r14; re-measured r15 after the single-pass probe fix — the ADVICE
r14 no-rederivation item: hits pinned, denominator re-gram pruned to
flagged docs).

The persisted benchmark gram index claims corpus-side near-linearity
(stored grams broadcast into the corpus explode; nothing corpus-sized
shuffles beyond the doc-gram relation) and benchmark-side O(bench)
builds/upserts. Measure the corpus claim: probe wall at sf0.01 /
sf0.1 / sf1 documents (500 → 50,000 docs, 100× span) against a FIXED
benchmark index, warm medians of 3 in one session, log-log slopes —
the ``tools/scaling_exponents.py`` methodology (warm, not one-shot:
codegen compile is constant in SF and would flatten every slope at
the small end). The build leg is timed once per point over the same
fixed benchmark to show it is corpus-independent.

    python tools/scale_decontam.py      # → SCALING_DECONTAM_r16.json
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    decontam_index as DC,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [
    (0.01, "/root/testdata/sf0.01/documents.parquet"),
    (0.1, "/root/testdata/sf0.1/documents.parquet"),
    (1.0, os.path.join(REPO, "benchdata", "sf1", "documents.parquet")),
]


def main() -> None:
    spark = get_spark(app_name="scale-decontam")
    idx_dir = tempfile.mkdtemp(prefix="scale_dc_")

    out: dict = {"build_s_per_point": {}, "points": {}, "slopes": {}}
    per_sf = {}
    for sf, p in POINTS:
        # per-point benchmark: that corpus's OWN doc_id<50 slice —
        # bench size is ~constant (50 docs) across the 100× corpus
        # span, so the index stays benchmark-sized at every point and
        # every probe has real collisions to count (a cross-SF fixed
        # bench shares no grams with the other generators' text)
        d = spark.read.parquet(p)
        bench = d.filter(F.col("doc_id") < 50).select(
            F.col("source").alias("bench_id"), "text"
        )
        corpus = d.filter(F.col("doc_id") >= 50)
        path = os.path.join(idx_dir, f"idx_{sf}")
        t0 = time.perf_counter()
        DC.build_decontam_index(bench, path)
        out["build_s_per_point"][str(sf)] = round(time.perf_counter() - t0, 3)
        DC.decontam_index_overlaps(spark, path, corpus).count()  # warm
        walls, n = [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = DC.decontam_index_overlaps(spark, path, corpus).count()
            walls.append(time.perf_counter() - t0)
        per_sf[sf] = {"median_s": round(statistics.median(walls), 3), "flagged": n}
        print(f"probe sf{sf}: {per_sf[sf]} (build {out['build_s_per_point'][str(sf)]} s)")
    out["points"]["index_probe"] = per_sf
    xs = [math.log10(sf) for sf, _ in POINTS]
    ys = [math.log10(per_sf[sf]["median_s"]) for sf, _ in POINTS]
    k = len(xs)
    slope3 = (k * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        k * sum(x * x for x in xs) - sum(xs) ** 2
    )
    tail = (ys[2] - ys[1]) / (xs[2] - xs[1])
    out["slopes"]["index_probe"] = {
        "fit3": round(slope3, 3),
        "tail_0.1_to_1": round(tail, 3),
    }
    print(f"slopes: {out['slopes']['index_probe']}")
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)
    dst = os.path.join(REPO, "SCALING_DECONTAM_r16.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
