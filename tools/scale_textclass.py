"""Measured scaling for the r13 text-classification/selection tier.

NB fit→classify and DSIR weights→select are claimed near-linear in
corpus size (fixed num_buckets feature space ⇒ bounded model tables;
one explode + partial-agg + broadcast joins ⇒ nothing corpus-sized
shuffles beyond the (doc, bucket) relation). Measure it: wall time at
sf0.01 / sf0.1 / sf1 documents (500 → 50,000 docs, 100× span), warm
medians of 3 in one session, log-log slopes — the methodology of
``tools/scaling_exponents.py`` (warm, not one-shot: codegen compile
is constant in SF and would flatten every slope at the small end).

    python tools/scale_textclass.py      # → SCALING_TEXTCLASS_r13.json
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
    textclass as TC,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POINTS = [
    (0.01, "/root/testdata/sf0.01/documents.parquet"),
    (0.1, "/root/testdata/sf0.1/documents.parquet"),
    (1.0, os.path.join(REPO, "benchdata", "sf1", "documents.parquet")),
]
B = 4096


def nb_leg(spark, path: str) -> int:
    d = spark.read.parquet(path)
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    cond, stats = TC.fit_nb_classifier(train, "doc_id", "text", "lang", num_buckets=B)
    return TC.nb_classify(test, cond, stats, "doc_id", "text", num_buckets=B).count()


def dsir_leg(spark, path: str) -> int:
    d = spark.read.parquet(path)
    target = d.filter(F.col("lang") == "en")
    return TC.dsir_select(d, target, "doc_id", "text", 100, seed="s", num_buckets=B).count()


def lm_leg(spark, path: str) -> int:
    d = spark.read.parquet(path)
    ref = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    uni, bi, n_tok = TC.fit_bigram_lm(ref, "doc_id", "text", num_buckets=B)
    return TC.lm_score_docs(
        test, uni, bi, n_tok, "doc_id", "text", num_buckets=B
    ).count()


def main() -> None:
    spark = get_spark(app_name="scale-textclass")
    legs = {
        "nb_fit_classify": nb_leg,
        "dsir_weights_select": dsir_leg,
        "lm_fit_score": lm_leg,
    }
    out: dict = {"num_buckets": B, "points": {}, "slopes": {}}
    for name, fn in legs.items():
        per_sf = {}
        for sf, path in POINTS:
            fn(spark, path)  # warm (codegen + parquet footers)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = fn(spark, path)
                walls.append(time.perf_counter() - t0)
            per_sf[sf] = {"median_s": round(statistics.median(walls), 3), "rows": n}
            print(f"{name} sf{sf}: {per_sf[sf]}")
        out["points"][name] = per_sf
        xs = [math.log10(sf) for sf, _ in POINTS]
        ys = [math.log10(per_sf[sf]["median_s"]) for sf, _ in POINTS]
        n_ = len(xs)
        slope3 = (n_ * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
            n_ * sum(x * x for x in xs) - sum(xs) ** 2
        )
        tail = (ys[2] - ys[1]) / (xs[2] - xs[1])
        out["slopes"][name] = {"fit3": round(slope3, 3), "tail_0.1_to_1": round(tail, 3)}
        print(f"{name} slopes: {out['slopes'][name]}")
    dst = os.path.join(REPO, "SCALING_TEXTCLASS_r13.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
