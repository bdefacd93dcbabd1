"""Bench-only sf1 data generator (VERDICT r7 ask #5).

`/root/testdata` tops out at sf0.1 and is read-only, so the
saturated-scale bench point has to be generated locally. This tool
writes `benchdata/sf{N}` under the repo root (gitignored) with the
same schema and seed discipline as the driver's tables — every value
is a pure function of (row id, column seed) through xxhash64, so the
output is deterministic across runs and machines, generated
DISTRIBUTED (Spark expressions only, no driver-side RNG or collect).

Scope: ONLY the tables the scaling-exponent queries touch —
`orders`, `lineitem` (pricing_summary, top_similar_customer_pairs),
`documents` (minhash/ngram_duplicate_pairs). Distributions mimic the
sf0.1 testdata where it matters for those plans (row ratios, basket
sizes, token vocabulary, dup rate, value ranges); see TESTDATA.md
"bench-only sf1" for the measured targets and the acknowledged
deviations (lines-per-order max 7 vs 17; no near-dup clusters beyond
exact dups).

    python tools/gen_benchdata.py          # sf1 (~1 GB raw) → benchdata/sf1
    python tools/gen_benchdata.py --sf 0.3 # any other scale
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MILLION = 1_000_000


def _u(*cols, seed: int):
    """Deterministic uniform [0, 1) from xxhash64 of the inputs."""
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(MILLION)) / MILLION


def _pick(arr: list[str], u):
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]), (F.floor(u * len(arr)) + 1).cast("int")
    )


def gen_orders(spark, n_orders: int, n_customers: int):
    base = spark.range(n_orders).withColumnRenamed("id", "o_orderkey")
    epoch_1995 = 788918400  # 1995-01-01 UTC
    return base.select(
        "o_orderkey",
        F.floor(_u(F.col("o_orderkey"), seed=1) * n_customers).alias("o_custkey"),
        _pick(["O", "P", "F"], _u(F.col("o_orderkey"), seed=2)).alias("o_orderstatus"),
        F.round(900 + _u(F.col("o_orderkey"), seed=3) * 104100, 2).alias("o_totalprice"),
        F.timestamp_seconds(
            epoch_1995
            + F.floor(_u(F.col("o_orderkey"), seed=4) * 2404) * 86400
        ).alias("o_orderdate"),
        _pick(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            _u(F.col("o_orderkey"), seed=5),
        ).alias("o_orderpriority"),
    )


def gen_lineitem(orders, n_parts: int, n_suppliers: int):
    # 1..7 lines per order (avg 4, matching the testdata's 4.08)
    k = F.col("o_orderkey")
    ln = F.col("l_linenumber")
    exploded = orders.select(
        k,
        "o_orderdate",
        F.explode(
            F.sequence(F.lit(1), (1 + F.pmod(F.xxhash64(k, F.lit(10)), 7)).cast("int"))
        ).alias("l_linenumber"),
    )
    return exploded.select(
        k.alias("l_orderkey"),
        F.floor(_u(k, ln, seed=11) * n_parts).alias("l_partkey"),
        F.floor(_u(k, ln, seed=12) * n_suppliers).alias("l_suppkey"),
        ln,
        (1 + F.floor(_u(k, ln, seed=13) * 50)).cast("double").alias("l_quantity"),
        F.round(900 + _u(k, ln, seed=14) * 104100, 2).alias("l_extendedprice"),
        F.round(F.floor(_u(k, ln, seed=15) * 11) / 100, 2).alias("l_discount"),
        F.round(F.floor(_u(k, ln, seed=16) * 9) / 100, 2).alias("l_tax"),
        _pick(["A", "N", "R"], _u(k, ln, seed=17)).alias("l_returnflag"),
        _pick(["O", "F"], _u(k, ln, seed=18)).alias("l_linestatus"),
        (F.col("o_orderdate") + F.make_dt_interval(
            F.floor(_u(k, ln, seed=19) * 120).cast("int")
        )).alias("l_shipdate"),
    )


# the 30-token vocabulary observed in the driver's documents table
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]


def gen_documents(spark, n_docs: int):
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    d = F.col("doc_id")
    # ~0.2% exact duplicates: every 500th block's last doc repeats the
    # block head's text (testdata sf0.1: 8/5000)
    seed_id = F.when(F.pmod(d, 500) == 499, d - 499).otherwise(d).alias("seed_id")
    with_seed = base.select(d, seed_id)
    s = F.col("seed_id")
    n_words = (8 + F.pmod(F.xxhash64(s, F.lit(20)), 86)).cast("int")
    word = lambda i: F.when(  # noqa: E731
        F.pmod(F.xxhash64(s, i, F.lit(22)), 1000) < 1, F.lit("dup")
    ).otherwise(
        F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            (F.pmod(F.xxhash64(s, i, F.lit(21)), 30) + 1).cast("int"),
        )
    )
    text = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), n_words), word)
    ).alias("text")
    lang_u = _u(s, seed=23)
    lang = (
        F.when(lang_u < 0.412, "en")
        .when(lang_u < 0.562, "zh")
        .when(lang_u < 0.711, "es")
        .when(lang_u < 0.859, "fr")
        .otherwise("de")
        .alias("lang")
    )
    source = F.concat(F.lit("src"), F.floor(_u(s, seed=24) * 20)).alias("source")
    return with_seed.select(F.col("doc_id"), text, lang, source).withColumn(
        "n_chars", F.length("text")
    )


def gen_embeddings(spark, n_vecs: int, dim: int = 64, n_labels: int = 10):
    """Unit-norm float32 vectors with label-centered cluster structure,
    mimicking testdata's embeddings (64-dim, 10 labels, ||v|| = 1) so
    IVF cell routing sees realistic skew. Pure Spark expressions —
    per-component hashes, normalized via HOF aggregate; no driver RNG."""
    base = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    label = F.pmod(F.xxhash64("vec_id", F.lit(30)), F.lit(n_labels)).cast("int")
    with_label = base.select("vec_id", label.alias("label"))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    u = lambda *cols, seed: (  # noqa: E731 — uniform [-1, 1)
        F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(MILLION)) / (MILLION / 2.0) - 1.0
    )
    raw = F.transform(
        idx,
        lambda i: u(F.col("label"), i, seed=31) * 0.8
        + u(F.col("vec_id"), i, seed=32) * 0.6,
    )
    with_raw = with_label.withColumn("_raw", raw)
    norm = F.sqrt(
        F.aggregate("_raw", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    emb = F.transform("_raw", lambda x: (x / norm).cast("float"))
    return with_raw.select("vec_id", emb.alias("embedding"), "label")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf
    out = args.out or os.path.join(REPO, "benchdata", f"sf{sf:g}")
    spark = get_spark(app_name="bdmrcs-gen-benchdata")

    n_orders = int(1_500_000 * sf)
    n_customers = int(150_000 * sf)
    n_parts = int(200_000 * sf)
    n_suppliers = int(10_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)  # testdata: 2,000 at sf0.1

    orders = gen_orders(spark, n_orders, n_customers)
    orders.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    orders = spark.read.parquet(os.path.join(out, "orders.parquet"))
    gen_lineitem(orders, n_parts, n_suppliers).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    gen_documents(spark, n_docs).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    gen_embeddings(spark, n_vecs).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    for t in ("orders", "lineitem", "documents", "embeddings"):
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
