"""Unit tests for the round-5 pipeline operators: association rules,
RFM/Pareto segmentation, BM25, gap fill, snapshot CDC.

Registry-level oracle parity is covered by test_oracle_queries.py;
these tests pin the operator SEMANTICS on hand-built inputs where the
expected numbers are computable by inspection, plus the plan shapes
that matter at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.association import (
    association_rules,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.corpus import (
    bm25_scores,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.segmentation import (
    revenue_pareto,
    rfm_scores,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.snapshot import (
    apply_changes,
    snapshot_diff,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.temporal import (
    gap_fill_daily,
)


# --------------------------------------------------------------------------
# Association rules
# --------------------------------------------------------------------------


def test_association_rules_known_values(spark):
    # 4 baskets: {a,b,c}, {a,b}, {a,c}, {d}
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "d")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(
        df, "basket", "item", min_pair_count=2, max_basket_size=10
    ).collect()
    rules = {(r["antecedent"], r["consequent"]): r for r in out}
    # (a,b) together in baskets 1,2; a in 3 baskets, b in 2; N=4
    ab = rules[("a", "b")]
    assert ab["pair_count"] == 2
    assert ab["support"] == pytest.approx(0.5)
    assert ab["confidence"] == pytest.approx(2 / 3, abs=1e-6)
    assert ab["lift"] == pytest.approx(2 * 4 / (3 * 2), abs=1e-6)
    # directionality: b→a has different confidence (2/2)
    assert rules[("b", "a")]["confidence"] == pytest.approx(1.0)
    # (a,c) pair_count 2 present; (b,c) only basket 1 → filtered by min 2
    assert ("a", "c") in rules and ("b", "c") not in rules


def test_association_rules_basket_governor(spark):
    # one oversize basket must contribute nothing (and shrink N)
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "x"), (3, "y"), (3, "z")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(
        df, "basket", "item", min_pair_count=1, max_basket_size=2
    ).collect()
    items = {r["antecedent"] for r in out} | {r["consequent"] for r in out}
    assert items == {"a", "b"}
    # N counts only surviving baskets (2), so support of (a,b) = 1.0
    ab = {(r["antecedent"], r["consequent"]): r for r in out}[("a", "b")]
    assert ab["support"] == pytest.approx(1.0)


def test_association_rules_dedups_repeated_lines(spark):
    # the same item twice in one basket is ONE incidence
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_pair_count=1).collect()
    ab = {(r["antecedent"], r["consequent"]): r for r in out}[("a", "b")]
    assert ab["pair_count"] == 2 and ab["confidence"] == pytest.approx(1.0)


# --------------------------------------------------------------------------
# RFM
# --------------------------------------------------------------------------


def test_rfm_scores_orders_monotone(spark):
    # 10 customers, customer i places i+1 orders of 100 each, most
    # recent order i days before the anchor.
    rows = []
    for c in range(10):
        for j in range(c + 1):
            rows.append((c, f"2024-06-{(j % 28) + 1:02d} 00:00:00", 100.0))
    df = spark.createDataFrame(rows, "cust int, ts string, amount double").select(
        "cust", F.col("ts").cast("timestamp").alias("ts"), "amount"
    )
    out = rfm_scores(df, "cust", "ts", "amount", anchor_ts="2024-07-01").collect()
    by_cust = {r["customer_id"]: r for r in out}
    # frequency and monetary are increasing in c ⇒ scores monotone non-decreasing
    for a, b in zip(range(9), range(1, 10)):
        assert by_cust[a]["f_score"] <= by_cust[b]["f_score"]
        assert by_cust[a]["m_score"] <= by_cust[b]["m_score"]
    assert all(1 <= r["r_score"] <= 5 for r in out)
    assert by_cust[9]["frequency"] == 10 and by_cust[9]["monetary"] == 1000.0
    assert set(r["rfm_segment"] for r in out) <= {
        "champion", "new", "at_risk", "hibernating", "regular"
    }


# --------------------------------------------------------------------------
# Pareto
# --------------------------------------------------------------------------


def test_revenue_pareto_shares_and_flags(spark):
    rows = [(1, 500.0), (2, 300.0), (3, 150.0), (4, 50.0)]
    df = spark.createDataFrame(rows, "cust int, amount double")
    out = {
        r["customer_id"]: r
        for r in revenue_pareto(df, "cust", "amount", threshold=0.8).collect()
    }
    assert out[1]["cum_share"] == pytest.approx(0.5)
    assert out[2]["cum_share"] == pytest.approx(0.8)
    assert out[3]["cum_share"] == pytest.approx(0.95)
    assert out[4]["cum_share"] == pytest.approx(1.0)
    # head = customers needed to REACH 80%: 1 and 2 (strictly-before < 0.8)
    assert [out[c]["head_flag"] for c in (1, 2, 3, 4)] == [1, 1, 0, 0]


def test_revenue_pareto_tiebreak_deterministic(spark):
    # equal revenues: cumulative order must follow customer_id asc
    rows = [(c, 100.0) for c in range(8)]
    df = spark.createDataFrame(rows, "cust int, amount double")
    out = revenue_pareto(df, "cust", "amount", num_buckets=3).collect()
    shares = [r["cum_share"] for r in sorted(out, key=lambda r: r["customer_id"])]
    assert shares == pytest.approx([(i + 1) / 8 for i in range(8)])


def test_revenue_pareto_no_single_partition_exchange(spark, sf_dir):
    df = entrymod.queries()["customer_revenue_pareto"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def test_bm25_ordering_and_saturation(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join filler filler"),
            (2, "spark filler filler filler filler filler"),
            (3, "filler filler filler filler filler filler"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, "doc_id", "text", ["spark", "join"]).collect()}
    assert 3 not in out  # no query term ⇒ no row
    assert out[1]["bm25"] > out[2]["bm25"]
    assert out[1]["n_matched_terms"] == 2 and out[2]["n_matched_terms"] == 1
    # tf saturation on a single term (equal doc lengths): tripling tf
    # must raise the score but NOT triple it
    one = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, "doc_id", "text", ["spark"]).collect()}
    assert one[2] < one[1] < 3 * one[2]


# --------------------------------------------------------------------------
# Gap fill
# --------------------------------------------------------------------------


def test_gap_fill_daily_semantics(spark):
    rows = [
        ("g1", "2024-01-01 10:00:00", 5.0),
        ("g1", "2024-01-04 10:00:00", 7.0),
        ("g2", "2024-01-02 09:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = gap_fill_daily(
        df,
        "ts",
        ["g"],
        {"n": F.count(F.lit(1)), "total": F.round(F.sum("v"), 2)},
        zero_fill=["n"],
        ffill=["total"],
    ).collect()
    # dense grid: 2 groups × 4 days (2024-01-01..04)
    assert len(out) == 8
    g1 = {str(r["day"]): r for r in out if r["g"] == "g1"}
    assert g1["2024-01-01"]["n"] == 1 and g1["2024-01-02"]["n"] == 0
    # forward fill across the gap, new value on re-observation
    assert g1["2024-01-02"]["total"] == 5.0 and g1["2024-01-03"]["total"] == 5.0
    assert g1["2024-01-04"]["total"] == 7.0
    # leading nulls before a group's first observation stay null
    g2 = {str(r["day"]): r for r in out if r["g"] == "g2"}
    assert g2["2024-01-01"]["total"] is None and g2["2024-01-01"]["n"] == 0
    assert g2["2024-01-02"]["total"] == 1.0 and g2["2024-01-04"]["total"] == 1.0


# --------------------------------------------------------------------------
# Snapshot CDC
# --------------------------------------------------------------------------


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", None)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 25.0), (4, "D", 40.0), (5, None, None)],
        "k int, s string, v double",
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "update", 3: "delete", 4: "insert", 5: "insert"}


def test_snapshot_diff_null_safe_compare(spark):
    # null → value and value → null are updates, null → null is unchanged
    old = spark.createDataFrame([(1, None), (2, 5.0), (3, None)], "k int, v double")
    new = spark.createDataFrame([(1, 1.0), (2, None), (3, None)], "k int, v double")
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "update", 2: "update", 3: "unchanged"}


def test_apply_changes_round_trip(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "B", 25.0), (3, "C", 30.0), (4, "D", 40.0)], "k int, s string, v double"
    )
    diff = snapshot_diff(old, new, ["k"])
    merged = apply_changes(old, diff, ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, new.collect()))


# --------------------------------------------------------------------------
# Fuzzy edit-distance dedup
# --------------------------------------------------------------------------


def test_fuzzy_edit_pairs_finds_near_dupes(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.dedup import (
        fuzzy_edit_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),   # 3 edits
            (3, "completely different text about spark engines"),
            (4, "Thé quick brown fox jumps over the lazy dog!!"),  # non-ascii/punct → same after norm
        ],
        "doc_id int, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["edit_distance"] for r in fuzzy_edit_pairs(
        docs, "doc_id", "text", max_dist=5
    ).collect()}
    assert (1, 2) in out and out[(1, 2)] == 3
    # normalization strips the accent char and punctuation: "th quick ..." vs doc1
    assert (1, 4) in out and out[(1, 4)] <= 2
    assert not any(3 in p for p in out)


def test_fuzzy_edit_pairs_band_governor(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.dedup import (
        fuzzy_edit_pairs,
    )

    # 5 identical docs: with the governor at 3 the (duplicated) band
    # overflows and yields nothing — quadratic bands are dropped.
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], "doc_id int, text string"
    )
    assert fuzzy_edit_pairs(docs, "doc_id", "text", max_band_size=3).count() == 0
    assert fuzzy_edit_pairs(docs, "doc_id", "text", max_band_size=100).count() == 10


# --------------------------------------------------------------------------
# Weighted sampling
# --------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_biased(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.corpus import (
        weighted_sample,
    )

    rows = [(i, 1.0 if i < 500 else 100.0) for i in range(600)]
    df = spark.createDataFrame(rows, "id int, w double")
    s1 = weighted_sample(df, "id", "w", k=80, seed="s").collect()
    s2 = weighted_sample(df, "id", "w", k=80, seed="s").collect()
    assert sorted(r["id"] for r in s1) == sorted(r["id"] for r in s2)  # reproducible
    assert [r["sample_rank"] for r in sorted(s1, key=lambda r: r["sample_rank"])] == list(
        range(1, 81)
    )
    # heavy items (100×weight, 100 of 600 rows) must dominate the sample
    heavy = sum(1 for r in s1 if r["id"] >= 500)
    assert heavy > 60
    # a different seed redraws
    s3 = weighted_sample(df, "id", "w", k=80, seed="other").collect()
    assert sorted(r["id"] for r in s3) != sorted(r["id"] for r in s1)


# --------------------------------------------------------------------------
# Linear trend + MAD outliers
# --------------------------------------------------------------------------


def test_group_linear_trend_exact_line(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.stats import (
        group_linear_trend,
    )

    rows = [("g", float(x), 2.0 * x + 5.0) for x in range(10)]
    rows += [("flat", float(x), 7.0) for x in range(10)]
    rows += [("one", 1.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in group_linear_trend(df, ["g"], "x", "y").collect()}
    assert out["g"]["slope"] == pytest.approx(2.0)
    assert out["g"]["intercept"] == pytest.approx(5.0)
    assert out["g"]["r2"] == pytest.approx(1.0)
    # zero y-variance: slope 0, r2 undefined → null
    assert out["flat"]["slope"] == pytest.approx(0.0)
    assert out["flat"]["r2"] is None
    # single point: no x-variance → all null
    assert out["one"]["slope"] is None and out["one"]["intercept"] is None


def test_mad_outliers_flags(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.stats import (
        mad_outliers,
    )

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 200.0]
    df = spark.createDataFrame([("a", i, v) for i, v in enumerate(vals)], "g string, i int, v double")
    out = {r["i"]: r for r in mad_outliers(df, ["g"], "v").collect()}
    assert out[6]["is_outlier"] == 1
    assert all(out[i]["is_outlier"] == 0 for i in range(6))
    assert out[0]["group_median"] == pytest.approx(10.0)


# --------------------------------------------------------------------------
# Two-stage ANN re-rank
# --------------------------------------------------------------------------


def test_ivfadc_rerank_dominates_adc_recall(spark, sf_dir):
    """Exact re-rank of a 30-candidate shortlist can never lose
    recall vs ADC-only top-10 at the same routing: any true
    neighbor in the shortlist is beaten by < 10 others under the
    exact metric, so it survives the re-rank."""
    import numpy as np

    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        vectorops as VO,
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    kw = dict(n_cells=8, n_probe_cells=4, dim=64, m=8, pq_k=16, iters=2,
              exclude_id_eq_probe=True)
    adc = VO.ivfadc_knn(e, probes, k_neighbors=10, **kw).collect()
    rr = VO.ivfadc_rerank_knn(e, probes, k_neighbors=10, shortlist=30, **kw).collect()

    vecs = {r.vec_id: np.array([float(x) for x in r.embedding]) for r in e.collect()}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    exact = {
        pid: set(
            sorted((v for v in vecs if v != pid),
                   key=lambda v: (-cos(vecs[pid], vecs[v]), v))[:10]
        )
        for pid in range(5) if pid in vecs
    }

    def recall(rows):
        by = {}
        for r in rows:
            by.setdefault(r.probe_id, set()).add(r.vec_id)
        return sum(len(by.get(p, set()) & exact[p]) / 10 for p in exact) / len(exact)

    r_adc, r_rr = recall(adc), recall(rr)
    assert r_rr >= r_adc, f"re-rank lost recall: adc={r_adc} rerank={r_rr}"
    # ranks are dense 1..k per probe
    ranks = {}
    for r in rr:
        ranks.setdefault(r.probe_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


# --------------------------------------------------------------------------
# Profiling + constraints
# --------------------------------------------------------------------------


def test_profile_numeric_stats(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.profiling import (
        profile_numeric,
    )

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 10), (3.0, None), (None, 20)], "a double, b int"
    )
    out = {r["col_name"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    a = out["a"]
    assert (a["n_rows"], a["n_nonnull"], a["n_null"], a["n_distinct"]) == (4, 3, 1, 3)
    assert (a["min"], a["max"], a["mean"]) == (1.0, 3.0, 2.0)
    assert a["stddev"] == pytest.approx(1.0)
    b = out["b"]
    assert (b["n_nonnull"], b["n_distinct"], b["min"], b["max"]) == (3, 2, 10.0, 20.0)


def test_profile_single_scan(spark, sf_dir):
    df = entrymod.queries()["orders_profile"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_check_constraints_report(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.profiling import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, None), (3, 2.0)], "k int, v double"
    )
    out = {r["check_name"]: r for r in check_constraints(
        df,
        row_checks={"v_positive": F.col("v") > 0},
        unique_keys={"k_unique": ["k"]},
    ).collect()}
    # -1.0 violates; NULL comparison is a violation too
    assert out["v_positive"]["n_violations"] == 2 and out["v_positive"]["passed"] == 0
    assert out["k_unique"]["n_violations"] == 1 and out["k_unique"]["passed"] == 0


# --------------------------------------------------------------------------
# K-fold, negative sampling, quantile bucketing
# --------------------------------------------------------------------------


def test_kfold_assign_stable_and_balanced(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.splits import (
        kfold_assign,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], "id int")
    a = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5, seed="s").collect()}
    b = {r["id"]: r["fold"] for r in kfold_assign(
        df.repartition(7), "id", 5, seed="s"
    ).collect()}
    assert a == b  # repartition-stable (randomSplit is not)
    sizes = [sum(1 for f in a.values() if f == k) for k in range(5)]
    assert all(100 < s < 300 for s in sizes), sizes
    c = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5, seed="t").collect()}
    assert a != c  # seed redraws


def test_negative_samples_k_per_user_and_unseen(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.recommend import (
        negative_samples,
    )

    cand = spark.createDataFrame(
        [(u, i) for u in range(10) for i in range(20)], "user int, item int"
    )
    out = negative_samples(cand, "user", "item", k=4, seed="x").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user"], []).append(r["item"])
    assert all(len(v) == 4 for v in per_user.values())
    # hash order differs per user (not the same 4 items for everyone)
    assert len({tuple(sorted(v)) for v in per_user.values()}) > 1


def test_quantile_bucket_monotone_and_ties(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.segmentation import (
        quantile_bucket,
    )

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    out = {r["id"]: r["bucket"] for r in quantile_bucket(df, "v", 4).collect()}
    # monotone in v, all four buckets populated, ~equal depth
    assert all(out[i] <= out[i + 1] for i in range(99))
    from collections import Counter

    depths = Counter(out.values())
    assert set(depths) == {1, 2, 3, 4} and all(20 <= d <= 30 for d in depths.values())
    # ties share a bucket
    tied = spark.createDataFrame([(i, 5.0) for i in range(10)], "id int, v double")
    tout = {r["bucket"] for r in quantile_bucket(tied, "v", 4).collect()}
    assert len(tout) == 1


# --------------------------------------------------------------------------
# Count-min sketch, histogram, mergeable profiles
# --------------------------------------------------------------------------


def test_cms_overestimates_and_merges(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    rows = [(f"k{i % 7}",) for i in range(700)]
    df = spark.createDataFrame(rows, "k string")
    keys = df.distinct()
    sk = count_min_sketch(df, "k", depth=4, width=16)
    est = {r["k"]: r["est_count"] for r in cms_estimate(sk, keys, "k", depth=4, width=16).collect()}
    assert all(est[f"k{i}"] >= 100 for i in range(7))  # one-sided bound
    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B) by cnt addition
    a = df.limit(300)
    b = df.exceptAll(a)
    sa = count_min_sketch(a, "k", depth=4, width=16)
    sb = count_min_sketch(b, "k", depth=4, width=16)
    merged = (
        sa.unionByName(sb).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_cms_absent_key_estimates_zero_not_dropped(spark):
    """r10 self-review: a probe key absent from the sketched data can
    hit buckets that were never incremented — those counters are ZERO
    by CMS semantics. The old inner join dropped the zero cells, so an
    absent key either overestimated (min over its populated-by-
    collision buckets only) or vanished from the output entirely."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    # tiny data, wide sketch → an unseen key almost surely has at
    # least one empty bucket among its depth cells
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    sk = count_min_sketch(df, "k", depth=4, width=4096)
    probes = spark.createDataFrame(
        [("a",), ("b",)] + [(f"ghost{i}",) for i in range(20)], "k string"
    )
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(sk, probes, "k", depth=4, width=4096).collect()
    }
    # every probe key appears (no dropped rows)
    assert set(est) == {"a", "b"} | {f"ghost{i}" for i in range(20)}
    assert est["a"] == 1 and est["b"] == 1
    # with 2 populated cells in 4×4096, all 20 ghosts estimate 0
    assert all(est[f"ghost{i}"] == 0 for i in range(20)), est


def test_histogram_fixed_dense_and_degenerate(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.stats import (
        histogram_fixed,
    )

    df = spark.createDataFrame([(float(v),) for v in [0, 1, 2, 3, 10]], "v double")
    out = {r["bin"]: r for r in histogram_fixed(df, "v", 5).collect()}
    assert len(out) == 5  # dense spine
    assert sum(r["bin_count"] for r in out.values()) == 5
    assert out[4]["bin_count"] == 1  # max value lands in the LAST bin
    assert out[3]["bin_count"] == 0  # empty bin visible
    assert out[0]["lo_edge"] == 0.0 and out[4]["hi_edge"] == 10.0
    # degenerate: all equal → everything in bin 0
    same = spark.createDataFrame([(5.0,)] * 4, "v double")
    sout = {r["bin"]: r["bin_count"] for r in histogram_fixed(same, "v", 5).collect()}
    assert sout[0] == 4 and all(sout[b] == 0 for b in range(1, 5))


def test_partial_profiles_merge_equals_direct(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.profiling import (
        merge_profiles,
        profile_numeric,
        profile_numeric_partial,
    )

    rows = [("a", float(i)) for i in range(10)] + [("b", float(i * 3)) for i in range(7)]
    df = spark.createDataFrame(rows, "shard string, v double")
    direct = {r["col_name"]: r for r in profile_numeric(df, ["v"]).collect()}
    merged = {r["col_name"]: r for r in merge_profiles(
        profile_numeric_partial(df, ["v"], "shard")
    ).collect()}
    d, m = direct["v"], merged["v"]
    for f in ("n_rows", "n_nonnull", "min", "max", "mean", "stddev"):
        assert m[f] == pytest.approx(d[f]), f


# --------------------------------------------------------------------------
# Skyline
# --------------------------------------------------------------------------


def test_skyline_2d_known_front_and_ties(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.stats import (
        skyline_2d,
    )

    rows = [
        (1, 1, 9.0),   # front (smallest x)
        (2, 3, 5.0),   # front
        (3, 5, 2.0),   # front
        (4, 4, 9.5),   # dominated by 2
        (5, 5, 2.0),   # duplicate of 3 → BOTH stay (neither dominates)
        (6, 5, 3.0),   # dominated by 3 (equal x, higher y)
        (7, 6, 2.0),   # dominated by 3 (higher x, equal y)
        (8, 2, 9.0),   # dominated by 1 (higher x, equal y)
    ]
    df = spark.createDataFrame(rows, "id int, x int, y double")
    out = {r["id"]: r["on_skyline"] for r in skyline_2d(df, "x", "y", "id", num_buckets=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0, 5: 1, 6: 0, 7: 0, 8: 0}


def test_skyline_no_single_partition_exchange(spark, sf_dir):
    df = entrymod.queries()["part_skyline"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]
