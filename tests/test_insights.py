"""Semantics tests for the batch-3 insight operators: Kaplan-Meier,
Welch t-test, mutual information, Bloom-prefiltered semi-join, and
item-based CF recommendations — hand-computed values and invariants
the DuckDB oracle replay can't express (equivalence to the plain
semi-join, no-false-negative property, CF seen-item exclusion)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    recommend as RC,
    stats as ST,
    survival as SV,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.relational import (
    bloom_semi_join,
)


# --------------------------------------------------------------------------
# Kaplan-Meier
# --------------------------------------------------------------------------


def test_kaplan_meier_hand_example(spark):
    # Classic textbook: durations 1,2,2,3,4 with censoring at 3.
    # t=1: n=5, d=1 -> S=4/5
    # t=2: n=4, d=2 -> S=4/5 * 2/4 = 0.4
    # t=3: n=2, d=0 (censored) -> S stays 0.4
    # t=4: n=1, d=1 -> S=0
    rows = [(1, 1), (2, 1), (2, 1), (3, 0), (4, 1)]
    df = spark.createDataFrame([("g", d, e) for d, e in rows], ["g", "dur", "ev"])
    out = {
        r["dur"]: r
        for r in SV.kaplan_meier(df, "dur", "ev", "g").collect()
    }
    assert out[1]["n_at_risk"] == 5 and out[1]["survival"] == pytest.approx(0.8)
    assert out[2]["n_at_risk"] == 4 and out[2]["survival"] == pytest.approx(0.4)
    assert out[3]["n_censored"] == 1 and out[3]["survival"] == pytest.approx(0.4)
    assert out[4]["n_at_risk"] == 1 and out[4]["survival"] == 0.0


def test_kaplan_meier_all_censored_group_stays_at_one(spark):
    df = spark.createDataFrame(
        [("a", 5, 0), ("a", 9, 0), ("b", 1, 1), ("b", 2, 1)],
        ["g", "dur", "ev"],
    )
    out = SV.kaplan_meier(df, "dur", "ev", "g").collect()
    a = {r["dur"]: r["survival"] for r in out if r["g"] == "a"}
    assert a == {5: 1.0, 9: 1.0}
    b = {r["dur"]: r["survival"] for r in out if r["g"] == "b"}
    assert b[1] == pytest.approx(0.5) and b[2] == 0.0


def test_kaplan_meier_is_monotone_nonincreasing(spark, sf_dir):
    from big_data_movie_recommendation_and_customer_segmentation_spark.plans.queries_insights import (
        customer_repurchase_survival,
    )

    pdf = customer_repurchase_survival(spark, sf_dir).toPandas()
    for _, g in pdf.groupby("segment"):
        s = g.sort_values("duration_days")["survival"].tolist()
        assert all(x >= y - 1e-9 for x, y in zip(s, s[1:]))
        assert all(0.0 <= v <= 1.0 for v in s)


# --------------------------------------------------------------------------
# Welch t-test
# --------------------------------------------------------------------------


def test_welch_ttest_hand_value(spark):
    # a = [1,2,3,4] (m=2.5, s2=5/3, n=4); b = [2,4,6] (m=4, s2=4, n=3)
    a = [("a", float(v)) for v in (1, 2, 3, 4)]
    b = [("b", float(v)) for v in (2, 4, 6)]
    out = ST.welch_ttest_pairs(
        spark.createDataFrame(a + b, ["g", "v"]), "g", "v"
    ).collect()
    assert len(out) == 1
    r = out[0]
    se2 = (5 / 3) / 4 + 4 / 3
    t = (2.5 - 4) / math.sqrt(se2)
    dof = se2**2 / (((5 / 3) / 4) ** 2 / 3 + (4 / 3) ** 2 / 2)
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["welch_dof"] == pytest.approx(dof, abs=0.01)
    assert (r["group_a"], r["group_b"]) == ("a", "b")


def test_welch_ttest_identical_groups_t_zero(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)]
    r = ST.welch_ttest_pairs(spark.createDataFrame(rows, ["g", "v"]), "g", "v").first()
    assert r["t_stat"] == 0.0


def test_welch_ttest_singleton_group_null(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 2.0)]
    r = ST.welch_ttest_pairs(spark.createDataFrame(rows, ["g", "v"]), "g", "v").first()
    assert r["t_stat"] is None and r["welch_dof"] is None


# --------------------------------------------------------------------------
# Mutual information
# --------------------------------------------------------------------------


def test_mutual_information_independent_is_zero(spark):
    rows = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(10)]
    r = ST.mutual_information(spark.createDataFrame(rows, ["a", "b"]), "a", "b").first()
    assert r["mi_bits"] == pytest.approx(0.0, abs=1e-9)
    assert r["entropy_a"] == pytest.approx(1.0)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-9)


def test_mutual_information_deterministic_equals_entropy(spark):
    # b = f(a), uniform over 4 levels: MI = H(a) = H(b) = 2 bits, NMI = 1
    rows = [(str(i), str(i)) for i in range(4) for _ in range(5)]
    r = ST.mutual_information(spark.createDataFrame(rows, ["a", "b"]), "a", "b").first()
    assert r["mi_bits"] == pytest.approx(2.0)
    assert r["nmi"] == pytest.approx(1.0)
    assert r["n"] == 20


def test_mutual_information_single_level_nmi_null(spark):
    rows = [("only", b) for b in ("p", "q", "p", "q")]
    r = ST.mutual_information(spark.createDataFrame(rows, ["a", "b"]), "a", "b").first()
    assert r["entropy_a"] == 0.0 and r["nmi"] is None


# --------------------------------------------------------------------------
# Bloom-prefiltered semi-join
# --------------------------------------------------------------------------


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    urgent = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey", num_bits=512, num_hashes=3)
    want = li.join(
        urgent.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    assert got.count() == want.count()
    assert got.select("l_orderkey").subtract(want.select("l_orderkey")).count() == 0
    assert want.select("l_orderkey").subtract(got.select("l_orderkey")).count() == 0


def test_bloom_semi_join_tiny_filter_still_exact(spark):
    # num_bits=2 saturates instantly: every probe passes the Bloom
    # stage, the exact verify must still produce the right answer.
    probe = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    build = spark.createDataFrame([(7,), (42,)], ["bk"])
    out = bloom_semi_join(probe, build, "k", "bk", num_bits=2, num_hashes=2)
    assert sorted(r["k"] for r in out.collect()) == [7, 42]


def test_bloom_semi_join_empty_build(spark):
    probe = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    build = spark.createDataFrame([], "bk long")
    assert bloom_semi_join(probe, build, "k", "bk").count() == 0


def test_bloom_prefilter_is_selective(spark):
    # With ample bits the candidate stage should reject most
    # non-matching probes — measure the FP rate stays well under 50%.
    probe = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    build = spark.createDataFrame([(i,) for i in range(50)], ["bk"])
    out = bloom_semi_join(probe, build, "k", "bk", num_bits=4096, num_hashes=3)
    assert out.count() == 50  # exactness regardless of selectivity
    # selectivity probe: replicate the internal candidate filter by
    # checking how many of 2000 keys pass 3-of-3 bit membership
    from pyspark.sql import Column

    def positions(col: Column, i: int) -> Column:
        h = F.md5(F.concat(F.lit("bloom"), F.lit(str(i)), col.cast("string")))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 4096).cast("int")

    bits = {
        r["b"]
        for r in build.select(
            F.explode(F.array(*[positions(F.col("bk"), i) for i in range(3)])).alias("b")
        ).collect()
    }
    passed = (
        probe.withColumn(
            "ok",
            F.forall(
                F.array(*[positions(F.col("k"), i) for i in range(3)]),
                lambda b: b.isin(*[F.lit(x) for x in bits]) if bits else F.lit(False),
            ),
        )
        .filter("ok")
        .count()
    )
    assert passed < 2000 * 0.5


# --------------------------------------------------------------------------
# Item-based CF
# --------------------------------------------------------------------------


def test_item_cf_scores_and_excludes_seen(spark):
    hist = spark.createDataFrame(
        [("u1", "i1"), ("u1", "i2"), ("u2", "i3")], ["user", "item"]
    )
    neighbors = spark.createDataFrame(
        [
            ("i1", "i3", 0.9),
            ("i1", "i2", 0.8),  # u1 already saw i2 -> must not recommend
            ("i2", "i3", 0.4),
            ("i3", "i1", 0.9),
        ],
        ["item", "neighbor", "cosine"],
    )
    out = RC.item_cf_recommendations(
        hist, neighbors, user_col="user", item_col="item", n=5
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], {})[r["item"]] = r
    # u1: i3 scored from i1 (0.9) + i2 (0.4) = 1.3, two contributors
    assert set(by_user["u1"]) == {"i3"}
    assert by_user["u1"]["i3"]["score"] == pytest.approx(1.3)
    assert by_user["u1"]["i3"]["n_contributors"] == 2
    # u2: i1 from i3 (0.9); i3 itself is seen
    assert set(by_user["u2"]) == {"i1"}
    assert by_user["u2"]["i1"]["score"] == pytest.approx(0.9)


def test_item_cf_topn_truncates_by_score_then_id(spark):
    hist = spark.createDataFrame([("u", "s")], ["user", "item"])
    neighbors = spark.createDataFrame(
        [("s", c, w) for c, w in (("a", 0.5), ("b", 0.5), ("c", 0.9))],
        ["item", "neighbor", "cosine"],
    )
    out = RC.item_cf_recommendations(
        hist, neighbors, user_col="user", item_col="item", n=2
    ).collect()
    ranked = sorted(((r["rank"], r["item"]) for r in out))
    assert ranked == [(1, "c"), (2, "a")]  # 0.9 first, 0.5-tie broken by id


# --------------------------------------------------------------------------
# PMI collocations
# --------------------------------------------------------------------------


def test_pmi_collocations_hand_value(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import corpus as CP

    docs = spark.createDataFrame(
        [(1, "new york new york"), (2, "san francisco"), (3, "new york city")],
        ["doc_id", "text"],
    )
    out = CP.pmi_collocations(docs, "doc_id", "text", min_pair_count=1, top_n=10)
    rows = {(r["w1"], r["w2"]): r for r in out.collect()}
    # bigrams: (new,york)x3 (york,new)x1 (san,francisco)x1 (york,city)x1 -> T=6
    # unigrams: new 3, york 3, city 1, san 1, francisco 1 -> U=9
    r = rows[("new", "york")]
    assert r["pair_count"] == 3
    assert r["pmi"] == pytest.approx(math.log2((3 / 6) / ((3 / 9) * (3 / 9))), abs=1e-6)
    # hapax pair of hapax words has the max PMI: (san, francisco)
    top = min(rows.values(), key=lambda x: (-x["pmi"], x["w1"], x["w2"]))
    assert (top["w1"], top["w2"]) == ("san", "francisco")


def test_pmi_collocations_governor_filters_rare_pairs(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import corpus as CP

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], ["doc_id", "text"]
    )
    out = CP.pmi_collocations(docs, "doc_id", "text", min_pair_count=2, top_n=10)
    pairs = {(r["w1"], r["w2"]) for r in out.collect()}
    assert ("a", "b") in pairs and ("c", "d") not in pairs


# --------------------------------------------------------------------------
# Two-proportion z-test
# --------------------------------------------------------------------------


def test_two_proportion_ztest_hand_value(spark):
    rows = [("a", 1)] * 30 + [("a", 0)] * 20 + [("b", 1)] * 20 + [("b", 0)] * 30
    r = ST.two_proportion_ztest(
        spark.createDataFrame(rows, ["g", "s"]), "g", "s"
    ).first()
    # pooled p = 0.5, var = 0.25 * (2/50) = 0.01, z = 0.2/0.1 = 2.0
    assert r["rate_a"] == pytest.approx(0.6) and r["rate_b"] == pytest.approx(0.4)
    assert r["z_stat"] == pytest.approx(2.0, abs=1e-6)


def test_two_proportion_ztest_degenerate_null(spark):
    rows = [("a", 1)] * 5 + [("b", 1)] * 5
    r = ST.two_proportion_ztest(
        spark.createDataFrame(rows, ["g", "s"]), "g", "s"
    ).first()
    assert r["z_stat"] is None and r["rate_a"] == 1.0


# --------------------------------------------------------------------------
# User-based CF
# --------------------------------------------------------------------------


def test_user_cf_scores_and_excludes_seen(spark):
    hist = spark.createDataFrame(
        [("u1", "a"), ("u1", "b"), ("u2", "b"), ("u2", "c"), ("u3", "c")],
        ["user", "item"],
    )
    pairs = spark.createDataFrame(
        [("u1", "u2", 0.5), ("u2", "u3", 0.4)],
        ["user_a", "user_b", "jaccard"],
    )
    out = RC.user_cf_recommendations(
        hist, pairs, user_col="user", item_col="item", k_neighbors=10, n=5
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], {})[r["item"]] = r
    # u1's neighbor is u2 (0.5): u2 has {b, c}; b seen -> only c
    assert set(by_user["u1"]) == {"c"}
    assert by_user["u1"]["c"]["score"] == pytest.approx(0.5)
    # u2 neighbors u1 (0.5) and u3 (0.4): candidates a (from u1), c seen
    assert set(by_user["u2"]) == {"a"}
    # u3's neighbor is u2: candidate b (c seen)
    assert set(by_user["u3"]) == {"b"}
    assert by_user["u3"]["b"]["score"] == pytest.approx(0.4)


def test_user_cf_neighbor_cap_limits_contributors(spark):
    # u0 is similar to u1..u3; with k_neighbors=1 only the strongest
    # neighbor (u1, 0.9) contributes candidates.
    hist = spark.createDataFrame(
        [("u0", "x"), ("u1", "a"), ("u2", "b"), ("u3", "c")], ["user", "item"]
    )
    pairs = spark.createDataFrame(
        [("u0", "u1", 0.9), ("u0", "u2", 0.8), ("u0", "u3", 0.7)],
        ["user_a", "user_b", "jaccard"],
    )
    out = RC.user_cf_recommendations(
        hist, pairs, user_col="user", item_col="item", k_neighbors=1, n=5
    ).collect()
    u0 = [r for r in out if r["user"] == "u0"]
    assert {r["item"] for r in u0} == {"a"}


# --------------------------------------------------------------------------
# Correlation matrix + ILD
# --------------------------------------------------------------------------


def test_correlation_matrix_hand_values(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        profiling as PF,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 4.0), (3.0, 6.0, 3.0), (4.0, 8.0, None)],
        ["x", "y", "z"],
    )
    out = {(r["col_a"], r["col_b"]): r for r in PF.correlation_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")]["corr"] == pytest.approx(1.0)  # y = 2x
    assert out[("x", "y")]["n"] == 4
    # z pairs use pairwise deletion: 3 rows, z = 6 - x -> corr -1
    assert out[("x", "z")]["n"] == 3
    assert out[("x", "z")]["corr"] == pytest.approx(-1.0)


def test_correlation_matrix_zero_variance_null(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        profiling as PF,
    )

    df = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], ["x", "c"])
    r = PF.correlation_matrix(df, ["x", "c"]).first()
    assert r["corr"] is None


def test_intra_list_diversity_hand_value(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        evaluate as EV,
    )

    recs = spark.createDataFrame(
        [("u1", "a"), ("u1", "b"), ("u1", "c"), ("u2", "x")], ["user", "item"]
    )
    sims = spark.createDataFrame(
        [("a", "b", 0.8), ("b", "a", 0.8)], ["item", "neighbor", "cosine"]
    )
    r = EV.intra_list_diversity(recs, sims, user_col="user", item_col="item").first()
    # u1 pairs: (a,b)->1-0.8=0.2, (a,c)->1, (b,c)->1 => ild_u1 = 2.2/3
    # u2 has one rec -> no pairs -> excluded
    assert r["n_users"] == 1 and r["n_pairs"] == 3
    assert r["ild"] == pytest.approx(2.2 / 3, abs=1e-6)


# --------------------------------------------------------------------------
# Poisson bootstrap CI
# --------------------------------------------------------------------------


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    rows = [("g", float(i), i) for i in range(200)]
    df = spark.createDataFrame(rows, ["seg", "v", "id"])
    r1 = ST.poisson_bootstrap_mean_ci(df, "seg", "v", "id", n_replicates=20).first()
    r2 = ST.poisson_bootstrap_mean_ci(df, "seg", "v", "id", n_replicates=20).first()
    assert r1 == r2  # md5 ladder: bit-deterministic
    assert r1["n_rows"] == 200
    assert r1["ci_lo"] <= r1["boot_mean"] <= r1["ci_hi"]
    # true mean 99.5; a 95% CI on n=200 should comfortably contain it
    assert r1["ci_lo"] < 99.5 < r1["ci_hi"]
    # and the interval is not degenerate or absurdly wide (se ~ 4.1)
    assert 1.0 < r1["ci_hi"] - r1["ci_lo"] < 25.0


def test_poisson_bootstrap_weights_average_near_one(spark):
    # mean of the ladder weights over many (row, replicate) draws
    # must be ~E[Poisson(1)] = 1 (capped tail shifts it by <1e-4)
    from pyspark.sql import functions as F2

    df = spark.createDataFrame([("g", 1.0, i) for i in range(500)], ["seg", "v", "id"])
    rep = (
        df.select(F2.col("id"), F2.explode(F2.sequence(F2.lit(1), F2.lit(10))).alias("b"))
        .withColumn(
            "u",
            F2.conv(
                F2.substring(
                    F2.md5(F2.concat(F2.lit("boot"), F2.col("b").cast("string"),
                                     F2.col("id").cast("string"))), 1, 8),
                16, 10,
            ).cast("long") / F2.lit(4294967296.0),
        )
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.stats import (
        _POISSON1_CDF,
    )

    w = F2.lit(5)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F2.when(F2.col("u") < F2.lit(_POISSON1_CDF[k]), F2.lit(k)).otherwise(w)
    mean_w = rep.withColumn("w", w).agg(F2.avg("w")).first()[0]
    assert abs(mean_w - 1.0) < 0.05


# --------------------------------------------------------------------------
# Algebraic properties of the new stats ops
# --------------------------------------------------------------------------


def test_welch_antisymmetric_under_relabeling(spark):
    rows = [("a", float(v)) for v in (1, 5, 9, 2)] + [
        ("b", float(v)) for v in (3, 3, 4, 8, 1)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    t_ab = ST.welch_ttest_pairs(df, "g", "v").first()["t_stat"]
    # relabel so the lexicographic pair order flips: a->z
    flipped = df.withColumn("g", F.when(F.col("g") == "a", "z").otherwise("b"))
    t_bz = ST.welch_ttest_pairs(flipped, "g", "v").first()["t_stat"]
    assert t_ab == pytest.approx(-t_bz, abs=1e-9)


def test_mutual_information_symmetric_in_columns(spark):
    rows = [("x", "p")] * 5 + [("x", "q")] * 2 + [("y", "p")] * 1 + [("y", "q")] * 7
    df = spark.createDataFrame(rows, ["a", "b"])
    r1 = ST.mutual_information(df, "a", "b").first()
    r2 = ST.mutual_information(df, "b", "a").first()
    assert r1["mi_bits"] == pytest.approx(r2["mi_bits"], abs=1e-9)
    assert r1["nmi"] == pytest.approx(r2["nmi"], abs=1e-9)
    assert r1["entropy_a"] == pytest.approx(r2["entropy_b"], abs=1e-9)


def test_kaplan_meier_no_censoring_equals_empirical_survival(spark):
    durs = [1, 1, 2, 3, 3, 3, 5, 8, 8, 13]
    df = spark.createDataFrame([("g", d, 1) for d in durs], ["g", "dur", "ev"])
    out = SV.kaplan_meier(df, "dur", "ev", "g").collect()
    n = len(durs)
    for r in out:
        empirical = sum(1 for d in durs if d > r["dur"]) / n
        assert r["survival"] == pytest.approx(empirical, abs=1e-9), r["dur"]


# --------------------------------------------------------------------------
# Containment near-dup
# --------------------------------------------------------------------------


def test_containment_catches_truncation_jaccard_misses(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        dedup as DD,
    )

    long = " ".join(f"word{i}" for i in range(100))  # all-distinct shingles
    prefix = " ".join(long.split()[:10])  # short prefix of the long doc
    docs = spark.createDataFrame(
        [(1, long), (2, prefix), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    out = DD.ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["containment"] >= 0.8
    assert r["jaccard"] < 0.5  # symmetric score would have missed it
    assert not any(3 in p for p in pairs)


# --------------------------------------------------------------------------
# Target encoding + PSI drift
# --------------------------------------------------------------------------


def test_target_encode_loo_excludes_own_label(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        features as FE,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0)],
        ["id", "cat", "y"],
    )
    out = {r["id"]: r["te_loo"] for r in
           FE.target_encode_loo(df, "cat", "y", prior_weight=0.0).collect()}
    # row 1's encoding = mean of rows 2,3 = 25; own label excluded
    assert out[1] == pytest.approx(25.0)
    assert out[2] == pytest.approx(20.0)  # (10+30)/2
    # singleton category with m=0 -> null, not the leaked own label
    assert out[4] is None


def test_target_encode_loo_prior_shrinks_singletons(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        features as FE,
    )

    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 10.0), (3, "rare", 100.0)], ["id", "cat", "y"]
    )
    out = {r["id"]: r["te_loo"] for r in
           FE.target_encode_loo(df, "cat", "y", prior_weight=5.0).collect()}
    mu = 110.0 / 3
    # singleton: (sum - y + m*mu)/(n - 1 + m) = (0 + 5*mu)/5 = mu
    assert out[3] == pytest.approx(mu, abs=1e-6)


def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        profiling as PF,
    )

    base = spark.createDataFrame([(float(i % 100),) for i in range(1000)], ["v"])
    same = PF.psi_drift(base, base, "v", n_bins=10).collect()
    total = [r for r in same if r["bin"] == -1][0]
    assert total["psi_term"] == pytest.approx(0.0, abs=1e-9)
    shifted = spark.createDataFrame([(float(i % 100) + 60,) for i in range(1000)], ["v"])
    tot2 = [r for r in PF.psi_drift(base, shifted, "v", n_bins=10).collect()
            if r["bin"] == -1][0]
    assert tot2["psi_term"] > 0.25  # rule-of-thumb "shifted" threshold


def test_woe_iv_hand_values(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        features as FE,
    )

    # level a: 3 pos / 1 neg; level b: 1 pos / 3 neg -> tp=4, tn=4
    rows = [("a", 1)] * 3 + [("a", 0)] + [("b", 1)] + [("b", 0)] * 3
    out = FE.woe_iv(spark.createDataFrame(rows, ["cat", "y"]), "cat", "y").collect()
    by = {r["level"]: r for r in out}
    woe_a = math.log((3 / 4) / (1 / 4))
    assert by["a"]["woe"] == pytest.approx(woe_a, abs=1e-6)
    assert by["b"]["woe"] == pytest.approx(-woe_a, abs=1e-6)
    iv = 2 * (3 / 4 - 1 / 4) * woe_a
    assert by[None]["iv_term"] == pytest.approx(iv, abs=1e-6)
    assert by[None]["n_pos"] == 4 and by[None]["n_neg"] == 4


def test_woe_iv_uninformative_is_zero(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        features as FE,
    )

    rows = [(c, y) for c in ("a", "b") for y in (0, 1) for _ in range(5)]
    out = FE.woe_iv(spark.createDataFrame(rows, ["cat", "y"]), "cat", "y").collect()
    total = [r for r in out if r["level"] is None][0]
    assert total["iv_term"] == pytest.approx(0.0, abs=1e-9)


def test_nelson_aalen_hand_example_and_exp_bound(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        survival as SV2,
    )

    rows = [(1, 1), (2, 1), (2, 1), (3, 0), (4, 1)]
    df = spark.createDataFrame([("g", d, e) for d, e in rows], ["g", "dur", "ev"])
    na = {r["dur"]: r["cumulative_hazard"]
          for r in SV2.nelson_aalen(df, "dur", "ev", "g").collect()}
    # H(1)=1/5; H(2)=1/5+2/4=0.7; H(3)=0.7 (censored); H(4)=0.7+1/1=1.7
    assert na[1] == pytest.approx(0.2)
    assert na[2] == pytest.approx(0.7)
    assert na[3] == pytest.approx(0.7)
    assert na[4] == pytest.approx(1.7)
    # Fleming-Harrington bound: exp(-H) >= KM survival everywhere
    km = {r["dur"]: r["survival"]
          for r in SV2.kaplan_meier(df, "dur", "ev", "g").collect()}
    for d in na:
        assert math.exp(-na[d]) >= km[d] - 1e-9


def test_gini_extremes(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        segmentation as SG,
    )

    # perfectly equal: G = 0
    eq = spark.createDataFrame([(i, 10.0) for i in range(10)], ["cust", "amt"])
    r = SG.gini_coefficient(eq, "cust", "amt").first()
    assert r["gini"] == pytest.approx(0.0, abs=1e-9)
    assert r["n_customers"] == 10
    # one customer has everything: G = (n-1)/n
    uneq = spark.createDataFrame(
        [(0, 1000.0)] + [(i, 0.0) for i in range(1, 10)], ["cust", "amt"]
    )
    r2 = SG.gini_coefficient(uneq, "cust", "amt").first()
    assert r2["gini"] == pytest.approx(0.9, abs=1e-9)


def test_keyness_flags_planted_focus_term(spark):
    docs = spark.createDataFrame(
        [(1, "zzzunique common words here", "focus"),
         (2, "zzzunique again with common words", "focus"),
         (3, "common words everywhere indeed", "ref"),
         (4, "more common words here", "ref")],
        ["doc_id", "text", "source"],
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.functions import (
        textops as TX,
    )

    toks = docs.select("source", F.explode(TX.tokens(TX.normalized_text(F.col("text")))).alias("term"))
    focus = toks.filter(F.col("source") == "focus")
    ref = toks.filter(F.col("source") != "focus")
    fa = focus.groupBy("term").count().withColumnRenamed("count", "a")
    na = focus.count(); nb = ref.count()
    fb = ref.groupBy("term").count().withColumnRenamed("count", "b")
    g = (fa.join(fb, "term", "outer").fillna(0))
    import math as m
    rows = {r["term"]: (r["a"], r["b"]) for r in g.collect()}
    a, b = rows["zzzunique"]
    lo = m.log((a + 0.5) / (na - a + 0.5)) - m.log((b + 0.5) / (nb - b + 0.5))
    assert lo > 1.0  # planted focus-only term scores strongly positive


def test_sequence_cross_entropy_deterministic_stream_is_zero(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        sequence as SEQ,
    )

    # one user, strictly alternating a->b->a->b: P(b|a)=P(a|b)=1
    rows = [(1, i, "a" if i % 2 == 0 else "b") for i in range(8)]
    df = spark.createDataFrame(rows, ["user_id", "pos", "event_type"])
    r = SEQ.sequence_cross_entropy(
        df, user_col="user_id", type_col="event_type", order_cols=["pos"]
    ).first()
    assert r["cross_entropy_bits"] == pytest.approx(0.0, abs=1e-9)
    assert r["n_transitions"] == 7


def test_embedding_quality_report_flags_planted_defects(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        profiling as PF,
    )

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.0, 0.0]),          # zero vector
        (3, [1.0, 2.0, 3.0]),     # wrong dim
        (4, None),                # null
        (5, [float("nan"), 1.0]), # non-finite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = PF.embedding_quality_report(df, "embedding", 2).first()
    assert r["n_rows"] == 5
    assert r["n_null"] == 1
    assert r["n_wrong_dim"] == 1
    assert r["n_zero_vectors"] == 1
    assert r["n_nonfinite"] == 1


def test_wilson_lower_bound_inverts_small_sample_confidence(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.association import (
        _wilson_bounds,
    )

    df = spark.createDataFrame([(2, 2), (90, 100)], ["k", "n"])
    out = df.select(
        "k", "n", *_wilson_bounds(F.col("k"), F.col("n"), 1.96, 6)
    ).collect()
    by = {r["k"]: r for r in out}
    # point confidence: 1.0 vs 0.9 — but the 2-of-2 lower bound
    # collapses (~0.34) while 90-of-100 stays high (~0.82)
    assert by[2]["conf_lo"] < 0.45 < 0.8 < by[90]["conf_lo"]
    assert by[2]["conf_hi"] <= 1.0 and by[90]["conf_hi"] < 1.0
