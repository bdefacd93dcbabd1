"""Empty-input robustness (r10 self-review, the sibling class to the
NULL contracts): a 100 TB pipeline routinely feeds operators an empty
slice (a filtered day, a new group, an empty partition after
decontamination). Every operator must return its empty/degenerate
shape instead of crashing — the one crash found (quantile_bucket:
``percentile`` of an empty relation is NULL, ``list(None)`` raised)
is fixed and pinned here along with the no-crash contract for the
rest of the statistical surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    corpus as CP,
    evaluate as EV,
    features as FT,
    packing as PK,
    retrieval as RT,
    segmentation as SG,
    sequence as SQ,
    sketches as SK,
    stats as ST,
    survival as SV,
    temporal as TP,
)


def test_quantile_bucket_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "v double")
    assert SG.quantile_bucket(empty, "v", 4).count() == 0
    all_null = spark.createDataFrame([(None,), (None,)], "v double")
    got = SG.quantile_bucket(all_null, "v", 4).collect()
    assert [r["bucket"] for r in got] == [None, None]


def test_decile_lift_empty(spark):
    empty = spark.createDataFrame([], "s double, y int")
    assert EV.decile_lift(empty, "y", "s").count() == 0


def test_statistical_operators_survive_empty_input(spark):
    """No operator on the statistical surface may crash on an empty
    relation; row counts pin the degenerate shape (0 rows for keyed
    outputs, 1 null-ish summary row for global aggregates)."""
    e_v = spark.createDataFrame([], "v double")
    e_gv = spark.createDataFrame([], "g string, x double, v double")
    e_sy = spark.createDataFrame([], "s double, y int")
    e_iw = spark.createDataFrame([], "id long, w long")

    assert PK.bucketed_running_sum(e_iw, "id", "w").count() == 0
    assert PK.assign_token_shards(e_iw, "id", "w", 100).count() == 0
    assert ST.group_linear_trend(e_gv, ["g"], "x", "v").count() == 0
    assert ST.mad_outliers(e_gv, ["g"], "v").count() == 0
    assert ST.winsorized_stats(e_gv, "g", "v").count() == 0
    # dense bin spine survives with NULL edges and zero counts
    assert ST.histogram_fixed(e_v, "v", 4).count() == 4
    assert (
        ST.chi_square_independence(
            spark.createDataFrame([], "a string, b string"), "a", "b"
        ).count()
        == 1
    )
    assert ST.skyline_2d(
        spark.createDataFrame([], "x long, y double, id long"), "x", "y", "id"
    ).count() == 0
    # global summaries emit their one row with null statistics
    auc = EV.binary_auc(e_sy, "y", "s").collect()
    assert len(auc) == 1 and auc[0]["auc"] is None
    assert SK.kmv_distinct(e_gv, "v", "g").count() == 0
    assert SK.cms_estimate(
        SK.count_min_sketch(spark.createDataFrame([], "k string"), "k"),
        spark.createDataFrame([], "k string"),
        "k",
    ).count() == 0
    assert SV.kaplan_meier(
        spark.createDataFrame([], "g string, d int, e int"), "d", "e", "g"
    ).count() == 0
    assert CP.temperature_mix_plan(
        spark.createDataFrame([], "src string, w long"), "src", "w"
    ).count() == 0
    # woe_iv keeps its total marker row (null level) even when empty
    assert FT.woe_iv(spark.createDataFrame([], "c string, y int"), "c", "y").count() == 1
    assert FT.target_encode_loo(
        spark.createDataFrame([], "c string, y double"), "c", "y"
    ).count() == 0
    assert RT.rrf_fuse(
        [spark.createDataFrame([], "id string, rank int")], "id", "rank"
    ).count() == 0
    assert SQ.transition_matrix(
        spark.createDataFrame([], "u int, t string, o int"),
        user_col="u", type_col="t", order_cols=["o"],
    ).count() == 0
    assert TP.decayed_counts(
        spark.createDataFrame([], "k string, ts timestamp"), "k", "ts"
    ).count() == 0
    assert TP.gap_fill_daily(
        spark.createDataFrame([], "ts timestamp, g string, v double"),
        "ts", ["g"], {"n": F.count(F.lit(1))},
    ).count() == 0


def test_dedup_graph_and_vector_operators_survive_empty_input(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        association as AS,
        dedup as DD,
        graph as G,
        recommend as RC,
        similarity as SM,
        splits as SP,
        vectorops as VO,
    )

    e_doc = spark.createDataFrame([], "doc_id long, text string")
    e_edge = spark.createDataFrame([], "src int, dst int")
    e_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    e_ui = spark.createDataFrame([], "user long, item long")

    assert DD.ngram_jaccard_pairs(e_doc, "doc_id", "text").count() == 0
    assert DD.minhash_duplicate_pairs(spark, e_doc, "doc_id", "text").count() == 0
    assert DD.simhash_duplicate_pairs(e_doc, "doc_id", "text").count() == 0
    assert DD.dedup_representatives(
        spark.createDataFrame([], "doc_a long, doc_b long")
    ).count() == 0
    assert DD.decontaminate(e_doc, e_doc, "doc_id", "text").count() == 0
    assert G.pagerank(e_edge).count() == 0
    assert G.connected_components(e_edge).count() == 0
    assert G.triangle_counts(e_edge).count() == 0
    probes = e_emb.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    assert VO.knn_bruteforce(e_emb, probes, k=5).count() == 0
    assert SM.exact_jaccard_pairs(e_ui, "user", "item").count() == 0
    assert SP.chronological_split(
        spark.createDataFrame([], "user long, ts timestamp"), "user", "ts", "ts"
    ).count() == 0
    assert AS.association_rules(e_ui, "user", "item").count() == 0
    assert RC.popularity_scores(
        spark.createDataFrame([], "item long, r double"), "item", "r"
    ).count() == 0
