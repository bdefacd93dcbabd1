"""Empty/null-input robustness for the operator library: a 100 TB
pipeline always contains an empty partition, a null text, or a probe
set with no matches somewhere."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import dedup as DD
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import temporal as TP
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.similarity import exact_jaccard_pairs


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_on_empty_input(spark):
    assert DD.exact_duplicates(_empty_docs(spark), "doc_id", "text").count() == 0
    assert DD.ngram_jaccard_pairs(_empty_docs(spark), "doc_id", "text").count() == 0
    assert DD.minhash_duplicate_pairs(spark, _empty_docs(spark), "doc_id", "text").count() == 0
    assert DD.simhash_duplicate_pairs(_empty_docs(spark), "doc_id", "text").count() == 0


def test_jaccard_on_empty_input(spark):
    e = spark.createDataFrame([], "user long, item long")
    assert exact_jaccard_pairs(e, "user", "item").count() == 0


def test_text_functions_on_null_and_blank(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two three four")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        TX.token_count("text").alias("nt"),
        TX.quality_score("text").alias("q"),
        TX.lang_id("text").alias("lang"),
        TX.rolling_fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # null text propagates null, never raises
    assert by_id[1].nt is None
    assert by_id[2].nt == 0 and by_id[3].nt == 0
    assert by_id[2].fp == 0 or by_id[2].fp is not None
    assert by_id[4].nt == 4 and by_id[4].lang == "und"


def test_knn_with_empty_corpus_and_empty_probes(spark):
    corpus = spark.createDataFrame([], "vec_id long, embedding array<double>")
    probes = spark.createDataFrame([], "probe_id long, probe_vec array<double>")
    assert VO.knn_bruteforce(corpus, probes, k=3).count() == 0
    assert VO.knn_bruteforce_vectorized(corpus, probes, k=3).count() == 0


def test_knn_vectorized_matches_hof_on_string_ids(spark):
    """The two knn functions share one contract: id column types come
    from the input schema, not a hardcoded long (r01 hardcoded
    ``long`` in the vectorized mapInPandas schema — string ids
    failed)."""
    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0]), ("d", [0.5, 0.5])],
        "vec_id string, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [("p1", [1.0, 0.0])], "probe_id string, probe_vec array<double>"
    )
    hof = VO.knn_bruteforce(corpus, probes, k=3).collect()
    vec = VO.knn_bruteforce_vectorized(corpus, probes, k=3).collect()
    as_set = lambda rows: {(r.probe_id, r.vec_id, r.rank, round(r.cos_sim, 9)) for r in rows}
    assert as_set(hof) == as_set(vec)
    assert {type(r.vec_id) for r in vec} == {str}


def test_asof_join_with_empty_right(spark):
    left = spark.createDataFrame([(1, 10), (1, 20)], "k long, ts long")
    right = spark.createDataFrame([], "k long, ts long, v double")
    out = TP.asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"]).collect()
    assert len(out) == 2 and all(r.v is None for r in out)
    inner = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"], how="inner"
    )
    assert inner.count() == 0
