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


def test_chunk_documents_edges(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX

    df = spark.createDataFrame(
        [(1, ""), (2, "one two three"), (3, "   ")], "doc_id long, text string"
    )
    out = TX.chunk_documents(df, "doc_id", "text", chunk_tokens=2, stride=1).collect()
    assert {r.doc_id for r in out} == {2}, "empty/whitespace docs emit no chunks"
    chunks = {(r.chunk_id, r.chunk_text, r.n_tokens) for r in out}
    assert chunks == {(0, "one two", 2), (1, "two three", 2), (2, "three", 1)}


def test_stratified_hash_sample_small_strata_and_determinism(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import relational as R

    df = spark.createDataFrame(
        [("a", i) for i in range(3)] + [("b", i) for i in range(30)], "s string, id long"
    )
    out = R.stratified_hash_sample(df, "s", 5, "id").collect()
    by = {}
    for r in out:
        by.setdefault(r.s, []).append(r.id)
    assert len(by["a"]) == 3, "stratum smaller than n returns whole stratum"
    assert len(by["b"]) == 5
    out2 = R.stratified_hash_sample(df, "s", 5, "id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_kmv_exact_when_sketch_not_full(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import sketches as SK

    df = spark.createDataFrame([("g", i) for i in range(10)], "g string, v long")
    r = SK.kmv_distinct(df, "v", group_by="g", k=256).collect()[0]
    assert r.n_distinct_est == 10 and r.n_seen == 10


def test_decontaminate_matches_on_content_not_id(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import dedup as DD

    corpus = spark.createDataFrame(
        [(1, "Hello  World"), (2, "unique text"), (3, "hello world")],
        "id long, text string",
    )
    bench = spark.createDataFrame([(99, "hello world")], "id long, text string")
    out = DD.decontaminate(corpus, bench, "id", "text").collect()
    # 1 and 3 normalize to the benchmark fingerprint despite different ids/case
    assert {r.id for r in out} == {2}


def test_sql_collapse_sites_escape_backtick_column_names(spark):
    """ADVICE r12: the plan-build SQL collapses (_cms_cells_expr,
    ewma_lagsum, winsorize percentiles) interpolate column names into
    SQL text; a name containing a backtick used to break parsing or
    INJECT expression text. quote_ident doubles embedded backticks,
    so the generated SQL refers to the literal column name: it binds
    when the column exists, and an injection-shaped name fails to
    RESOLVE (loud AnalysisException) instead of silently evaluating
    smuggled expression text. (Backtick names remain unusable through
    the engine's plain F.col(...) surface — Spark itself parses them
    — so end-to-end operator support is explicitly NOT the contract;
    non-injection is.)"""
    import pytest
    from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType
    from pyspark.sql.utils import AnalysisException

    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import sketches as SK
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import stats as ST
    from big_data_movie_recommendation_and_customer_segmentation_spark.sqlutil import quote_ident

    assert quote_ident("plain") == "`plain`"
    assert quote_ident("we`ird") == "`we``ird`"
    with pytest.raises(TypeError):
        quote_ident(F.col("x"))

    # _cms_cells_expr binds a backtick-bearing name to the literal column
    weird = "k`ey"
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",)], StructType([StructField(weird, StringType())])
    )
    cells = df.select(F.explode(SK._cms_cells_expr(weird, 2, 8)).alias("c"))
    assert cells.count() == 6  # 3 rows × depth 2, buckets resolved from the column

    # ewma_lagsum end-to-end with a backtick-bearing value column
    # (its collapse has no plain-F.col sites on value_col)
    vals = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)],
        StructType([StructField("t", IntegerType()), StructField("va`l", DoubleType())]),
    )
    out = ST.ewma_lagsum(vals, [], ["t"], "va`l", alpha=0.5, window=2).collect()
    assert [r["ewma"] for r in out] == [1.0, pytest.approx(5.0 / 3), pytest.approx(8.0 / 3)]

    # injection-shaped name: refers to a (nonexistent) literal column,
    # never evaluates the smuggled text
    inj = "t` + 99 AS `x"
    with pytest.raises(AnalysisException):
        vals.select(F.explode(SK._cms_cells_expr(inj, 2, 8))).collect()
