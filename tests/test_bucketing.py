"""Bucketed tables must give shuffle-free co-located joins: the
100 TB reason to pay partitioning cost at write time once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table
from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "b_orders", ("o_orderkey",), num_buckets=8)
    write_bucketed(li, "b_lineitem", ("l_orderkey",), num_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_pair):
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_custkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan, plan[:1200]
    # neither join input re-shuffles: no Exchange between the scan and the join
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan

    # and the result is identical to the unbucketed join
    o2 = load_table(spark, sf_dir, "orders")
    li2 = load_table(spark, sf_dir, "lineitem")
    expected = sorted(
        map(
            tuple,
            o2.join(li2, o2.o_orderkey == li2.l_orderkey)
            .groupBy("o_custkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .collect(),
        )
    )
    assert sorted(map(tuple, joined.collect())) == expected
