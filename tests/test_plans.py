"""Physical-plan audits: the scale properties SURVEY §7 demands must
be visible in the executed plan, not just intended — filter pushdown
and column pruning reach the parquet scan, small dims broadcast,
top-k fuses, per-group top-k gets the group-limit pushdown."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1), plan[:1500]


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m, plan[:1500]
    # lineitem has 10 physical columns; the query needs 6
    read = m.group(1)
    assert "l_partkey" not in read and "l_suppkey" not in read, read


def test_small_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "revenue_rollup_region_nation")
    assert "BroadcastHashJoin" in plan
    assert "Expand" in plan  # rollup grouping sets in one pass


def test_topk_fuses_to_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_parts_by_price")
    assert "TakeOrderedAndProject" in plan


def test_per_group_topk_gets_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "recent_orders_per_customer")
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize(
    "name",
    ["candidates_unseen", "jaccard_pairs_exact", "doc_token_stats", "knn_bruteforce"],
)
def test_no_python_udf_in_hot_paths(spark, sf_dir, name):
    """Everything SQL-expressible stays JVM-side: no BatchEvalPython
    (row-at-a-time UDF) nodes anywhere in these plans."""
    plan = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_kmv_sketch_gets_window_group_limit(spark, sf_dir):
    """The KMV sketch's scale property IS its plan shape: per-group
    k-smallest via WindowGroupLimit means map tasks carry <= k rows
    per group into the exchange (O(k) sketch state, not O(D))."""
    plan = plan_of(spark, sf_dir, "kmv_distinct_customers")
    assert "WindowGroupLimit" in plan


def test_hyperplane_ann_single_arrow_pass(spark, sf_dir):
    """Signature generation is mapInPandas (Arrow-batched, sanctioned
    escape hatch) — and exactly two of them (corpus + probes), with
    no row-at-a-time Python anywhere in the plan."""
    plan = plan_of(spark, sf_dir, "ann_hyperplane_neighbors")
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 2, plan.count("MapInPandas")


def test_minhash_set_pairs_stays_jvm_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "minhash_pairs_lsh")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The corpus (100 TB side) must never shuffle: the benchmark
    fingerprints broadcast into a left-anti hash join."""
    plan = plan_of(spark, sf_dir, "decontaminated_docs")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_stratified_sample_gets_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "doc_sample_by_lang")
    assert "WindowGroupLimit" in plan


def test_jaccard_pair_agg_is_join_free(spark, sf_dir):
    """r3 size-carry pin: the only join in the exact-Jaccard plan is
    the item-keyed self-join — per-user sizes must NOT be joined back
    onto the O(pairs) aggregate (two extra SMJs + a full exchange of
    the pair relation before the fix; similarity.py:96)."""
    plan = plan_of(spark, sf_dir, "top_similar_customer_pairs")
    joins = re.findall(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan)
    assert len(joins) == 1, joins
    assert "TakeOrderedAndProject" in plan


def test_asof_join_has_no_cartesian(spark, sf_dir):
    """As-of join = union + per-key window, never a range cross
    product (temporal.asof_join)."""
    plan = plan_of(spark, sf_dir, "purchase_attribution_asof")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_interval_join_is_equi_bucketed(spark, sf_dir):
    """Interval join buckets time into grid cells so the physical
    join is an equi-join on (key, cell) — no nested-loop scan."""
    plan = plan_of(spark, sf_dir, "events_session_interval_join")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_rolling_window_single_shuffle(spark, sf_dir):
    """Frame-spec rolling agg: one shuffle by the partition key, no
    global sort, no SinglePartition exchange."""
    plan = plan_of(spark, sf_dir, "rolling_order_spend")
    assert "SinglePartition" not in plan, plan[:2000]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2000]


def test_props_json_prunes_scan(spark, sf_dir):
    """get_json_object runs JVM-side over a scan that reads only the
    two referenced columns."""
    plan = plan_of(spark, sf_dir, "props_json_stats")
    assert "BatchEvalPython" not in plan
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m and "props" in m.group(1) and "user_id" not in m.group(1), m and m.group(1)


def test_balanced_sample_gets_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "doc_balanced_by_source")
    assert "WindowGroupLimit" in plan


def test_attribution_join_is_an_equi_join_not_cartesian(spark, sf_dir):
    """The stream-stream-shaped attribution join must hash-partition
    on the user key with the time bound as a range RESIDUAL — a plan
    that fell back to CartesianProduct/BroadcastNestedLoopJoin would
    explode at scale."""
    plan = plan_of(spark, sf_dir, "purchase_click_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan[:1500]


def test_semantic_dedup_stays_jvm_side_and_keyed(spark, sf_dir):
    """SemDeDup's within-cluster prune must stay keyed on the cluster
    id (hash joins, no all-pairs product) and fully codegen'd (no
    Python eval in the pipeline)."""
    plan = plan_of(spark, sf_dir, "semantic_dedup_survivors")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A fact table hive-partitioned on a join key, joined to a
    selectively-filtered dimension, must get a DynamicPruning
    subquery on its partition scan — Spark's DPP is the partition
    analogue of the Bloom runtime filter, and the reason the
    partitioned sinks (io.write_parquet / write_range_clustered)
    matter at 100 TB: a dim filter prunes fact PARTITIONS before any
    fact I/O happens."""
    from pyspark.sql import functions as F

    from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import (
        load_table,
        write_parquet,
    )

    fact_path = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events")
    write_parquet(events, fact_path, partition_by=("event_type",))

    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("purchase", 1.0), ("click", 0.2), ("view", 0.1),
         ("signup", 0.0), ("error", 0.0)],
        ["event_type", "weight"],
    ).filter(F.col("weight") > 0.5)  # selective: 1 of 5 partitions
    joined = fact.join(dim, "event_type").agg(F.sum("value").alias("s"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]

    # and the pruned result is correct
    expect = (
        events.filter(F.col("event_type") == "purchase").agg(F.sum("value")).first()[0]
    )
    assert abs(joined.first()["s"] - expect) < 1e-6
