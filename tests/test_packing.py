"""Two-pass prefix-sum packing operator: value-identical to the
single-partition global window, with a plan that never collapses to
one task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    packing as PK,
)


def test_running_sum_manual_fixture(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 10), (4, 1), (5, 7)], "id long, w long"
    )
    out = {
        r["id"]: r["running_total"]
        for r in PK.bucketed_running_sum(df, "id", "w", num_buckets=3).collect()
    }
    assert out == {1: 5, 2: 8, 3: 18, 4: 19, 5: 26}


def test_shard_assignment_manual_fixture(spark):
    # budget 10: starts are 0,5,8,18,19 -> shards 0,0,0,1,1
    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 10), (4, 1), (5, 7)], "id long, w long"
    )
    out = {
        r["id"]: r["shard_id"]
        for r in PK.assign_token_shards(df, "id", "w", shard_tokens=10, num_buckets=2).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}


def test_matches_single_partition_window(spark, sf_dir):
    """Bucket boundaries decide where the prefix is split, never its
    value: byte-identical to the naive global window."""
    d = (
        entrymod.queries()["doc_token_stats"](spark, sf_dir)
        .select("doc_id", F.col("n_tokens").cast("long").alias("w"))
    )
    two_pass = PK.bucketed_running_sum(d, "doc_id", "w", num_buckets=8)
    naive = d.withColumn(
        "running_total",
        F.sum("w").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    a = {r["doc_id"]: r["running_total"] for r in two_pass.collect()}
    b = {r["doc_id"]: r["running_total"] for r in naive.collect()}
    assert a == b and len(a) > 0


def test_degenerate_bucket_counts(spark):
    """num_buckets=1 (no boundaries) and more buckets than rows both
    stay correct — bucketing is a performance choice only."""
    df = spark.createDataFrame([(i, i % 3 + 1) for i in range(10)], "id long, w long")
    expect = {}
    run = 0
    for i in range(10):
        run += i % 3 + 1
        expect[i] = run
    for n in (1, 64):
        got = {
            r["id"]: r["running_total"]
            for r in PK.bucketed_running_sum(df, "id", "w", num_buckets=n).collect()
        }
        assert got == expect, n


def test_no_single_partition_exchange(spark, sf_dir):
    """The scale property IS the plan shape: the full relation moves
    through hash exchanges only — a SinglePartition exchange would
    mean the global window fell back to one task."""
    df = entrymod.queries()["token_shard_assignment"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "BroadcastExchange" in plan  # offsets join back by broadcast


def test_bucket_expr_survives_nonfinite_boundaries(spark):
    """approxQuantile returns inf/nan boundaries when the order column
    contains them; repr()-spliced they render as unresolvable infD /
    nanD column refs (r11 advice). Non-finite terms fall back to the
    F.lit comparison; finite-only inputs keep the one-expr fast path."""
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("inf"),)], "x double"
    )
    for bounds in (
        [1.5, float("inf")],
        [float("-inf"), 1.5],
        [1.5, float("nan")],
        [float("inf")],
    ):
        got = df.withColumn("b", PK._bucket_expr("x", bounds)).collect()
        # same semantics as the pure-lit spelling, row for row
        ref = df.withColumn(
            "b",
            sum(
                (F.when(F.col("x") >= F.lit(b), 1).otherwise(0) for b in bounds),
                start=F.lit(0),
            ),
        ).collect()
        assert got == ref, bounds


def test_bucket_expr_finite_path_is_one_sql_expr(spark):
    """Guard the collapse itself: all-finite boundaries must not
    regress to a per-boundary Column chain."""
    col = PK._bucket_expr("x", [0.5, 1.5, 2.5])
    # the parsed add-tree prints as a single CASE WHEN chain
    s = str(col)
    assert "CASE WHEN" in s and "nanD" not in s and "infD" not in s


# ---- SPFHP document-boundary-respecting packing (r14) ----------------------


def _ref_spfhp(hist: dict[int, int], cap: int, max_items=None):
    """Independent pure-Python SPFHP reference: simulate packs as an
    explicit list (no histogram-of-strategies optimization), longest
    class first, best-fit into the fullest viable open pack. Used to
    pin the operator's strategy synthesis on small inputs."""
    packs = []  # list of [remaining, [lengths...]]
    for ln in sorted(hist, reverse=True):
        for _ in range(hist[ln]):
            viable = [
                p for p in packs
                if p[0] >= ln and (max_items is None or len(p[1]) < max_items)
            ]
            if viable:
                best = min(viable, key=lambda p: (p[0], p[1]))
                best[0] -= ln
                best[1].append(ln)
            else:
                packs.append([cap - ln, [ln]])
    out: dict[tuple, int] = {}
    for _, lens in packs:
        key = tuple(sorted(lens, reverse=True))
        out[key] = out.get(key, 0) + 1
    return sorted(out.items())


def test_spfhp_strategies_match_reference():
    for hist, cap, mi in [
        ({8: 3, 5: 2, 3: 4, 1: 6}, 10, None),
        ({10: 2, 7: 3, 2: 5}, 10, None),
        ({4: 10}, 10, None),
        ({4: 10}, 10, 2),
        ({9: 1, 1: 1}, 10, None),
        ({10: 3}, 10, None),  # exact-fit singles retire immediately
    ]:
        got = PK._spfhp_strategies(hist, cap, mi)
        want = _ref_spfhp(hist, cap, mi)
        # same pack population (pattern multiset) — the greedy orders
        # are constructed identically
        assert got == want, (hist, cap, mi, got, want)
        # conservation: every doc packed exactly once
        packed = {}
        for pat, cnt in got:
            for ln in pat:
                packed[ln] = packed.get(ln, 0) + cnt
        assert packed == hist
        for pat, _ in got:
            assert sum(pat) <= cap
            if mi is not None:
                assert len(pat) <= mi


def test_spfhp_domain_contracts():
    import pytest

    with pytest.raises(ValueError, match="capacity"):
        PK._spfhp_strategies({1: 1}, 0)
    with pytest.raises(ValueError, match="outside"):
        PK._spfhp_strategies({11: 1}, 10)
    with pytest.raises(ValueError, match="outside"):
        PK._spfhp_strategies({0: 1}, 10)
    assert PK._spfhp_strategies({}, 10) == []


def test_spfhp_assignments_exactly_once_capacity_and_determinism(spark, sf_dir):
    """End-to-end over the real documents table: every doc in exactly
    one pack, no pack exceeds capacity, no doc split, and the
    assignment is identical across runs and partitionings."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.functions import (
        textops as TX,
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import (
        load_table,
    )

    CAP = 256
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", TX.token_count("text").alias("n_tokens"))
        .filter((F.col("n_tokens") >= 1) & (F.col("n_tokens") <= CAP))
    )
    n_docs = d.count()
    out = PK.spfhp_pack_assignments(d, "doc_id", "n_tokens", CAP)
    rows = out.collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    fills: dict[int, int] = {}
    slots: dict[int, set] = {}
    for r in rows:
        fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_tokens
        slots.setdefault(r.pack_id, set()).add(r.pack_slot)
    assert max(fills.values()) <= CAP
    # slots within a pack are distinct positions
    for pid, ss in slots.items():
        assert len(ss) == len([r for r in rows if r.pack_id == pid])
    # determinism across a different partitioning
    again = {
        (r.doc_id, r.pack_id, r.pack_slot)
        for r in PK.spfhp_pack_assignments(
            d.repartition(7), "doc_id", "n_tokens", CAP
        ).collect()
    }
    assert again == {(r.doc_id, r.pack_id, r.pack_slot) for r in rows}

    stats = PK.pack_fill_stats(out, "n_tokens", CAP).collect()[0]
    assert stats.n_docs == n_docs
    assert stats.n_packs == len(fills)
    assert 0 < stats.efficiency <= 1.0
    # the packing's point: vastly better than one-doc-per-sequence
    assert stats.n_packs < n_docs / 2


def test_spfhp_null_weight_raises_contract_error(spark):
    """ADVICE r15: a NULL weight is the same contract violation as an
    out-of-range length — the dedicated ValueError, not an opaque
    int(None) TypeError."""
    import pytest

    d = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "doc_id long, n_tokens int"
    )
    with pytest.raises(ValueError, match="NULL n_tokens"):
        PK.spfhp_pack_assignments(d, "doc_id", "n_tokens", 10)


def test_spfhp_beats_naive_and_plan_is_parallel(spark):
    """Efficiency sanity on a padding-hostile fixture (all docs just
    over half capacity would be worst-case; mixed lengths pack well)
    + the scale shape: the ranking window is PARTITIONED BY length —
    no SinglePartition exchange anywhere in the plan."""
    rows = [(i, 60 + (i % 5) * 40) for i in range(200)]  # 60..220 tokens
    d = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = PK.spfhp_pack_assignments(d, "doc_id", "n_tokens", 256)
    stats = PK.pack_fill_stats(out, "n_tokens", 256).collect()[0]
    assert stats.efficiency > 0.9, stats
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
