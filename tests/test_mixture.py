"""Mixture materialization (``operators.mixture``): epoch allocation
quantization, the seeded fractional-epoch hash gate (pinned against a
pure-Python md5 replay), audit arithmetic, contracts, and the
zero-shuffle plan shape. The registration-ready DuckDB spelling is
proven here (``test_materialized_counts_match_duckdb``) before the
registry rows go live — the promotion discipline."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    corpus as CO,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    mixture as MX,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table

PLAN = "grp string, n_tokens long, mix_weight double"
DOC = "doc_id long, grp string, n_toks long"


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, n_per_group=12):
    rows = []
    for g, base in (("web", 0), ("books", 100)):
        rows += [(base + i, g, 10 + i) for i in range(n_per_group)]
    return spark.createDataFrame(rows, DOC)


def test_allocation_quantizes_to_milli_epochs(spark):
    plan = spark.createDataFrame(
        [("web", 1000, 0.5), ("books", 200, 0.5)], PLAN
    )
    # budget 3000: web target 1500 -> 1.5 epochs; books target 1500 -> 7.5
    alloc = {
        r.grp: r
        for r in MX.epoch_allocation(plan, budget=3000, group_col="grp").collect()
    }
    assert alloc["web"].repeat_milli == 1500
    assert (alloc["web"].n_full_epochs, alloc["web"].frac_milli) == (1, 500)
    assert alloc["web"].repeat_factor == pytest.approx(1.5)
    assert alloc["books"].repeat_milli == 7500
    assert (alloc["books"].n_full_epochs, alloc["books"].frac_milli) == (7, 500)


def test_allocation_contracts(spark):
    plan = spark.createDataFrame([("web", 1000, 1.0)], PLAN)
    with pytest.raises(ValueError, match="budget"):
        MX.epoch_allocation(plan, budget=0, group_col="grp")
    with pytest.raises(ValueError, match="max_epochs"):
        MX.epoch_allocation(plan, budget=100_000_000, group_col="grp")
    # zero/NULL-token groups are dropped, not divided by
    degenerate = spark.createDataFrame(
        [("web", 1000, 0.5), ("empty", 0, 0.25), ("mist", None, 0.25), ("now", 500, None)],
        PLAN,
    )
    out = MX.epoch_allocation(degenerate, budget=1000, group_col="grp")
    assert [r.grp for r in out.collect()] == ["web"]


def test_integer_repeat_materializes_exact_epochs(spark):
    docs = _docs(spark)
    plan = spark.createDataFrame(
        [("web", 12 * 10 + 66, 0.5), ("books", 12 * 10 + 66, 0.5)], PLAN
    )
    # budget = 4x total tokens, equal weights -> exactly 2.0 epochs each
    alloc = MX.epoch_allocation(plan, budget=4 * 186, group_col="grp")
    mat = MX.materialize_mixture(docs, alloc, group_col="grp", id_col="doc_id")
    assert mat.count() == 2 * 24
    per_doc = mat.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.collect_set("epoch").alias("eps")
    )
    for r in per_doc.collect():
        assert r.n == 2 and sorted(r.eps) == [0, 1]


def test_fractional_gate_matches_python_md5_replay(spark):
    docs = _docs(spark)
    alloc = spark.createDataFrame(
        [("web", 186, 0.5, 1400, 1, 400, 1.4), ("books", 186, 0.5, 2700, 2, 700, 2.7)],
        "grp string, n_tokens long, mix_weight double, repeat_milli long, "
        "n_full_epochs long, frac_milli long, repeat_factor double",
    )
    for seed in ("", "s1"):
        got = {
            (r.doc_id, r.epoch)
            for r in MX.materialize_mixture(
                docs, alloc, group_col="grp", id_col="doc_id", seed=seed
            ).collect()
        }
        want = set()
        for doc_id, grp in [(i, "web") for i in range(12)] + [
            (100 + i, "books") for i in range(12)
        ]:
            nfull, fracm = (1, 400) if grp == "web" else (2, 700)
            for ep in range(nfull + 1):
                if ep < nfull or _hash60(f"{seed}:{doc_id}:{ep}") % 1000 < fracm:
                    want.add((doc_id, ep))
        assert got == want, f"seed={seed!r}"


def test_materialize_contracts_and_drops(spark):
    docs = _docs(spark)
    alloc = spark.createDataFrame(
        [("web", 186, 0.5, 1000, 1, 0, 1.0)],
        "grp string, n_tokens long, mix_weight double, repeat_milli long, "
        "n_full_epochs long, frac_milli long, repeat_factor double",
    )
    with pytest.raises(ValueError, match="no column"):
        MX.materialize_mixture(docs, alloc, group_col="missing", id_col="doc_id")
    with pytest.raises(ValueError, match="epoch"):
        MX.materialize_mixture(
            docs.withColumn("epoch", F.lit(0)), alloc, group_col="grp", id_col="doc_id"
        )
    # books absent from allocation -> dropped; NULL ids -> dropped
    with_null = docs.union(spark.createDataFrame([(None, "web", 5)], DOC))
    mat = MX.materialize_mixture(with_null, alloc, group_col="grp", id_col="doc_id")
    assert mat.filter(F.col("grp") == "books").count() == 0
    assert mat.filter(F.col("doc_id").isNull()).count() == 0
    assert mat.count() == 12  # web, exactly 1.0 epoch


def test_audit_values(spark):
    docs = _docs(spark)  # per group: 12 docs, tokens 10..21 summing 186
    plan = spark.createDataFrame(
        [("web", 186, 0.5), ("books", 186, 0.5)], PLAN
    )
    alloc = MX.epoch_allocation(plan, budget=4 * 186, group_col="grp")  # 2.0 each
    mat = MX.materialize_mixture(docs, alloc, group_col="grp", id_col="doc_id")
    audit = {
        r.grp: r
        for r in MX.mixture_audit(
            mat, alloc, group_col="grp", tokens_col="n_toks"
        ).collect()
    }
    for g in ("web", "books"):
        assert audit[g].n_rows == 24
        assert audit[g].achieved_tokens == 2 * 186
        assert audit[g].target_tokens == pytest.approx(372.0)
        assert audit[g].achieved_ratio == pytest.approx(1.0)


def test_materialize_plan_is_map_side_only(spark):
    """Zero data shuffles: the allocation broadcasts, the epoch
    expansion is a generator, the fractional gate a filter — the
    whole materialization pipelines inside the scan stage."""
    docs = _docs(spark).repartition(4)
    plan = spark.createDataFrame(
        [("web", 186, 0.5), ("books", 186, 0.5)], PLAN
    )
    alloc = MX.epoch_allocation(plan, budget=3 * 186, group_col="grp")
    mat = MX.materialize_mixture(docs, alloc, group_col="grp", id_col="doc_id")
    plan_str = mat._sc._jvm.PythonSQLUtils.explainString(
        mat._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan_str
    assert "Exchange hashpartitioning" not in plan_str
    assert "Exchange SinglePartition" not in plan_str
    assert "BatchEvalPython" not in plan_str
    assert "Generate" in plan_str  # the epoch explode


def test_allocation_fingerprint_feeds_lineage(spark, tmp_path):
    """Tier integration: the epoch allocation is screening state a
    lineage manifest can record — ``relation_fingerprint`` over its
    (group, repeat_milli) content is the mixture-recipe handle. A
    budget change re-fingerprints, and ``stale_screenings`` turns
    that into the exact re-materialization worklist. The manifest
    keys rows by the composite (doc, epoch) identity: same-(id,text)
    epoch copies would XOR-cancel under the raw doc_id."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        lineage as LN,
    )

    docs = _docs(spark).withColumn("text", F.concat_ws("-", "grp", "doc_id"))
    plan = spark.createDataFrame([("web", 186, 0.5), ("books", 186, 0.5)], PLAN)
    path = str(tmp_path / "manifest")

    def run(budget, run_id):
        alloc = MX.epoch_allocation(plan, budget=budget, group_col="grp")
        fp = LN.relation_fingerprint(alloc, ["grp", "repeat_milli"])
        mat = MX.materialize_mixture(
            docs, alloc, group_col="grp", id_col="doc_id"
        ).withColumn(
            "mix_id",
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("epoch")),
        )
        rows = LN.slice_lineage_manifest(
            mat, mat, slice_col="grp", id_col="mix_id",
            provenance={"mixture_fp": fp},
        )
        LN.append_manifest(rows, path, run_id)
        return fp

    fp1 = run(2 * 186, 1)
    assert LN.stale_screenings(spark, path, {"mixture_fp": fp1}).count() == 0
    fp2 = run(3 * 186, 2)  # budget change -> new recipe handle
    assert fp2 != fp1
    stale = LN.stale_screenings(spark, path, {"mixture_fp": fp1})
    assert stale.count() == 2 and all(
        r.stale_keys == "mixture_fp" for r in stale.collect()
    )
    assert LN.stale_screenings(spark, path, {"mixture_fp": fp2}).count() == 0


def test_materialized_counts_match_duckdb(spark, sf_dir, duck):
    """The registration-ready spelling: temperature plan (alpha=0.5)
    over documents.lang weighted by n_chars, budget = 2x total chars,
    materialize, count docs/tokens per (lang, epoch). Proven here
    bit-for-bit before the registry rows go live."""
    d = load_table(spark, sf_dir, "documents")
    budget = 2 * d.agg(F.sum("n_chars")).collect()[0][0]
    tplan = CO.temperature_mix_plan(d, "lang", "n_chars", alpha=0.5)
    alloc = MX.epoch_allocation(tplan, budget=budget, group_col="lang")
    mat = MX.materialize_mixture(d, alloc, group_col="lang", id_col="doc_id", seed="mix")
    got = sorted(
        (r.lang, r.epoch, r.n_docs, r.n_toks)
        for r in mat.groupBy("lang", "epoch")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_toks"))
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH plan AS (
              SELECT lang, sum(n_chars) AS n_tokens
              FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
              GROUP BY 1
            ),
            wt AS (
              SELECT lang, n_tokens,
                     pow(n_tokens, 0.5) / sum(pow(n_tokens, 0.5)) OVER () AS w
              FROM plan
            ),
            alloc AS (
              SELECT lang, n_tokens,
                     CAST(round({budget} * w / n_tokens * 1000) AS BIGINT) AS rm
              FROM wt
            ),
            mat AS (
              SELECT d.lang, d.doc_id, d.n_chars, e.epoch
              FROM documents d
              JOIN alloc a USING (lang),
              LATERAL (SELECT unnest(range(0, (a.rm // 1000) + 1)) AS epoch) e
              WHERE d.doc_id IS NOT NULL
                AND (e.epoch < a.rm // 1000 OR
                     ('0x' || substr(md5('mix:' || d.doc_id || ':' || e.epoch), 1, 15))::BIGINT
                       % 1000 < a.rm % 1000)
            )
            SELECT lang, epoch, count(*) AS n_docs, sum(n_chars) AS n_toks
            FROM mat GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want
