"""Property-based pin of ``asof_join``'s tie semantics (VERDICT r3
ask #6). The DuckDB ASOF oracle in the driver gate checks one fixed
dataset; these generate adversarial (key, ts) collisions — left/right
rows at EQUAL timestamps and duplicate right rows at the same
(key, ts) — and check the documented contract row by row:

- >= semantics: a right row at exactly left_ts IS visible;
- the match is the right row with the MAXIMUM right_ts <= left_ts;
- among duplicate right rows at that winning (key, ts) the payload is
  one of the duplicates (docstring: unspecified — callers wanting
  stronger determinism pre-dedupe right on (keys, ts));
- no candidate → null payload ('left') / row dropped ('inner').
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import temporal as TP

# Tiny domains force heavy collisions: ~3 keys x 5 timestamps over up
# to 40 rows guarantees equal-ts and duplicate-right cases appear.
left_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=4),  # ts
    ),
    min_size=1,
    max_size=20,
)
right_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=4),  # ts
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_match_is_latest_at_or_before(spark, lrows, rrows):
    ldata = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    # v is unique per right row so ties are distinguishable; rts lets
    # the assertion see WHICH timestamp won without re-deriving it.
    rdata = [(k, t, t, 1000 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(ldata, "k long, ts long, lid long")
    right = spark.createDataFrame(rdata, "k long, ts long, rts long, v long")

    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["rts", "v"]
    ).collect()
    assert len(out) == len(ldata)

    by_lid = {r.lid: r for r in out}
    for k, ts, lid in ldata:
        row = by_lid[lid]
        cands = [(rt, v) for (rk, rt, _, v) in rdata if rk == k and rt <= ts]
        if not cands:
            assert row.rts is None and row.v is None, row
        else:
            best_ts = max(rt for rt, _ in cands)
            assert row.rts == best_ts, (row, cands)
            # among duplicate right rows at the winning ts, any one
            # may win — membership, not identity (documented)
            assert row.v in {v for rt, v in cands if rt == best_ts}, (row, cands)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_inner_drops_exactly_the_unmatched(spark, lrows, rrows):
    ldata = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rdata = [(k, t, 1000 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(ldata, "k long, ts long, lid long")
    right = spark.createDataFrame(rdata, "k long, ts long, v long")

    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], how="inner",
    ).collect()
    expect = {
        lid
        for k, ts, lid in ldata
        if any(rk == k and rt <= ts for rk, rt, _ in rdata)
    }
    assert {r.lid for r in out} == expect
    assert all(r.v is not None for r in out)


def test_asof_equal_ts_right_row_visible(spark):
    """>= semantics at the boundary: right row stamped exactly at
    left_ts must match (right sorts before left at equal ts)."""
    left = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, 10, 7)], "k long, ts long, v long")
    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"]
    ).collect()
    assert out[0].v == 7


def test_asof_prededuped_right_ties_are_deterministic(spark):
    """The documented escape hatch: pre-dedupe right on (keys, ts)
    and equal-ts duplicates can no longer race — the survivor wins."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 10, 0), (1, 12, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 3), (1, 10, 9), (1, 11, 5), (1, 11, 4)], "k long, ts long, v long"
    )
    deduped = right.groupBy("k", "ts").agg(F.max("v").alias("v"))
    out = {
        r.lid: r.v
        for r in TP.asof_join(
            left, deduped, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"]
        ).collect()
    }
    assert out == {0: 9, 1: 5}


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_forward_match_is_earliest_at_or_after(spark, lrows, rrows):
    """direction='forward' (VERDICT r4 ask #6) mirrors the backward
    contract: the match is the right row with the MINIMUM right_ts >=
    left_ts, equality inclusive, ties at the winning ts unspecified
    among duplicates."""
    ldata = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rdata = [(k, t, t, 1000 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(ldata, "k long, ts long, lid long")
    right = spark.createDataFrame(rdata, "k long, ts long, rts long, v long")

    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rts", "v"], direction="forward",
    ).collect()
    assert len(out) == len(ldata)

    by_lid = {r.lid: r for r in out}
    for k, ts, lid in ldata:
        row = by_lid[lid]
        cands = [(rt, v) for (rk, rt, _, v) in rdata if rk == k and rt >= ts]
        if not cands:
            assert row.rts is None and row.v is None, row
        else:
            best_ts = min(rt for rt, _ in cands)
            assert row.rts == best_ts, (row, cands)
            assert row.v in {v for rt, v in cands if rt == best_ts}, (row, cands)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_forward_inner_drops_exactly_the_unmatched(spark, lrows, rrows):
    ldata = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rdata = [(k, t, 1000 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(ldata, "k long, ts long, lid long")
    right = spark.createDataFrame(rdata, "k long, ts long, v long")

    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], how="inner", direction="forward",
    ).collect()
    expect = {
        lid
        for k, ts, lid in ldata
        if any(rk == k and rt >= ts for rk, rt, _ in rdata)
    }
    assert {r.lid for r in out} == expect
    assert all(r.v is not None for r in out)


def test_asof_forward_equal_ts_right_row_visible(spark):
    """Forward >= semantics at the boundary: a right row stamped
    exactly at left_ts must match (equality inclusive, both
    directions)."""
    left = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, 10, 7), (1, 12, 8)], "k long, ts long, v long")
    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], direction="forward",
    ).collect()
    assert out[0].v == 7


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_tolerance_nulls_stale_matches(spark, lrows, rrows):
    """tolerance (pandas merge_asof surface): the nearest match still
    wins, but if it sits further than the bound the row gets null
    payload — NOT the next-nearest inside the bound (merge_asof
    semantics: tolerance filters the nearest, it does not re-search).
    tol=2 over ts domain 0..4 forces both outcomes."""
    ldata = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rdata = [(k, t, t, 1000 + i) for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(ldata, "k long, ts long, lid long")
    right = spark.createDataFrame(rdata, "k long, ts long, rts long, v long")

    out = TP.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rts", "v"], tolerance=2,
    ).collect()
    assert len(out) == len(ldata)
    by_lid = {r.lid: r for r in out}
    for k, ts, lid in ldata:
        row = by_lid[lid]
        cands = [rt for (rk, rt, _, _) in rdata if rk == k and rt <= ts]
        if not cands or ts - max(cands) > 2:
            assert row.rts is None and row.v is None, row
        else:
            assert row.rts == max(cands), row


def test_asof_tolerance_forward_and_interval(spark):
    """Forward direction honors tolerance on the other side, and
    timestamp columns take INTERVAL-string tolerances."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 0, 0), (1, 100, 1)], "k long, ts_s long, lid long").select(
        "k", F.timestamp_seconds(F.col("ts_s") + 1_700_000_000).alias("ts"), "lid"
    )
    right = spark.createDataFrame([(1, 30, 7)], "k long, ts_s long, v long").select(
        "k", F.timestamp_seconds(F.col("ts_s") + 1_700_000_000).alias("ts"), "v"
    )
    out = {
        r.lid: r.v
        for r in TP.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["v"], direction="forward", tolerance="45 seconds",
        ).collect()
    }
    # lid 0: next right at +30s, inside 45s → matches.
    # lid 1: no right at-or-after → null.
    assert out == {0: 7, 1: None}
    out_tight = {
        r.lid: r.v
        for r in TP.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["v"], direction="forward", tolerance="10 seconds",
        ).collect()
    }
    assert out_tight == {0: None, 1: None}


def test_asof_rejects_unknown_direction(spark):
    left = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    import pytest

    with pytest.raises(ValueError, match="direction"):
        TP.asof_join(
            left, left, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["lid"], direction="nearest",
        )


# ----- interval_join and attribution_join boundary properties -----

interval_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.integers(min_value=0, max_value=120),  # start offset (s)
        st.integers(min_value=0, max_value=90),   # length (s)
    ),
    min_size=0,
    max_size=12,
)
point_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.integers(min_value=0, max_value=240),  # ts offset (s)
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(prows=point_rows, irows=interval_rows)
def test_interval_join_matches_bruteforce(spark, prows, irows):
    """The grid-cell rewrite must produce EXACTLY the pairs of the
    naive [start, end) containment check, including boundary hits
    (point == start in; point == end out) and intervals spanning
    multiple grid cells (grid_seconds=60 < max length 90)."""
    from pyspark.sql import functions as F

    base = 1_700_000_000  # fixed epoch anchor keeps timestamps sane
    pdata = [(k, base + t, i) for i, (k, t) in enumerate(prows)]
    idata = [(k, base + s, base + s + ln, 100 + i) for i, (k, s, ln) in enumerate(irows)]
    points = spark.createDataFrame(pdata, "k long, ts_s long, pid long").select(
        "k", F.timestamp_seconds("ts_s").alias("ts"), "pid"
    )
    intervals = spark.createDataFrame(
        idata, "k long, s_s long, e_s long, iid long"
    ).select(
        "k",
        F.timestamp_seconds("s_s").alias("start"),
        F.timestamp_seconds("e_s").alias("end"),
        "iid",
    )
    out = TP.interval_join(
        points, intervals, on=["k"], point_ts="ts",
        start_col="start", end_col="end", grid_seconds=60,
    ).collect()
    got = {(r.pid, r.iid) for r in out}
    expect = {
        (pid, iid)
        for pk, pt, pid in pdata
        for ik, s, e, iid in idata
        if pk == ik and s <= pt < e
    }
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(crows=point_rows, erows=point_rows)
def test_attribution_join_matches_bruteforce(spark, crows, erows):
    """attribution_join's lookback window is (effect - lookback,
    effect]: inclusive at the effect instant, exclusive at the
    horizon. Check against the naive pairing on generated collisions
    (lookback=60s over offsets 0..240 forces both boundaries)."""
    from pyspark.sql import functions as F

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import joins as SJ

    base = 1_700_000_000
    cdata = [(k, base + t, i) for i, (k, t) in enumerate(crows)]
    edata = [(k, base + t, 100 + i) for i, (k, t) in enumerate(erows)]
    causes = spark.createDataFrame(cdata, "k long, ts_s long, cid long").select(
        "k", F.timestamp_seconds("ts_s").alias("cause_ts"), "cid"
    )
    effects = spark.createDataFrame(edata, "k long, ts_s long, eid long").select(
        "k", F.timestamp_seconds("ts_s").alias("effect_ts"), "eid"
    )
    out = SJ.attribution_join(
        causes, effects, "k", "cause_ts", "effect_ts", lookback="60 seconds"
    ).collect()
    got = {(r.cid, r.eid) for r in out}
    expect = {
        (cid, eid)
        for ck, ct, cid in cdata
        for ek, et, eid in edata
        if ck == ek and et - 60 < ct <= et
    }
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(crows=point_rows, erows=point_rows)
def test_attribution_join_left_keeps_every_effect(spark, crows, erows):
    """how='left' (VERDICT r4 ask #5): attributed pairs identical to
    the inner join; every effect with NO in-window cause appears
    exactly once with null cause columns; the effect-side user key is
    never null (the regression the self-join attribute dedup caused:
    dropping the wrong user column nulls the key on unmatched rows)."""
    from pyspark.sql import functions as F

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import joins as SJ

    base = 1_700_000_000
    cdata = [(k, base + t, i) for i, (k, t) in enumerate(crows)]
    edata = [(k, base + t, 100 + i) for i, (k, t) in enumerate(erows)]
    causes = spark.createDataFrame(cdata, "k long, ts_s long, cid long").select(
        "k", F.timestamp_seconds("ts_s").alias("cause_ts"), "cid"
    )
    effects = spark.createDataFrame(edata, "k long, ts_s long, eid long").select(
        "k", F.timestamp_seconds("ts_s").alias("effect_ts"), "eid"
    )
    out = SJ.attribution_join(
        causes, effects, "k", "cause_ts", "effect_ts",
        lookback="60 seconds", how="left",
    ).collect()

    inner = {
        (cid, eid)
        for ck, ct, cid in cdata
        for ek, et, eid in edata
        if ck == ek and et - 60 < ct <= et
    }
    attributed_effects = {eid for _, eid in inner}
    got_pairs = {(r.cid, r.eid) for r in out if r.cid is not None}
    assert got_pairs == inner
    null_rows = [r for r in out if r.cid is None]
    assert {r.eid for r in null_rows} == {
        eid for _, _, eid in edata
    } - attributed_effects
    assert len(null_rows) == len(set(e[2] for e in edata)) - len(attributed_effects)
    # the effect-side key survives on every row
    assert all(r.k is not None for r in out)
