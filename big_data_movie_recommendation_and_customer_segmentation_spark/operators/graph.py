"""Graph analytics over edge relations: fixed-iteration PageRank.

PageRank here is the deterministic, oracle-replayable variant: a
FIXED number of synchronous power iterations (no convergence RNG, no
early exit), so the whole computation is a finite relational
expression — each iteration is one join + one keyed aggregate, and a
DuckDB oracle can replay it as unrolled CTEs.

100 TB shape: per iteration, the rank relation (|V| rows) joins the
edge relation (|E| rows) hash-partitioned on src, then aggregates by
dst — two exchanges per iteration, both on graph keys, map-side
combined. Rank state is |V| rows total; lineage is truncated with
``localCheckpoint`` each iteration so the plan doesn't grow
super-linearly with iteration count (same discipline as the dedup
closure loop, dedup.py). Skewed hubs are bounded upstream by the
edge builder's governors (e.g. basket-size caps in association.py).

The transitive-closure loop in dedup.py covers the connected-
components half of the graph family; this adds the centrality half.
The reference has no graph operator at all — its similarity work
stops at ranked user pairs (reference: codes/Customer
Segmentation/part1/top_100_pairs.py:95-111 heapq top-100).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    damping: float = 0.85,
    iterations: int = 3,
    round_to: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank after ``iterations`` synchronous power iterations on
    a directed edge relation (feed each undirected edge twice).

    Returns ``(node, pagerank)``. Nodes are the distinct edge
    endpoints; initial rank is 1/N. Nodes without in-edges keep the
    teleport mass (1−d)/N. Out-degree is computed once; a node that
    appears only as a destination contributes nothing (its rank
    still receives teleport + in-flow). Multi-edges count once —
    dedup upstream if the edge builder can emit duplicates.
    """
    # complete-case on endpoints: a NULL src/dst edge previously
    # minted a phantom NULL node that inflated n_nodes and soaked up
    # teleport mass while every equi-join ignored it (r10 self-review)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # Checkpoint the edge relation FIRST: every downstream consumer
    # (degrees, node set, and one join per iteration) re-derives the
    # whole upstream edge-builder pipeline otherwise — measured 15.9 s
    # → 2.6 s warm at sf0.1 on the co-purchase graph, whose pair
    # self-join dominates the query.
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    out_deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(out_deg, "node", "left")  # deg rides in the rank relation:
        .withColumn("deg", F.coalesce("deg", F.lit(0)))  # no per-iter join
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n_nodes = nodes.count()  # scalar driver value (documented, bounded: one agg)
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank")).limit(0)

    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contrib = (
            pr.filter(F.col("deg") > 0)
            .join(e, pr["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("_in"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .withColumn(
                "pr",
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * F.coalesce("_in", F.lit(0.0)),
            )
            .drop("_in")
        )
        if checkpoint:
            pr = pr.localCheckpoint(eager=False)
    return pr.select("node", F.round("pr", round_to).alias("pagerank"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    *,
    damping: float = 0.85,
    iterations: int = 3,
    round_to: int = 6,
    checkpoint: bool = True,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: the teleport mass
    returns to a SEED distribution instead of uniformly to all nodes
    (Haveliwala 2002) — rank becomes "proximity to the seed set via
    the graph", which is the graph-walk recommender ("related to
    this brand/these items") rather than global centrality. The
    Pinterest Pixie recommender is this walk at scale.

    ``seeds`` is a one-column relation of seed node ids; seeds
    absent from the edge set are ignored; the reset weight is
    uniform over the remaining seeds. Rank initializes AT the reset
    distribution, and each iteration computes
    ``(1-d)·r + d·inflow`` — non-seed nodes have r = 0, so mass
    only enters through the seeds and decays with graph distance.

    Plan: identical to ``pagerank`` (2 keyed exchanges per
    iteration, rank state |V| rows) plus ONE extra flag join at
    setup — the reset weights ride in the rank relation like the
    degree does. Empty effective seed set returns no rows (the walk
    is undefined) rather than silently falling back to uniform.

    Determinism: seeded teleport terms are exact short decimals
    (0.15·d^k/n_seeds/Πdeg), so cross-engine summation-order ulp
    drift lands EXACTLY on rounding boundaries (observed at sf0.01:
    4.25e-5 rounding to 4.3 vs 4.2). Each iteration therefore
    quantizes the rank to 1e-12 with binary-deterministic
    ``floor(x·1e12 + 0.5)/1e12`` — drift (~1e-17) is far below the
    step, so both engines re-align to identical doubles — and the
    output applies the same floor-based half-up at ``round_to``
    (string-based ``round()`` differs between engines at ties).
    """
    # complete-case on endpoints: a NULL src/dst edge previously
    # minted a phantom NULL node that inflated n_nodes and soaked up
    # teleport mass while every equi-join ignored it (r10 self-review)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    out_deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(out_deg, "node", "left")
        .withColumn("deg", F.coalesce("deg", F.lit(0)))
        .join(
            seeds.select(F.col(seed_col).alias("node")).distinct()
            .withColumn("_seed", F.lit(1)),
            "node",
            "left",
        )
        .withColumn("_seed", F.coalesce("_seed", F.lit(0)))
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    n_seeds = nodes.filter(F.col("_seed") == 1).count()  # bounded scalar agg
    if n_seeds == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank")).limit(0)
    reset = F.col("_seed") / F.lit(float(n_seeds))

    def quant(col: Column, decimals: int) -> Column:
        scale = float(10**decimals)
        return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)

    pr = nodes.withColumn("pr", reset)
    for _ in range(iterations):
        contrib = (
            pr.filter(F.col("deg") > 0)
            .join(e, pr["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("_in"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .withColumn(
                "pr",
                quant(
                    F.lit(1.0 - damping) * reset
                    + F.lit(damping) * F.coalesce("_in", F.lit(0.0)),
                    12,
                ),
            )
            .drop("_in")
        )
        if checkpoint:
            pr = pr.localCheckpoint(eager=False)
    return pr.select("node", quant(F.col("pr"), round_to).alias("pagerank"))


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components by min-label propagation to FIXPOINT:
    every node's component id is the smallest node id reachable from
    it. The general-graph form of the dedup closure
    (``dedup.dedup_representatives`` resolves duplicate clusters with
    the same propagation, bounded rounds); here convergence is
    checked per round because component diameters are unbounded in
    general graphs.

    Cost: one hash join + keyed min per round, rounds ≈ component
    diameter under simple propagation; each round's labels are
    localCheckpoint-ed (lineage truncation — iterative plans
    otherwise compound until planning itself blows up). At extreme
    diameters the large-star/small-star algorithm (Kiveris et al.
    2014) halves rounds to O(log n) — same per-round plan shape, so
    the swap is local. ``max_rounds`` is a runaway guard; hitting it
    raises rather than returning wrong labels.

    Output: ``(node, component)`` for every endpoint of any edge.
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())  # no phantom NULL node
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Per-round cost (r15 optimization, guide §2.4 "remove shuffles
    # outright"): the old loop paid a third join per round — nxt ⋈
    # labels + count() — just to detect convergence. The changed flag
    # now rides IN the label relation (`_chg`: this node's label
    # decreased this round), so convergence is a short-circuiting
    # take(1) scan of the already-checkpointed labels: one shuffle
    # join per round removed, same round count.
    #
    # Frontier propagation (same fixpoint, standard argument): a
    # node's label can only decrease via a neighbor whose label
    # decreased in the PREVIOUS round (round 1: every initial label is
    # news), so neighbor_min only needs the changed nodes. Labels are
    # monotone non-increasing mins of exact ints — the fixpoint and
    # the per-round labels are identical to full propagation; late
    # rounds shrink from |V| joined rows to the frontier, which AQE
    # then broadcasts. Measured + value-pinned in
    # tests/test_graph_eval.py (chain/star/random-graph equivalence).
    labels = (
        e.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("lbl"))
        .withColumnRenamed("a", "node")
        .withColumn("_chg", F.lit(True))  # round 1: all labels are new
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        frontier = labels.filter(F.col("_chg")).select(
            F.col("node").alias("b"), F.col("lbl").alias("nlbl")
        )
        neighbor_min = (
            e.join(frontier, "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("nlbl").alias("nlbl"))
        )
        labels = (
            labels.select("node", "lbl")
            .join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least("lbl", "nlbl").alias("lbl"),
                F.coalesce(F.col("nlbl") < F.col("lbl"), F.lit(False)).alias("_chg"),
            )
            .localCheckpoint()
        )
        if labels.filter(F.col("_chg")).isEmpty():
            return labels.select("node", F.col("lbl").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts on an undirected
    graph — the local clustering signal (spam rings, tight
    communities) next to PageRank's global centrality.

    The compact-forward algorithm shape: edges canonicalize to
    a < b once, wedges enumerate as (a<b) ⋈ (b<c), and each wedge
    checks its closing edge (a<c) with a semi-join — every triangle
    is found exactly once as a < b < c, so no /6 correction and no
    duplicate wedge work. Cost: one self-join on the wedge pivot +
    one closing-edge join; skew on high-degree pivots is bounded by
    the same basket/frequency governors that bound the edge builder.

    Output: ``(node, n_triangles)`` for nodes in ≥1 triangle.
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    wedges = canon.join(
        canon.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedges.join(
        canon.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_semi"
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
