"""Incremental dedup: a persisted MinHash band index.

The batch miners in ``dedup`` answer "which pairs inside THIS
relation are near-duplicates" — the right shape for a one-shot corpus
build, and the reference's own shape (its dedup state lives in
driver-session datasketch objects rebuilt per run). A 100 TB corpus
is not deduplicated that way: the retained corpus is deduplicated
ONCE, its signatures/band rows are persisted as an index, and every
incoming batch (a daily crawl slice, ~0.1% of corpus size) is checked
AGAINST the index — recomputing signatures over the full corpus per
batch would re-read 100 TB daily for a question whose answer only
needs the (tiny) band table.

Layout under ``{path}/`` — same store-derived-params discipline as
the IVFADC index (``vectorops.build_ivfadc_index``):

- ``bands/``  (doc, v0..v{r-1}) hive-partitioned by ``band_id`` —
  the LSH candidate structure. Partitioning by band makes a
  reduced-recall probe (``bands_to_probe``) a partition-pruned scan,
  and per-band health stats / rewrites partition-local.
- ``sigs/``   (doc, h0..h{p-1}) — signatures, for the zero-corpus-IO
  estimate rescore.
- ``meta/``   one row: every signature-affecting knob (num_perm,
  band_rows, seed, base_hash, n, unit, max_shingle_freq). Queries and
  upserts derive parameters FROM THE INDEX; a caller can't silently
  mix signature spaces.
- ``hot_shingles/`` (only when governed) — the shingles whose
  corpus document-frequency exceeded ``max_shingle_freq`` at BUILD
  time (frozen until a rebuild; compaction does not recompute it —
  watch ``minhash_index_stats.max_bucket`` for drift). Governor
  state is part of the index: a batch
  doc must drop the SAME boilerplate shingles the corpus side
  dropped, or its signature lives in a different space and every
  band comparison is garbage.
- ``tombstones/`` (tomb_id) — logical deletes, applied by queries,
  reclaimed by ``compact_minhash_index``.

Shuffle/scale notes: the query-side join broadcasts the BATCH's band
rows against the stored band table — the corpus side never shuffles
(its scan is also band-pruned under ``bands_to_probe``). Rescore
touches only candidate docs (broadcast semi-joins), so query cost
tracks candidate density, not index size. Compaction is the one
full-rewrite operation: unlike IVFADC cells, the band layout spreads
every doc across ALL band partitions, so there is no partition-local
delete — schedule it by tombstone ratio, not per delete batch.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _shingle_pairs, banded_signature_rows, minhash_signatures
from .similarity import materialization_enabled
from .vectorops import _hadoop_delete, _hadoop_fs, pin_empty_partition


def _maybe_bcast(df: DataFrame, flag: bool) -> DataFrame:
    """Broadcast hint gated on the caller's ``broadcast_batch`` flag:
    a batch declared too large to broadcast must stay unhinted on
    EVERY batch-sized join side, not just the band probe (ADVICE r13
    — the rescore legs used to force-broadcast unconditionally).
    With the hint absent, AQE picks the strategy."""
    return F.broadcast(df) if flag else df


_PIN_TRACK = threading.local()


def _pin(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint behind the global materialization
    kill-switch (SPARK_GRAFT_NO_MATERIALIZE — plan tooling and plan
    asserts need the un-truncated lineage). When a ``track_pins``
    scope is active on this thread, the pin is registered for
    release at scope exit (ADVICE r14)."""
    if not materialization_enabled():
        return df
    out = df.localCheckpoint(eager=False)
    scope = getattr(_PIN_TRACK, "active", None)
    if scope is not None:
        scope.append(out)
    return out


def _release_pin(df: DataFrame) -> None:
    """Release the block-manager storage behind ONE localCheckpoint
    (ADVICE r14): the checkpointed RDD lives inside the DataFrame's
    LogicalRDD plan node, out of ``DataFrame.unpersist()``'s reach —
    a per-batch caller that never releases accumulates one pinned
    RDD per call for the process's lifetime. No-op for un-pinned
    plans (materialization kill-switch). The DataFrame must not be
    re-evaluated afterwards (truncated lineage cannot recompute)."""
    jplan = df._jdf.queryExecution().analyzed()
    if jplan.getClass().getName().endswith(".LogicalRDD"):
        jplan.rdd().unpersist(False)


@contextmanager
def track_pins():
    """Scope for per-batch callers (the streaming gates): every
    ``_pin`` this thread creates inside the scope — including nested
    ones whose LogicalRDD hides inside another checkpoint's RDD
    lineage, unreachable by any plan walk — is released at exit, so
    the block manager stays flat across micro-batches instead of
    growing by ~4 pinned RDDs per batch (ADVICE r14). Everything
    produced under the scope must be fully consumed before it closes
    (truncated lineage cannot recompute). Nested scopes compose: the
    inner scope releases its own pins only."""
    prev = getattr(_PIN_TRACK, "active", None)
    mine: list[DataFrame] = []
    _PIN_TRACK.active = mine
    try:
        yield
    finally:
        _PIN_TRACK.active = prev
        for df in mine:
            _release_pin(df)


def _read_meta(spark: SparkSession, path: str):
    """Driver-side ``.collect()`` bounded by construction: ``meta/``
    holds exactly ONE row (the frozen knob tuple ``build`` writes) at
    any corpus scale — O(1), not O(index)."""
    return spark.read.parquet(f"{path}/meta").collect()[0]


def _hot_shingles(spark: SparkSession, path: str) -> DataFrame | None:
    fs, hpath = _hadoop_fs(spark, f"{path}/hot_shingles")
    if fs.exists(hpath):
        return spark.read.parquet(f"{path}/hot_shingles")
    return None


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    fs, hpath = _hadoop_fs(spark, f"{path}/tombstones")
    if fs.exists(hpath):
        return spark.read.parquet(f"{path}/tombstones")
    return None


def _governed_shingles(
    docs: DataFrame, id_col: str, text_col: str, meta, hot: DataFrame | None
) -> DataFrame:
    """(doc, shingle) relation in the INDEX's signature space: the
    index's shingle unit/width (or, for a set-input index built with
    ``item_col``, the raw item column), minus its frozen hot set."""
    if meta.unit == "items":
        pairs = docs.select(
            F.col(id_col).alias("doc"), F.col(text_col).alias("shingle")
        ).distinct()
    else:
        pairs = _shingle_pairs(docs, id_col, text_col, meta.n, unit=meta.unit)
    if hot is not None:
        # no broadcast hint: the hot set is usually tiny but is
        # corpus-dependent (a boilerplate-heavy corpus can make it
        # large) — let AQE pick, same as the batch miners' governors
        pairs = pairs.join(hot, "shingle", "left_anti")
    return pairs


def _input_col(meta, text_col: str, item_col: str | None) -> str:
    """Resolve the batch-side input column and REFUSE a mode mix: a
    set-input index (meta.unit == 'items') must be probed with
    ``item_col``; a text index must not be."""
    if meta.unit == "items":
        if item_col is None:
            raise ValueError(
                "this index was built with item_col (set input); pass item_col"
            )
        return item_col
    if item_col is not None:
        raise ValueError(
            f"this index was built over text (unit={meta.unit!r}); drop item_col"
        )
    return text_col


def load_index_state(spark: SparkSession, path: str):
    """One round-trip read of the index's frozen parameters and
    governor state — ``(meta, hot_shingles-or-None)``. Callers that
    probe the same index repeatedly (the streaming gate: screen +
    within-batch leg + upsert per micro-batch) pass this via
    ``index_state`` instead of paying the meta/hot reads per leg.

    Entry also self-heals a crash inside a prior rebuild's
    whole-index swap (``_recover_build``) or a prior table-level
    rename-swap (``_recover_compaction`` — compaction's bands/sigs,
    upsert's tombstone restore) — a handful of existence probes,
    negligible next to any Spark job."""
    _recover_build(spark, path)
    _recover_compaction(spark, path)
    return _read_meta(spark, path), _hot_shingles(spark, path)


def minhash_index_fingerprint(spark: SparkSession, path: str) -> str:
    """Content fingerprint of the LIVE index generation — the
    provenance handle a lineage manifest records next to every slice
    screened through this index (``operators.lineage``, the
    ``decontam_index_fingerprint`` discipline one tier over): the
    16-hex XOR of (a) every live signature row (doc + h0..h{p-1},
    tombstoned docs excluded), (b) the hot-shingle governor set, and
    (c) the driver-side md5-prefix of the frozen knob tuple. A pure
    function of screen-relevant CONTENT: invariant under compaction,
    append order, and file layout; changed by any membership,
    tombstone, governor, or knob difference — same fingerprint ⇒
    bit-identical screen behavior. Cost: one scan + partial-XOR
    aggregation over the signature table (O(index), run at
    generation events — never per batch)."""
    import hashlib

    meta, hot = load_index_state(spark, path)
    from ..functions import textops as TX

    sigs = spark.read.parquet(f"{path}/sigs")
    tomb = _tombstones(spark, path)
    if tomb is not None:
        sigs = sigs.join(
            F.broadcast(tomb.withColumnRenamed("tomb_id", "doc")),
            "doc",
            "left_anti",
        )

    def _xor(df: DataFrame, cols: list[str]) -> int:
        row = (
            df.select(
                TX.shared_token_hash60(
                    F.concat_ws(":", *[F.col(c).cast("string") for c in cols])
                ).alias("_h")
            )
            .agg(F.expr("bit_xor(_h)").alias("_fp"))
            .collect()[0]
        )
        return int(row["_fp"] or 0)

    fp = _xor(sigs, ["doc"] + [f"h{i}" for i in range(int(meta.num_perm))])
    if hot is not None:
        fp ^= _xor(hot, ["shingle"])
    knobs = ":".join(
        str(meta[f])
        for f in (
            "num_perm", "band_rows", "seed", "base_hash", "n", "unit",
            "max_shingle_freq",
        )
    )
    # the same 60-bit md5-prefix primitive, driver-side (one tuple)
    fp ^= int(hashlib.md5(knobs.encode()).hexdigest()[:15], 16)
    return format(fp, "016x")


def build_minhash_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int | None = None,
    num_perm: int = 32,
    band_rows: int = 2,
    seed: int = 42,
    base_hash: str = "xxhash64",
    unit: str = "word",
    max_shingle_freq: int | None = None,
    item_col: str | None = None,
) -> None:
    """Materialize the MinHash band index for ``corpus`` at ``path``.

    One pass over the corpus text: shingle → (optional) governor →
    signatures, written once to ``sigs/`` and then band-melted from
    the STORED signatures (the melt re-reads parquet instead of
    re-running the shingle/agg pipeline — an index build is a chain
    of materializations, not a lineage tree). A rebuild is a new
    index generation: stale tombstones are dropped (same rule as
    ``build_ivfadc_index`` — a tombstone must not outlive the
    generation it was issued against).

    ``max_shingle_freq`` is the boilerplate governor from the batch
    miners; here the dropped hot set is PERSISTED so later batches
    and upserts hash in the identical signature space.

    ``n`` defaults by unit — 3 for ``'word'``, 5 for ``'char'`` (the
    miners' per-unit conventions; carrying a word-scale n to the
    char unit degrades the shingle space — same rationale as
    ``ngram_decontaminate``'s unit-aware default, ADVICE r12).

    ``item_col`` switches the index to SET input: ``corpus`` is a
    (id, item) relation — e.g. (customer, part) purchase sets, the
    reference's S1 "similar users" shape (top_100_pairs.py:54-94) —
    indexed exactly as ``minhash_set_pairs`` mines it in-session, so
    entity-similarity screening of NEW entities against an existing
    population becomes an index probe instead of a recompute. Items
    are hashed as-is (cast non-string items to string when building
    with the md5 oracle hash); ``n``/``unit`` are recorded as
    (NULL, 'items') and every query/upsert derives the mode from
    meta — the two input shapes cannot be silently mixed.
    """
    if num_perm % band_rows != 0:
        # fail BEFORE any corpus pass: banded_signature_rows would
        # raise the same error, but only after the signature write
        raise ValueError(
            f"num_perm ({num_perm}) must be a multiple of band_rows "
            f"({band_rows}) — the index would band on fewer permutations "
            f"than sigs store, silently lowering LSH recall"
        )
    if item_col is not None:
        unit, n = "items", None
        pairs = corpus.select(
            F.col(id_col).alias("doc"), F.col(item_col).alias("shingle")
        ).distinct()
    else:
        if n is None:
            n = 3 if unit == "word" else 5
        pairs = _shingle_pairs(corpus, id_col, text_col, n, unit=unit)
    spark = corpus.sparkSession
    _recover_build(spark, path)
    # Stage the whole generation into a sibling directory and swap it
    # in as a unit (ADVICE r13, medium): writing hot_shingles → sigs →
    # bands → meta sequentially AT the live path means a crash
    # mid-rebuild leaves mixed-generation state (new sigs under old
    # meta/bands) that queries consume silently — exactly the
    # signature-space mixing the derive-params-from-meta design
    # exists to prevent. A crash anywhere before the swap leaves the
    # live index untouched; a crash inside the swap is healed on the
    # next entry (_recover_build: meta/_SUCCESS, written last, marks
    # the build complete).
    tmp = f"{path}__build"
    _hadoop_delete(spark, tmp)
    with track_pins():
        if max_shingle_freq is not None:
            # r16 (VERDICT r15 ask #6): the hot-shingle write and the
            # signature write each ran the full shingle explode+
            # distinct (two separate write jobs over the same
            # subtree). Pin the relation once before the governor so
            # the second job reads the materialized copy; released at
            # scope exit (the build consumes everything eagerly).
            pairs = _pin(pairs)
            (
                pairs.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") > max_shingle_freq)
                .select("shingle")
                .write.mode("overwrite")
                .parquet(f"{tmp}/hot_shingles")
            )
            hot = spark.read.parquet(f"{tmp}/hot_shingles")
            pairs = pairs.join(hot, "shingle", "left_anti")  # AQE-sized, as above

        minhash_signatures(
            pairs, num_perm=num_perm, seed=seed, base_hash=base_hash
        ).write.mode("overwrite").parquet(f"{tmp}/sigs")

    stored_sig = spark.read.parquet(f"{tmp}/sigs")
    (
        banded_signature_rows(stored_sig, num_perm, band_rows)
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(f"{tmp}/bands")
    )
    # An EMPTY corpus (the normal starting state of a streaming
    # near-dedup gate) writes zero band rows, and a partitioned write
    # of zero rows leaves no schema-bearing file — the first query
    # would then wedge on schema inference (the exact failure class
    # dedup_append_writer's committed-glob probe fixed, r10). Pin one
    # empty partition so the empty index is readable; the first
    # upsert appends real partitions beside it.
    fs, _ = _hadoop_fs(spark, path)
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    have = fs.globStatus(Path(f"{tmp}/bands/band_id=*/*.parquet"))
    if have is None or len(have) == 0:
        pin_empty_partition(
            banded_signature_rows(stored_sig, num_perm, band_rows),
            f"{tmp}/bands",
            "band_id",
        )

    # meta LAST: its _SUCCESS marker is the build-complete flag
    # _recover_build trusts. Stale tombstones are dropped simply by
    # not existing in the new generation directory (a tombstone must
    # not outlive the generation it was issued against).
    spark.createDataFrame(
        [(num_perm, band_rows, seed, base_hash, n, unit, max_shingle_freq)],
        "num_perm int, band_rows int, seed int, base_hash string, "
        "n int, unit string, max_shingle_freq int",
    ).write.mode("overwrite").parquet(f"{tmp}/meta")
    _swap_index_dir(spark, tmp, path)


def minhash_index_dedup(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    rescore: str = "estimate",
    corpus_docs: DataFrame | None = None,
    bands_to_probe: int | None = None,
    broadcast_batch: bool = True,
    exclude_id_eq: bool = True,
    item_col: str | None = None,
    index_state: tuple | None = None,
    batch_pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs between a NEW batch and the indexed
    corpus, without recomputing anything corpus-side.

    The batch's shingles/signatures/band rows are computed with the
    index's OWN frozen parameters and governor state (meta +
    hot_shingles — never caller-supplied knobs), then its band rows
    are broadcast against the stored band table: the corpus side is
    a pruned parquet scan plus a broadcast hash join — NO shuffle of
    corpus data, which is the entire point at 100 TB.

    ``rescore``:

    - ``'estimate'`` (default): join the candidates' STORED
      signatures with the batch's — ``jaccard_est`` is the agreeing
      fraction of the ``num_perm`` components (the unbiased MinHash
      estimator, Broder 1997; σ ≈ √(j(1−j)/p) ≈ 0.09 at p=32,
      j=0.5). Zero reads of corpus text. Output: new_id, corpus_id,
      n_agree, jaccard_est.
    - ``'exact'``: true Jaccard over shingle sets, rebuilt ONLY for
      candidate docs (requires ``corpus_docs`` — the candidate ids
      are broadcast-semi-joined into it, so the text scan is pushed
      to the candidate set). Output: new_id, corpus_id, n_common,
      n_new, n_corpus, jaccard — the same contract as
      ``minhash_duplicate_pairs`` restricted to cross pairs
      (equivalence-tested).

    ``bands_to_probe``: probe only bands 0..k-1 — a partition-pruned
    scan of ``bands/`` (PartitionFilters, asserted in tests). Recall
    at threshold j falls from 1−(1−j^r)^B to 1−(1−j^r)^k: the
    standard LSH cost/recall knob for low-stakes screening passes.

    ``exclude_id_eq`` drops candidates whose corpus id equals the
    batch id (re-crawled docs trivially match themselves).
    Tombstoned corpus docs never surface.

    ``broadcast_batch=False`` declares the batch too large to
    broadcast: the hint is dropped from EVERY batch-sized join side —
    the band probe AND the rescore legs (new_side/new_sets) — and AQE
    picks the strategy (ADVICE r13: the rescore used to
    force-broadcast regardless).
    """
    if rescore not in ("estimate", "exact"):
        raise ValueError(f"rescore must be 'estimate' or 'exact', got {rescore!r}")
    if rescore == "exact" and corpus_docs is None:
        raise ValueError("rescore='exact' needs corpus_docs (candidate text re-read)")
    meta, hot = index_state if index_state is not None else load_index_state(spark, path)
    in_col = _input_col(meta, text_col, item_col)

    if batch_pairs is None:
        batch_pairs = _governed_shingles(new_docs, id_col, in_col, meta, hot)
    # else: caller pre-derived the governed (doc, shingle) relation in
    # THIS index's signature space (minhash_index_screen shares one
    # relation across its legs — r12 review: the screen shingled the
    # batch twice). It feeds the batch band rows AND (per rescore
    # path) sigs/sets — one lazy materialization either way.
    batch_pairs = _pin(batch_pairs)
    batch_sig = _pin(
        minhash_signatures(
            batch_pairs, num_perm=meta.num_perm, seed=meta.seed, base_hash=meta.base_hash
        )
    )
    batch_bands = banded_signature_rows(batch_sig, meta.num_perm, meta.band_rows)

    stored_bands = spark.read.parquet(f"{path}/bands")
    if bands_to_probe is not None:
        stored_bands = stored_bands.filter(F.col("band_id") < bands_to_probe)
        batch_bands = batch_bands.filter(F.col("band_id") < bands_to_probe)

    join_keys = ["band_id"] + [f"v{r}" for r in range(meta.band_rows)]
    probe = batch_bands.withColumnRenamed("doc", "new_id")
    if broadcast_batch:
        probe = F.broadcast(probe)
    cand = (
        stored_bands.withColumnRenamed("doc", "corpus_id")
        .join(probe, join_keys)
        .select("new_id", "corpus_id")
        .distinct()
    )
    if exclude_id_eq:
        cand = cand.filter(F.col("new_id") != F.col("corpus_id"))
    tomb = _tombstones(spark, path)
    if tomb is not None:
        cand = cand.join(
            F.broadcast(tomb.withColumnRenamed("tomb_id", "corpus_id")),
            "corpus_id",
            "left_anti",
        )
    # cand feeds the id lists and the rescore join — tiny by the LSH
    # property, and re-deriving it would rerun the band join
    cand = _pin(cand)

    if rescore == "estimate":
        stored_sig = spark.read.parquet(f"{path}/sigs")
        corpus_side = stored_sig.join(
            F.broadcast(cand.select(F.col("corpus_id").alias("doc")).distinct()),
            "doc",
            "left_semi",
        ).select(
            F.col("doc").alias("corpus_id"),
            *[F.col(f"h{i}").alias(f"_c{i}") for i in range(meta.num_perm)],
        )
        new_side = batch_sig.select(
            F.col("doc").alias("new_id"),
            *[F.col(f"h{i}").alias(f"_n{i}") for i in range(meta.num_perm)],
        )
        n_agree = sum(
            F.when(F.col(f"_c{i}") == F.col(f"_n{i}"), 1).otherwise(0)
            for i in range(meta.num_perm)
        )
        return (
            cand.join(_maybe_bcast(new_side, broadcast_batch), "new_id")
            .join(corpus_side, "corpus_id")
            .select(
                "new_id",
                "corpus_id",
                n_agree.alias("n_agree"),
                (n_agree / F.lit(float(meta.num_perm))).alias("jaccard_est"),
            )
            .filter(F.col("jaccard_est") >= threshold)
        )

    # exact rescore: shingle sets only for candidate docs, both sides
    corpus_ids = cand.select(F.col("corpus_id").alias(id_col)).distinct()
    corpus_sets = (
        _governed_shingles(
            corpus_docs.join(F.broadcast(corpus_ids), id_col, "left_semi"),
            id_col,
            in_col,
            meta,
            hot,
        )
        .groupBy("doc")
        .agg(F.collect_set("shingle").alias("_ic"))
        .select(F.col("doc").alias("corpus_id"), "_ic")
    )
    new_ids = cand.select(F.col("new_id").alias("doc")).distinct()
    new_sets = (
        batch_pairs.join(F.broadcast(new_ids), "doc", "left_semi")
        .groupBy("doc")
        .agg(F.collect_set("shingle").alias("_in"))
        .select(F.col("doc").alias("new_id"), "_in")
    )
    inter = F.size(F.array_intersect("_in", "_ic"))
    return (
        cand.join(_maybe_bcast(new_sets, broadcast_batch), "new_id")
        .join(corpus_sets, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            inter.alias("n_common"),
            F.size("_in").alias("n_new"),
            F.size("_ic").alias("n_corpus"),
            (inter / (F.size("_in") + F.size("_ic") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_index_screen(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    within_batch: bool = True,
    item_col: str | None = None,
    index_state: tuple | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """SURVIVORS of a batch screened against the indexed corpus —
    the admission decision shared by batch pipelines and the
    streaming gate (``streaming.sinks.near_dedup_gate_writer`` is
    this + an epoch write + an upsert). Three filters, in order:

    1. cross-corpus: docs with a near-dup already IN the index are
       dropped (estimate rescore; hits against the batch's own ids
       are ignored — same-batch pairs are filter 3's decision, and
       under at-least-once replay the batch's survivors are already
       in the index and must not retro-drop each other);
    2. visibility: docs whose governed shingle set is empty (pure
       boilerplate under the hot-shingle governor, null text) are
       dropped — the index could never screen their future copies
       (exact dedup owns them, per the ladder's layering contract);
    3. within-batch (optional): of each near-dup pair inside the
       batch, the higher id is dropped (the SemDeDup one-pass rule,
       exact rescore — text in hand).

    Returns the surviving rows of ``new_docs`` (all columns).
    Deterministic; admitting the result via ``upsert_minhash_index``
    makes the next batch screen against it. ``broadcast_batch=False``
    drops the broadcast hints on every batch-derived join side
    (flagged/visible/loser id lists and the probe inside the
    cross-corpus query), letting AQE decide — same contract as
    ``minhash_index_dedup``.
    """
    meta, hot = index_state if index_state is not None else load_index_state(spark, path)
    in_col = _input_col(meta, text_col, item_col)
    batch_ids = new_docs.select(F.col(id_col)).distinct()

    # ONE governed shingle relation for all three legs (r12 review:
    # the screen previously shingled the batch twice — once inside
    # the cross-corpus query, again for visibility/within-batch)
    rel = _pin(_governed_shingles(new_docs, id_col, in_col, meta, hot))

    hits = minhash_index_dedup(
        spark,
        path,
        new_docs,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        rescore="estimate",
        item_col=item_col,
        index_state=(meta, hot),
        batch_pairs=rel,
        broadcast_batch=broadcast_batch,
    )
    flagged = (
        hits.join(
            _maybe_bcast(
                batch_ids.withColumnRenamed(id_col, "corpus_id"), broadcast_batch
            ),
            "corpus_id",
            "left_anti",
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    fresh = new_docs.join(_maybe_bcast(flagged, broadcast_batch), id_col, "left_anti")

    visible = rel.select(F.col("doc").alias(id_col)).distinct()
    fresh = fresh.join(_maybe_bcast(visible, broadcast_batch), id_col, "left_semi")

    if within_batch:
        from .dedup import minhash_set_pairs

        # restrict the shared relation to survivors — the within-batch
        # decision must not see docs the cross-corpus screen dropped
        pairs = minhash_set_pairs(
            rel.join(
                _maybe_bcast(
                    fresh.select(F.col(id_col).alias("doc")).distinct(),
                    broadcast_batch,
                ),
                "doc",
                "left_semi",
            ),
            threshold=threshold,
            num_perm=meta.num_perm,
            band_rows=meta.band_rows,
            seed=meta.seed,
            base_hash=meta.base_hash,
        )
        # doc_a < doc_b by construction: doc_b is the loser
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        fresh = fresh.join(_maybe_bcast(losers, broadcast_batch), id_col, "left_anti")
    return fresh


def upsert_minhash_index(
    new_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    item_col: str | None = None,
    index_state: tuple | None = None,
) -> dict[str, int]:
    """Admit accepted batch docs into the index: signatures/band rows
    computed with the index's frozen parameters + governor state,
    APPENDED to ``sigs/`` and ``bands/`` — O(batch) I/O, no corpus
    rewrite (appending to a band partition adds a file; it does not
    rewrite the partition).

    Id semantics (insert-or-restore, never in-place update): a batch
    id already physically present in the index is NOT re-appended —
    its rows are already there; if it was tombstoned, the tombstone
    is cleared, restoring the stored rows (the delete→re-admit cycle
    of a doc whose content is unchanged). CHANGING a stored doc's
    content requires delete → ``compact_minhash_index`` → upsert:
    band rows live in every band partition, so an in-place update
    would be a full-index rewrite hidden inside an "upsert" — the
    index makes that cost explicit instead. Returns
    ``{"inserted": n, "restored": n}``.
    """
    spark = new_docs.sparkSession
    meta, hot = index_state if index_state is not None else load_index_state(spark, path)
    in_col = _input_col(meta, text_col, item_col)

    # batch-sized; pinned once — it feeds the presence probe, the
    # tombstone clears, and the final count (r12 review: three
    # re-derivations per upsert on the job-latency-bound gate path).
    # Every pin created here is batch-scoped and released in the
    # finally below (ADVICE r14: a per-batch gate caller would
    # otherwise pin ~4 RDDs per micro-batch forever).
    _pins: list[DataFrame] = []
    batch_ids = new_docs.select(F.col(id_col).alias("doc")).distinct().localCheckpoint(
        eager=True
    )
    _pins.append(batch_ids)
    present = spark.read.parquet(f"{path}/sigs").select("doc").join(
        F.broadcast(batch_ids), "doc", "left_semi"
    )
    # bounded by the batch size; pinned because it feeds the anti-join,
    # the restore rewrite, and both counts
    present = present.localCheckpoint(eager=True)
    _pins.append(present)
    to_insert = new_docs.join(
        present.withColumnRenamed("doc", id_col), id_col, "left_anti"
    )

    try:
        pairs = _governed_shingles(to_insert, id_col, in_col, meta, hot)
        sig = _pin(
            minhash_signatures(
                pairs, num_perm=meta.num_perm, seed=meta.seed, base_hash=meta.base_hash
            )
        )
        _pins.append(sig)
        # bands BEFORE sigs: presence (and therefore re-upsert skipping)
        # is judged from sigs, so a crash between the two appends must
        # leave the doc ABSENT from sigs — the retry then re-appends
        # both, and a duplicated band row is harmless (the query's
        # candidate set is distinct()). The reverse order would strand
        # docs present in sigs but bandless: invisible to queries, yet
        # skipped by every future upsert.
        (
            banded_signature_rows(sig, meta.num_perm, meta.band_rows)
            .write.mode("append")
            .partitionBy("band_id")
            .parquet(f"{path}/bands")
        )
        sig.write.mode("append").parquet(f"{path}/sigs")

        n_restored = 0
        tomb = _tombstones(spark, path)
        if tomb is not None:
            # EVERY upserted id's tombstone must clear — including a
            # tombstoned-but-absent id we just INSERTED (e.g. deleted,
            # compacted away, then re-admitted): leaving its tombstone
            # would shield the freshly appended rows from every query
            # (r12 review). "restored" counts only the tombstoned ∧
            # physically-present ids, whose STORED rows come back into
            # view — a tombstoned-absent id is a plain insert, counted
            # once under "inserted".
            batch_tombs = tomb.join(
                F.broadcast(batch_ids.withColumnRenamed("doc", "tomb_id")),
                "tomb_id",
                "left_semi",
            ).localCheckpoint(eager=True)
            _pins.append(batch_tombs)
            n_restored = batch_tombs.join(
                present.withColumnRenamed("doc", "tomb_id"), "tomb_id", "left_semi"
            ).count()
            if batch_tombs.count():
                kept = tomb.join(batch_tombs, "tomb_id", "left_anti").localCheckpoint(
                    eager=True
                )
                _pins.append(kept)
                if kept.count() > 0:
                    # NOT a plain overwrite (ADVICE r13): Spark overwrite
                    # deletes the target before committing, so a crash
                    # mid-write could lose tombstones for UNRELATED docs,
                    # silently resurrecting deleted corpus docs. Write to
                    # a sibling temp table and rename-swap, the same
                    # discipline compaction uses.
                    tmp = f"{path}/tombstones__restore"
                    _hadoop_delete(spark, tmp)
                    kept.write.parquet(tmp)
                    _swap_in(spark, tmp, f"{path}/tombstones")
                else:
                    _drop_tombstones(spark, path)
        n_present = present.count()
        return {
            "inserted": batch_ids.count() - n_present,
            "restored": n_restored,
        }
    finally:
        for p in _pins:
            _release_pin(p)


def delete_from_minhash_index(
    delete_ids: DataFrame, path: str, *, id_col: str = "doc_id"
) -> None:
    """Logically delete docs by appending tombstones — O(batch) I/O,
    applied by every query immediately, reclaimed by compaction.
    Same churn-friendly split as the IVFADC delete lifecycle.

    Entry heals pending swaps first (r13 review): appending to a
    tombstone table whose live copy is set aside mid-restore would
    create a FRESH table that permanently masks the heal —
    ``_recover_compaction`` would see live-present and never
    reinstate the ``__restore`` holding every unrelated tombstone."""
    spark = delete_ids.sparkSession
    _recover_build(spark, path)
    _recover_compaction(spark, path)
    (
        delete_ids.select(F.col(id_col).alias("tomb_id"))
        .distinct()
        .write.mode("append")
        .parquet(f"{path}/tombstones")
    )


def _rename_or_raise(spark, src: str, dst: str) -> None:
    fs, _ = _hadoop_fs(spark, src)
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    # Hadoop rename reports failure via its RETURN VALUE, not an
    # exception (r12 review: the unchecked call could silently leave
    # the table missing at the stable path)
    if not fs.rename(Path(src), Path(dst)):
        raise IOError(f"rename failed: {src} -> {dst}")


def _swap_in(spark, tmp: str, live: str) -> None:
    """Swap ``tmp`` into place at ``live`` without a window where the
    stable path is deleted-but-unreplaced: set the live table ASIDE
    (rename, not delete), move the new one in, then drop the
    set-aside. A crash at any point leaves either the old or the new
    complete table recoverable (``_recover_compaction``)."""
    old = f"{live}__old"
    _hadoop_delete(spark, old)  # stale set-aside from a crashed attempt
    _rename_or_raise(spark, live, old)
    try:
        _rename_or_raise(spark, tmp, live)
    except Exception:
        fs, _ = _hadoop_fs(spark, live)
        Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
        fs.rename(Path(old), Path(live))  # best-effort restore
        raise
    _hadoop_delete(spark, old)


def _swap_index_dir(spark, tmp: str, live: str) -> None:
    """Whole-index ``_swap_in``: a rebuild over an existing index
    swaps the finished generation directory in as a UNIT, so readers
    never see new sigs under old meta/bands (ADVICE r13). Tolerates
    an absent live directory (first-ever build). A crash at any point
    leaves a complete generation recoverable (``_recover_build``)."""
    fs, _ = _hadoop_fs(spark, live)
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    old = f"{live}__old"
    _hadoop_delete(spark, old)  # stale set-aside from a crashed attempt
    if fs.exists(Path(live)):
        _rename_or_raise(spark, live, old)
    try:
        _rename_or_raise(spark, tmp, live)
    except Exception:
        if fs.exists(Path(old)):
            fs.rename(Path(old), Path(live))  # best-effort restore
        raise
    _hadoop_delete(spark, old)


def _recover_build(spark, path: str) -> None:
    """Self-heal a crash inside a prior rebuild's whole-index swap
    (``_swap_index_dir``): if the index directory is missing,
    reinstate whichever complete generation exists — the finished
    build (``{path}__build`` with its ``meta/_SUCCESS`` marker,
    written last, wins: it is the newer generation) else the
    set-aside ``{path}__old``. No-op (a few existence probes) when
    the index is healthy."""
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    fs, _ = _hadoop_fs(spark, path)
    if fs.exists(Path(path)):
        return
    build, old = f"{path}__build", f"{path}__old"
    if fs.exists(Path(f"{build}/meta/_SUCCESS")):
        _rename_or_raise(spark, build, path)
        _hadoop_delete(spark, old)
    elif fs.exists(Path(old)):
        _rename_or_raise(spark, old, path)


def _recover_compaction(spark, path: str) -> None:
    """Self-heal a crash inside a prior ``_swap_in``: if a live table
    is missing, reinstate whichever complete copy exists — the
    finished rewrite (``__compact``/``__restore`` with its _SUCCESS
    marker wins: it is the newer state) else the set-aside ``__old``.
    Covers compaction's bands/sigs rewrites AND upsert's
    tombstone-restore swap (ADVICE r13); an absent tombstone table
    with no swap debris is the normal no-tombstones state, untouched."""
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    fs, _ = _hadoop_fs(spark, path)
    for table, tmp_suffix in (
        ("bands", "__compact"),
        ("sigs", "__compact"),
        ("tombstones", "__restore"),
    ):
        live = f"{path}/{table}"
        if fs.exists(Path(live)):
            continue
        tmp, old = f"{live}{tmp_suffix}", f"{live}__old"
        if fs.exists(Path(f"{tmp}/_SUCCESS")):
            _rename_or_raise(spark, tmp, live)
            # the set-aside is now an obsolete generation — drop it,
            # or a later swap/heal could rename INTO it (Hadoop local
            # rename nests src inside an existing dst dir)
            _hadoop_delete(spark, old)
        elif fs.exists(Path(old)):
            _rename_or_raise(spark, old, live)


def _drop_tombstones(spark, path: str) -> None:
    """Remove the tombstone table AND any swap debris from a crashed
    tombstone-restore (``__restore``/``__old``): a stale complete
    ``__restore`` left beside a legitimately-absent live table would
    otherwise be resurrected by ``_recover_compaction`` as if it were
    the newer state. Debris is deleted BEFORE the live table (r13
    review): the reverse order, crashed between the two deletes,
    leaves exactly that live-absent + complete-``__restore`` state."""
    for suffix in ("__restore", "__old", ""):
        _hadoop_delete(spark, f"{path}/tombstones{suffix}")


def compact_minhash_index(path: str, spark: SparkSession | None = None) -> int:
    """Physically remove tombstoned docs and drop the tombstone
    table. Returns the number of DOCS removed.

    Unlike IVFADC compaction (rewrites only affected cell
    partitions), every doc has a row in EVERY band partition, so
    this is a full rewrite of ``sigs/`` and ``bands/`` — run it on a
    tombstone-ratio cadence, not per delete. Each table's rewrite
    streams into a sibling directory and is swapped in by rename
    (``_swap_in`` — the live table is set aside, never
    deleted-before-replaced), so nothing index-sized is pinned in
    executor storage and readers always find a complete table at the
    stable path.

    Crash safety (r12 review): re-running compact after a crash at
    ANY point converges. ``bands`` swaps FIRST and the work-to-do
    probe reads ``sigs`` (swapped LAST), so a crash between the two
    swaps leaves the probe positive and the retry rewrites both
    (re-rewriting already-clean bands is a no-op); tombstones are
    dropped only after both swaps. A crash INSIDE a swap is healed
    on entry by ``_recover_compaction``."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    _recover_build(spark, path)
    _recover_compaction(spark, path)
    tomb = _tombstones(spark, path)
    if tomb is None:
        return 0
    tomb_docs = tomb.withColumnRenamed("tomb_id", "doc")
    sigs = spark.read.parquet(f"{path}/sigs")
    removed = sigs.join(tomb_docs, "doc", "left_semi").count()
    if removed:
        emptied = removed == sigs.count()
        for table, part_col in (("bands", "band_id"), ("sigs", None)):
            kept = spark.read.parquet(f"{path}/{table}").join(
                tomb_docs, "doc", "left_anti"
            )
            tmp = f"{path}/{table}__compact"
            if emptied and part_col:
                # a partitioned write of zero rows leaves no
                # schema-bearing file; pin one empty partition so the
                # table stays readable (same edge as IVFADC compact)
                pin_empty_partition(kept, tmp, part_col)
            else:
                writer = kept.write.mode("overwrite")
                if part_col:
                    writer = writer.partitionBy(part_col)
                writer.parquet(tmp)
            _swap_in(spark, tmp, f"{path}/{table}")
    _drop_tombstones(spark, path)
    return removed


def minhash_index_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-band health report: rows, docs, distinct buckets, and the
    largest bucket — the governor dashboard. ``max_bucket`` is the
    candidate-join hot-key bound: a bucket of size s on the corpus
    side contributes s candidates PER MATCHING BATCH ROW, so a
    growing max_bucket (boilerplate drifting past the frozen
    hot-shingle set) is the signal to rebuild with a tighter
    ``max_shingle_freq``. One aggregate over the band table; no text
    is read. Output: band_id, n_docs, n_buckets, max_bucket (live
    docs only — tombstoned rows are excluded, and rows are counted
    DISTINCT per (band, bucket, doc): a retried upsert legitimately
    leaves duplicated band rows (its crash contract), which must not
    inflate the dashboard into spurious rebuild alarms — r12
    review)."""
    _recover_build(spark, path)
    _recover_compaction(spark, path)
    meta = _read_meta(spark, path)
    bands = spark.read.parquet(f"{path}/bands")
    tomb = _tombstones(spark, path)
    if tomb is not None:
        bands = bands.join(
            F.broadcast(tomb.withColumnRenamed("tomb_id", "doc")), "doc", "left_anti"
        )
    v_cols = [f"v{r}" for r in range(meta.band_rows)]
    buckets = (
        bands.select("doc", "band_id", *v_cols)
        .distinct()
        .groupBy("band_id", *v_cols)
        .agg(F.count(F.lit(1)).alias("_sz"))
    )
    return (
        buckets.groupBy("band_id")
        .agg(
            F.sum("_sz").alias("n_docs"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_sz").alias("max_bucket"),
        )
        .select("band_id", "n_docs", "n_buckets", "max_bucket")
    )
