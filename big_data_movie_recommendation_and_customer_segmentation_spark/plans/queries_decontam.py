"""r15 registrations: the persisted decontamination index and SPFHP
sequence packing under the driver's value gate (VERDICT r14 asks
#1/#2 — unfreeze 178→182 sanctioned).

All four queries run the REAL operators (``operators/decontam_index``,
``operators/packing``). The decontam oracle spelling was proven
bit-for-bit in ``tests/test_decontam_index.py::test_overlaps_match_duckdb``
before registration (the r13→r14 promotion discipline); the SPFHP
oracle replays the ENTIRE histogram-packing algorithm — greedy
strategy synthesis included — as a DuckDB recursive state-machine CTE
(one row per ``_pop_best`` step, state = the open-pack population),
then reproduces the demand-table rank arithmetic with plain window
functions, so pack ids and slots are value-checked end to end, not
just invariant-checked.

The decontam queries build their index into a per-(pid, sf_dir)
memoized temp directory — the ``queries_index._build_md5_index``
plumbing, one tier over: the BUILD (staged generation write) is part
of the exercised surface, and the probe then runs the broadcast-only
plan against the stored gram table exactly as a production batch
would.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textops as TX
from ..operators import decontam_index as DC
from ..operators import packing as PK
from ..sources import load_table
from .queries import query

# ---------------------------------------------------------------------------
# Decontamination index (operators/decontam_index.py)
# ---------------------------------------------------------------------------

_DC_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_DC_NTOKS = f"list_filter(regexp_split_to_array({_DC_NORM}, '\\s+'), x -> x <> '')"
_DC_N = 13  # GPT-3 appendix-C word-gram size (the build default)


def _gram_cte(where: str) -> str:
    """DuckDB spelling of the (doc_id, 60-bit md5 gram hash) relation
    — word 13-grams with the whole-text fallback, matching
    ``dedup._shingle_fn('word')`` + ``textops.shared_token_hash60``
    (proven in tests/test_decontam_index.py)."""
    return f"""
      SELECT DISTINCT doc_id AS _id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT AS gram
      FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(toks) >= {_DC_N}
                      THEN list_transform(range(1, len(toks) - {_DC_N - 2}),
                                          i -> array_to_string(toks[i:i+{_DC_N - 1}], ' '))
                      ELSE [array_to_string(toks, ' ')] END) AS s
        FROM (SELECT doc_id, {_DC_NTOKS} AS toks FROM documents {where})
      )"""


# benchmark = docs with doc_id < 50 keyed by their source (a handful
# of "eval suites"), corpus = the rest — the deterministic split the
# oracle proof in tests/test_decontam_index.py pinned.
_DC_CTES = f"""
    bench AS (
      SELECT DISTINCT source AS bench_id, gram
      FROM ({_gram_cte("WHERE doc_id < 50")}) g
      JOIN documents d ON d.doc_id = g._id
    ),
    corpus AS ({_gram_cte("WHERE doc_id >= 50")}),
    hits AS (
      SELECT c._id AS doc,
             count(DISTINCT c.gram) AS n_hits,
             count(DISTINCT b.bench_id) AS n_benchmarks
      FROM corpus c JOIN bench b USING (gram)
      GROUP BY c._id
    )"""

# (pid, sf_dir) → built decontam index path; memoized + atexit-cleaned
# exactly like queries_index._IDX_BUILT (the gate/bench run calls two
# decontam queries — the second reuses the first's parquet write).
_DC_BUILT: dict[tuple[int, str], str] = {}


def _cleanup_dc_indexes() -> None:
    import shutil

    for (pid, _sf), path in list(_DC_BUILT.items()):
        if pid == os.getpid():
            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    _DC_BUILT.clear()


def _build_dc_index(spark: SparkSession, sf_dir: str) -> tuple[str, DataFrame]:
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 50).select(
        F.col("source").alias("bench_id"), "text"
    )
    corpus = d.filter(F.col("doc_id") >= 50)
    cache_key = (os.getpid(), sf_dir)
    hit = _DC_BUILT.get(cache_key)
    if hit is not None and os.path.isdir(hit):
        return hit, corpus
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_dcidx_{os.getpid()}_{key}"
    )
    path = base + "/idx"
    DC.build_decontam_index(bench, path)
    if not _DC_BUILT:
        atexit.register(_cleanup_dc_indexes)
    _DC_BUILT[cache_key] = path
    return path, corpus


@query(
    "decontam_index_overlaps",
    oracle=f"""
    WITH {_DC_CTES},
    denom AS (
      SELECT _id AS doc, count(DISTINCT gram) AS n_grams
      FROM corpus WHERE _id IN (SELECT doc FROM hits)
      GROUP BY _id
    )
    SELECT h.doc, h.n_hits, d.n_grams, h.n_benchmarks,
           round(h.n_hits * 1.0 / d.n_grams, 6) AS containment
    FROM hits h JOIN denom d USING (doc)
    """,
)
def decontam_index_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run decontamination as an index PROBE
    (``decontam_index.decontam_index_overlaps``): the doc_id<50 slice
    is built into a persisted benchmark gram index (staged-generation
    write, geometry frozen in meta), then the rest of the documents
    table is screened against it — one corpus explode, stored grams
    BROADCAST into the hash join, flagged-set-bounded denominator
    recount; corpus text never shuffles (the 100 TB shape; the
    one-shot ``ngram_decontaminated_docs`` re-derives the benchmark
    grams per run). Output: the per-contaminated-doc collision audit
    (hits, grams, benchmarks hit, containment)."""
    path, corpus = _build_dc_index(spark, sf_dir)
    return DC.decontam_index_overlaps(spark, path, corpus)


@query(
    "decontam_screen_survivors",
    oracle=f"""
    WITH {_DC_CTES}
    SELECT doc_id FROM documents
    WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc FROM hits)
    """,
)
def decontam_screen_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming decontamination gate's ADMISSION decision as a
    batch query (``decontam_index.decontam_index_screen`` — the exact
    operator ``streaming.sinks.decontam_gate_writer`` runs per
    micro-batch, the way ``lm_gate_admissions`` twins the LM gate and
    ``index_screen_admissions`` twins the near-dedup gate): corpus
    docs colliding with >=1 stored benchmark gram drop, everything
    else passes. Output: the admitted doc_ids."""
    path, corpus = _build_dc_index(spark, sf_dir)
    return DC.decontam_index_screen(spark, path, corpus).select("doc_id")


# ---------------------------------------------------------------------------
# SPFHP document-boundary-respecting sequence packing (operators/packing.py)
# ---------------------------------------------------------------------------

_CAP = 256  # covers the documents token range at every SF
_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"

# The SPFHP oracle: a recursive state-machine CTE replaying
# _spfhp_strategies exactly — one recursion row per _pop_best step,
# state = (pending length classes desc, open packs, finished packs).
# Unmerged open-pack classes are safe: equal (rem, pat) classes drain
# consecutively under the same min-key choice, so the final pattern
# multiset is identical to the count-merged dict (the GROUP BY pat at
# the end is the merge). Placement uids make removal exact when two
# classes tie on every field. The demand arithmetic below the
# recursion is the operator's rank-range routing verbatim: strategies
# sorted by pattern, per-length rank bases accumulated in sid order,
# pack id = pack_base + local_rank // k, slot = first-occurrence
# offset + local_rank % k.
_SPFHP_CTES = f"""
docs AS (
  SELECT doc_id, len({_TOKS}) AS ln FROM documents
  WHERE len({_TOKS}) BETWEEN 1 AND {_CAP}
),
pending0 AS (
  SELECT list({{'ln': ln, 'need': need}} ORDER BY ln DESC) AS pending
  FROM (SELECT ln, count(*)::BIGINT AS need FROM docs GROUP BY ln)
),
sim AS (
  SELECT 0 AS step, pending,
         CAST([] AS STRUCT(rem INTEGER, pat INTEGER[], cnt BIGINT, uid BIGINT)[]) AS open,
         CAST([] AS STRUCT(pat INTEGER[], cnt BIGINT)[]) AS done
  FROM pending0
  UNION ALL
  SELECT step + 1,
         CASE WHEN x.need3 = 0 THEN pending[2:]
              ELSE [{{'ln': x.ln, 'need': x.need3}}] || pending[2:] END,
         list_filter(open, o -> x.bestuid IS NULL OR o.uid <> x.bestuid)
           || list_transform(list_filter(x.placed, p -> p.rem >= 1),
                             p -> {{'rem': p.rem, 'pat': p.pat, 'cnt': p.cnt,
                                   'uid': (step + 1) * 4 + p.k}}),
         done || list_transform(list_filter(x.placed, p -> p.rem < 1),
                                p -> {{'pat': p.pat, 'cnt': p.cnt}})
  FROM sim,
  LATERAL (
    SELECT best.uid AS bestuid, a.ln AS ln,
           CASE WHEN best.uid IS NULL OR haspart THEN 0 ELSE need2 END AS need3,
           CASE WHEN best.uid IS NULL THEN
             list_filter([
               {{'rem': {_CAP} - fq * a.ln,
                 'pat': list_transform(range(fq), z -> a.ln),
                 'cnt': a.need // fq, 'k': 1}},
               {{'rem': {_CAP} - (a.need % fq) * a.ln,
                 'pat': list_transform(range(a.need % fq), z -> a.ln),
                 'cnt': 1::BIGINT, 'k': 2}}
             ], p -> p.cnt > 0 AND len(p.pat) > 0)
           ELSE
             list_filter([
               {{'rem': best.rem - q2 * a.ln,
                 'pat': best.pat || list_transform(range(q2), z -> a.ln),
                 'cnt': fullc, 'k': 1}},
               {{'rem': CASE WHEN haspart THEN best.rem - part * a.ln ELSE -1 END,
                 'pat': best.pat || list_transform(
                          range(CASE WHEN haspart THEN part ELSE 0 END), z -> a.ln),
                 'cnt': 1::BIGINT, 'k': 2}},
               {{'rem': best.rem, 'pat': best.pat,
                 'cnt': best.cnt - fullc - CASE WHEN haspart THEN 1 ELSE 0 END,
                 'k': 3}}
             ], p -> p.cnt > 0 AND len(p.pat) > 0
                     AND NOT (p.k = 2 AND NOT haspart))
           END AS placed
    FROM
      (SELECT pending[1].ln AS ln, pending[1].need AS need) a,
      LATERAL (SELECT COALESCE(list_sort(list_filter(open, o -> o.rem >= a.ln))[1],
                               {{'rem': NULL, 'pat': NULL, 'cnt': NULL,
                                'uid': NULL}}) AS best) b,
      LATERAL (SELECT {_CAP} // a.ln AS fq,
                      CASE WHEN best.uid IS NULL THEN NULL
                           ELSE best.rem // a.ln END AS q2) c,
      LATERAL (SELECT CASE WHEN best.uid IS NULL THEN NULL
                           ELSE least(best.cnt, a.need // q2) END AS fullc) d,
      LATERAL (SELECT CASE WHEN best.uid IS NULL THEN NULL
                           ELSE a.need - fullc * q2 END AS need2) e,
      LATERAL (SELECT best.uid IS NOT NULL AND best.cnt - fullc > 0
                      AND need2 > 0 AND need2 < q2 AS haspart,
                      CASE WHEN best.uid IS NOT NULL AND best.cnt - fullc > 0
                                AND need2 > 0 AND need2 < q2
                           THEN need2 ELSE NULL END AS part) f
  ) x
  WHERE len(pending) > 0
),
final AS (
  SELECT done || list_transform(open, o -> {{'pat': o.pat, 'cnt': o.cnt}}) AS allp
  FROM sim WHERE len(pending) = 0
),
strat AS (
  SELECT pat, n, row_number() OVER (ORDER BY pat) AS sid
  FROM (SELECT s.pat AS pat, sum(s.cnt)::BIGINT AS n
        FROM (SELECT unnest(allp) AS s FROM final) GROUP BY s.pat)
),
strat2 AS (
  SELECT *, COALESCE(sum(n) OVER (ORDER BY sid
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_base
  FROM strat
),
patlen AS (
  SELECT sid, n, pack_base, e.ln AS ln, e.pos AS pos
  FROM strat2,
  LATERAL (SELECT unnest(list_transform(pat, (x, i) -> {{'ln': x, 'pos': i}})) AS e)
),
demand AS (
  SELECT ln, sid, k, n, pack_base, slot_base,
         COALESCE(sum(k * n) OVER (PARTITION BY ln ORDER BY sid
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
  FROM (SELECT sid, n, pack_base, ln, count(*)::BIGINT AS k,
               (min(pos) - 1)::INTEGER AS slot_base
        FROM patlen GROUP BY sid, n, pack_base, ln)
),
ranked AS (
  SELECT doc_id, ln,
         row_number() OVER (PARTITION BY ln ORDER BY doc_id) - 1 AS rank
  FROM docs
),
assign AS (
  SELECT r.doc_id, r.ln::BIGINT AS n_tokens,
         (d.pack_base + (r.rank - d.base) // d.k)::BIGINT AS pack_id,
         (d.slot_base + (r.rank - d.base) % d.k)::INTEGER AS pack_slot
  FROM ranked r
  JOIN demand d ON d.ln = r.ln AND r.rank >= d.base
               AND r.rank < d.base + d.k * d.n
)"""


def _spfhp_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", TX.token_count("text").alias("n_tokens"))
        .filter((F.col("n_tokens") >= 1) & (F.col("n_tokens") <= _CAP))
    )


@query(
    "spfhp_pack_assignments",
    oracle=f"WITH RECURSIVE {_SPFHP_CTES} SELECT * FROM assign",
)
def spfhp_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-boundary-respecting sequence packing
    (``packing.spfhp_pack_assignments`` — Krell & Kosec 2021 SPFHP):
    every document routed to exactly one fixed-capacity training pack
    with no document split. Driver state = the length histogram
    (bounded O(capacity²) regardless of corpus size); slotting is a
    per-length window + broadcast demand join — no SinglePartition
    exchange (asserted in tests/test_packing.py). The oracle replays
    the greedy strategy synthesis itself, so pack ids/slots are
    value-checked, not just capacity-invariant-checked."""
    out = PK.spfhp_pack_assignments(
        _spfhp_input(spark, sf_dir), "doc_id", "n_tokens", _CAP
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "pack_id",
        "pack_slot",
    )


@query(
    "spfhp_pack_efficiency",
    oracle=f"""
    WITH RECURSIVE {_SPFHP_CTES},
    per_pack AS (
      SELECT pack_id, CAST(sum(n_tokens) AS BIGINT) AS fill,
             count(*)::BIGINT AS docs
      FROM assign GROUP BY pack_id
    )
    SELECT count(*)::BIGINT AS n_packs,
           CAST(sum(docs) AS BIGINT) AS n_docs,
           CAST(sum(fill) AS BIGINT) AS total_tokens,
           round(avg(fill), 3) AS avg_fill,
           CAST(min(fill) AS BIGINT) AS min_fill,
           CAST(max(fill) AS BIGINT) AS max_fill,
           round(sum(fill) / (count(*) * {_CAP}.0), 6) AS efficiency
    FROM per_pack
    """,
)
def spfhp_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing-efficiency report over the SPFHP assignments
    (``packing.pack_fill_stats``): pack count, token mass, fill
    spread, and efficiency = total_tokens / (n_packs · capacity) —
    the padding-waste complement the packing exists to maximize.
    Two bounded aggregations over the assignment output."""
    out = PK.spfhp_pack_assignments(
        _spfhp_input(spark, sf_dir), "doc_id", "n_tokens", _CAP
    )
    return PK.pack_fill_stats(out, "n_tokens", _CAP)


@query(
    "spfhp_shard_layout",
    oracle=f"""
    WITH RECURSIVE {_SPFHP_CTES},
    fills AS (
      SELECT pack_id, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM assign GROUP BY pack_id
    ),
    sharded AS (
      SELECT pack_id,
             CAST((CAST(sum(pack_tokens) OVER (
                     ORDER BY pack_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) - pack_tokens) // 4096 AS BIGINT) AS shard_id
      FROM fills
    )
    SELECT a.doc_id, a.pack_id, s.shard_id
    FROM assign a JOIN sharded s USING (pack_id)
    """,
)
def spfhp_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware packing wired END TO END into shard layout
    (VERDICT r14 ask #7b): documents → boundary-respecting SPFHP
    packs → per-pack token mass → contiguous fixed-token-budget
    training shards via the two-pass prefix-sum decomposition
    (``packing.assign_token_shards`` over the pack relation — one
    hash shuffle, no SinglePartition exchange). The pack→shard join
    is UNHINTED: the pack relation is O(corpus/docs-per-pack), too
    big to force-broadcast at 100 TB — AQE picks the strategy.
    Output: every document with its pack and its training shard."""
    assign = PK.spfhp_pack_assignments(
        _spfhp_input(spark, sf_dir), "doc_id", "n_tokens", _CAP
    )
    fills = assign.groupBy("pack_id").agg(
        F.sum(F.col("n_tokens").cast("long")).alias("pack_tokens")
    )
    sharded = PK.assign_token_shards(
        fills, "pack_id", "pack_tokens", shard_tokens=4096
    )
    return assign.join(sharded.select("pack_id", "shard_id"), "pack_id").select(
        "doc_id", "pack_id", "shard_id"
    )


# ---------------------------------------------------------------------------
# Cross-run corpus lineage (operators/lineage.py) — queued gate row
# ---------------------------------------------------------------------------

# the 60-bit md5-prefix hash of 'id:text' / 'bench_id:gram', XORed per
# group and rendered as the 16-hex handle — the exact spelling of
# lineage._slice_fp / decontam_index_fingerprint
def _xor_fp(expr: str) -> str:
    return (
        "lpad(lower(hex(COALESCE(bit_xor("
        f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
        "), 0))), 16, '0')"
    )


@query(
    "corpus_slice_lineage",
    oracle=f"""
    WITH {_DC_CTES},
    corpus_rows AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id >= 50
    ),
    survivors AS (
      SELECT * FROM corpus_rows
      WHERE doc_id NOT IN (SELECT doc FROM hits)
    ),
    idx_fp AS (
      SELECT {_xor_fp("bench_id || ':' || gram::VARCHAR")} AS fp FROM bench
    ),
    full_fp AS (
      SELECT source AS slice_id, count(*) AS n_docs,
             {_xor_fp("doc_id::VARCHAR || ':' || text")} AS content_fp
      FROM corpus_rows GROUP BY source
    ),
    kept_fp AS (
      SELECT source AS slice_id, count(*) AS n_admitted,
             {_xor_fp("doc_id::VARCHAR || ':' || text")} AS admitted_fp
      FROM survivors GROUP BY source
    )
    SELECT f.slice_id, f.n_docs, f.content_fp,
           COALESCE(k.n_admitted, 0) AS n_admitted,
           COALESCE(k.admitted_fp, '0000000000000000') AS admitted_fp,
           (SELECT fp FROM idx_fp) AS decontam_fp
    FROM full_fp f LEFT JOIN kept_fp k USING (slice_id)
    """,
)
def corpus_slice_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run corpus lineage (``operators.lineage`` — VERDICT r14
    ask #7a): one auditable row per corpus slice (= source) tying
    WHAT WENT IN (n_docs + order-insensitive content fingerprint),
    WHAT CAME OUT of the decontamination screen (n_admitted +
    admitted-set fingerprint, fully-rejected slices kept visible),
    and WHICH screening state produced it (the live decontam index's
    content fingerprint — ``decontam_index_fingerprint``, the
    generation handle ``stale_screenings`` later compares against).
    Two partial-aggregated groupBys; the exchange carries one row per
    slice. The oracle replays the screen, both XOR fingerprints, and
    the index fingerprint."""
    from ..operators import lineage as LN

    path, corpus = _build_dc_index(spark, sf_dir)
    admitted = DC.decontam_index_screen(spark, path, corpus)
    fp = DC.decontam_index_fingerprint(spark, path)
    return LN.slice_lineage_manifest(
        corpus,
        admitted,
        slice_col="source",
        id_col="doc_id",
        text_col="text",
        provenance={"decontam_fp": fp},
    )
