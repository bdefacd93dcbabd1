"""r13 registrations: the persisted-dedup-index lifecycle and the
substring-span pipeline under the driver's value gate (VERDICT r12
asks #1/#5 — unfreeze 171→174 sanctioned).

All three queries run the REAL operators (`operators/dedup_index.py`,
`operators/substring.py`) with ``base_hash='md5'`` so the whole path
— base hash → seeded universal-hash signatures → banded candidates →
rescore/admission — is recomputable in DuckDB SQL. The oracle
spellings were proven bit-for-bit in
``tests/test_dedup_index.py::test_estimate_rescore_matches_duckdb_signature_agreement``
and ``tests/test_substring_dedup.py::test_full_pipeline_matches_duckdb``
before registration (the r12→r13 promotion discipline).

The index-backed queries build their index into a fresh per-call temp
directory: the BUILD is part of the exercised surface (stage-and-swap
generation write), and the probe then runs the broadcast-only query
plan against the stored band table exactly as a production batch
would.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup_index as DI
from ..operators import substring as SS
from ..sources import load_table
from .queries import query
from .queries_ext import _MH_BANDS, _MH_SIG_COLS, _NTOKS

# Shared oracle CTE prefix: word-3-shingles → md5-prefix base hash →
# seeded signatures → band rows, the exact spelling proven in
# tests/test_dedup_index.py (and shared with minhash_duplicate_pairs'
# oracle via _MH_SIG_COLS/_MH_BANDS).
_IDX_SIG_CTES = f"""
    t AS (SELECT doc_id, {_NTOKS} AS toks FROM documents),
    sh_str AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 3
                    THEN list_transform(range(1, len(toks) - 1),
                                        i -> array_to_string(toks[i:i+2], ' '))
                    ELSE [array_to_string(toks, ' ')] END) AS s
      FROM t
    ),
    hashed AS (
      SELECT DISTINCT doc_id,
             (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS h
      FROM sh_str
    ),
    sig AS (SELECT doc_id, {_MH_SIG_COLS} FROM hashed GROUP BY doc_id),
    bands AS (
      {_MH_BANDS}
    )"""

_AGREE = " + ".join(f"(a.h{i} = b.h{i})::INT" for i in range(32))


def _split_corpus(spark: SparkSession, sf_dir: str):
    """Deterministic corpus/batch split: even doc_ids are the indexed
    corpus, odd doc_ids the incoming batch — the incremental-dedup
    shape (a stored population probed by a new slice) over the same
    documents table every other dedup query reads."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)


# (pid, sf_dir) → built index path. Memoizing the build means the
# second index query in a gate/bench run reuses the first call's
# parquet write instead of rebuilding (ADVICE r14: the eager rebuild
# ran twice per gate session and its wall landed in plan-build
# timings); the pid in the key makes a fork rebuild rather than trust
# an inherited entry.
_IDX_BUILT: dict[tuple[int, str], str] = {}


def _cleanup_md5_indexes() -> None:
    """atexit hook: remove THIS process's gate-index directories.

    Keyed deletion (not a glob over gettempdir) so concurrent
    processes never race each other's live indexes; a SIGKILLed
    process still leaks, which the deterministic (pid, sf) path keeps
    bounded at one directory per (process, sf)."""
    import shutil

    for (pid, _sf), path in list(_IDX_BUILT.items()):
        if pid == os.getpid():
            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    _IDX_BUILT.clear()


def _build_md5_index(spark: SparkSession, sf_dir: str) -> tuple[str, DataFrame]:
    """Build (once per process) the gate's index at a DETERMINISTIC
    path keyed by (pid, sf_dir) — not a fresh mkdtemp per call, which
    leaked a full index directory per invocation across driver-gate
    runs, plan surveys, and bench smokes (r13 review; the r06 class).
    The build is memoized per (pid, sf_dir) so the second index query
    in one process reuses the first's write, and an atexit hook
    removes the directory at interpreter exit (ADVICE r14). The path
    cannot be deleted eagerly: the returned query reads it lazily at
    collect time."""
    old, new = _split_corpus(spark, sf_dir)
    cache_key = (os.getpid(), sf_dir)
    hit = _IDX_BUILT.get(cache_key)
    if hit is not None and os.path.isdir(hit):
        return hit, new
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_mhidx_{os.getpid()}_{key}"
    )
    path = base + "/idx"
    DI.build_minhash_index(
        old, path, n=3, num_perm=32, band_rows=2, seed=42, base_hash="md5"
    )
    if not _IDX_BUILT:
        atexit.register(_cleanup_md5_indexes)
    _IDX_BUILT[cache_key] = path
    return path, new


@query(
    "incremental_dedup_pairs",
    oracle=f"""
    WITH {_IDX_SIG_CTES},
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM bands n JOIN bands c
        ON n.band_id = c.band_id AND n.v0 = c.v0 AND n.v1 = c.v1
      WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
    )
    SELECT new_id, corpus_id,
           ({_AGREE})::BIGINT AS n_agree,
           round(({_AGREE}) / 32.0, 6) AS jaccard_est
    FROM cand JOIN sig a ON a.doc_id = new_id JOIN sig b ON b.doc_id = corpus_id
    WHERE ({_AGREE}) / 32.0 >= 0.4
    """,
)
def incremental_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus near-dup pairs from the PERSISTED MinHash band
    index (``dedup_index.minhash_index_dedup``, estimate rescore):
    the even-id half of documents is built into a stored band index
    (stage-and-swap generation write), then the odd-id half is probed
    against it — batch band rows broadcast against the band table,
    candidates' STORED signatures joined for the agreement fraction,
    ZERO corpus-side shuffle and zero corpus text reads (the 100 TB
    incremental shape; the batch miners re-mine the whole corpus per
    run). With md5 as the base hash DuckDB rebuilds the identical
    signatures/bands/estimates bit-for-bit."""
    path, new = _build_md5_index(spark, sf_dir)
    return DI.minhash_index_dedup(
        spark, path, new, threshold=0.4, rescore="estimate"
    ).select(
        "new_id",
        "corpus_id",
        F.col("n_agree").cast("long").alias("n_agree"),
        F.round("jaccard_est", 6).alias("jaccard_est"),
    )


@query(
    "index_screen_admissions",
    oracle=f"""
    WITH {_IDX_SIG_CTES},
    cross_cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM bands n JOIN bands c
        ON n.band_id = c.band_id AND n.v0 = c.v0 AND n.v1 = c.v1
      WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
    ),
    flagged AS (
      SELECT DISTINCT new_id AS doc_id
      FROM cross_cand
      JOIN sig a ON a.doc_id = new_id
      JOIN sig b ON b.doc_id = corpus_id
      WHERE ({_AGREE}) / 32.0 >= 0.4
    ),
    fresh AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM flagged)
        AND doc_id IN (SELECT doc_id FROM hashed)
    ),
    wb_cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.v0 = y.v0 AND x.v1 = y.v1
       AND x.doc_id < y.doc_id
      WHERE x.doc_id IN (SELECT doc_id FROM fresh)
        AND y.doc_id IN (SELECT doc_id FROM fresh)
    ),
    d_all AS (SELECT DISTINCT doc_id, s FROM sh_str),
    sizes AS (SELECT doc_id, count(*) AS n FROM d_all GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM wb_cand c
      JOIN d_all x ON x.doc_id = c.doc_a
      JOIN d_all y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    ),
    losers AS (
      SELECT DISTINCT doc_b AS doc_id
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.4
    )
    SELECT doc_id FROM fresh WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """,
)
def index_screen_admissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming near-dedup gate's ADMISSION decision as a batch
    query (``dedup_index.minhash_index_screen`` — the exact operator
    ``streaming.sinks.near_dedup_gate_writer`` runs per micro-batch):
    odd-id docs screened against the even-id index. Three filters,
    all reproduced in the oracle: cross-corpus estimate hits drop,
    empty-shingle docs drop (visibility), and of each near-dup pair
    INSIDE the batch the higher id drops (the SemDeDup one-pass rule,
    exact-rescored over the raw shingle sets). Output: the admitted
    doc_ids."""
    path, new = _build_md5_index(spark, sf_dir)
    return DI.minhash_index_screen(spark, path, new, threshold=0.4).select("doc_id")


@query(
    "repeated_substring_spans",
    oracle="""
    WITH g AS (SELECT doc_id, unnest(range(1, greatest(length(text)-25+1, 0)+1)) AS pos, text
               FROM documents),
    h AS (SELECT doc_id AS doc, pos,
                 ('0x'||substr(md5(substr(text, pos::INT, 25)),1,15))::BIGINT AS h FROM g),
    sel AS (SELECT DISTINCT doc, m['pos'] AS pos, m['h'] AS h FROM (
       SELECT doc, min({'h': h, 'pos': pos}) OVER
         (PARTITION BY doc ORDER BY pos ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS m
       FROM h)),
    cand AS (SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pos_a, b.pos AS pos_b
             FROM sel a JOIN sel b ON a.h = b.h AND a.doc < b.doc),
    ver AS (SELECT c.* FROM cand c
            JOIN documents da ON da.doc_id = c.doc_a
            JOIN documents db ON db.doc_id = c.doc_b
            WHERE substr(da.text, c.pos_a::INT, 25) = substr(db.text, c.pos_b::INT, 25)),
    ch AS (SELECT *, pos_a - pos_b AS diag,
             CASE WHEN pos_a - lag(pos_a) OVER w IS NULL
                    OR pos_a - lag(pos_a) OVER w > 12 THEN 1 ELSE 0 END AS brk
           FROM ver WINDOW w AS (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a)),
    grp AS (SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
            FROM ch)
    SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
           max(pos_a) - min(pos_a) + 25 AS length
    FROM grp GROUP BY doc_a, doc_b, diag, grp
    HAVING max(pos_a) - min(pos_a) + 25 >= 50
    """,
)
def repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (Lee et al. 2022 shape): verified
    verbatim spans ≥50 chars shared across document pairs, found by
    Schleimer-winnowing k=25 fingerprints (window 12), exact k-gram
    verification of every seed, and same-diagonal chaining
    (``operators/substring.py:repeated_span_pairs``). DuckDB
    reproduces the identical winnow/verify/chain pipeline — the
    oracle checks exact span positions and lengths, not just pair
    membership."""
    d = load_table(spark, sf_dir, "documents")
    return SS.repeated_span_pairs(d, "doc_id", "text", k=25, window=12, min_len=50)
