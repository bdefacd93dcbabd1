"""r15 third-session registration: BPE tokenizer vocabulary induction
(``operators/bpe.py``). Rows-only by nature — the fit is an iterative
global argmax with table rewrites, which has no one-shot SQL spelling
(the ALS precedent: K4–K6 are rows-only with seeded-quality pins) —
vouched instead by tests/test_bpe.py's independent pure-Python
reference replay (full-rescan merge loop vs the operator's lazy-heap
incremental loop, exact equality on the Sennrich worked example and
randomized histograms) and cross-partitioning determinism pins.
The histogram stage IS SQL-replayable and rides the value gate
indirectly through its siblings (``tfidf_top_terms``,
``term_zipf_fit`` — same explode+agg+top-k shape, value-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe as B
from ..sources import load_table
from .queries import query


@query(
    "bpe_word_histogram",
    oracle="""
    WITH w AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> x <> '')) AS word
      FROM documents
    ),
    c AS (SELECT word, count(*) AS n FROM w GROUP BY 1)
    SELECT word, n FROM c ORDER BY n DESC, word ASC LIMIT 500
    """,
)
def bpe_word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The induction's stage-1 relation, value-checked end to end:
    top-500 words by (count desc, word asc) — one explode +
    map-side-combined count + TakeOrderedAndProject (per-task 500-row
    heaps, O(V) driver memory at any corpus size). The `bpe` family's
    value anchor vouching the rows-only merge table (the ALS
    pattern)."""
    d = load_table(spark, sf_dir, "documents")
    return B.word_histogram(d, top_v=500)


@query("bpe_vocab_merges")
def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge table trained on documents (operators/bpe.py): top-500
    word histogram (one map-side-combined agg + TakeOrderedAndProject,
    deterministic count-desc/word-asc tiebreak) → 80 driver-side
    merges on the bounded summary (the SPFHP discipline), ties broken
    (count desc, pair asc) so the table is a pure function of the
    corpus. Deterministic across partitionings (pinned in
    tests/test_bpe.py); the merge table is the versioned tokenizer
    artifact whose ``relation_fingerprint`` a lineage manifest
    records."""
    d = load_table(spark, sf_dir, "documents")
    hist = B.word_histogram(d, top_v=500)
    merges, _ = B.fit_bpe(hist, n_merges=80)
    return merges.orderBy("rank")
