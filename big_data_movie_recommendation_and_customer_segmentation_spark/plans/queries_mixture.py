"""r15 second-session registrations: mixture materialization
(``operators/mixture.py``) — per-source epoch upsampling between the
temperature mixture plan and the packed shards. Queued for the r16
gate unfreeze (first rows for a ``mixture`` family); registered now
so the local value gate and cross-SF oracle audits pin them from day
one, per the promotion discipline. The oracle spelling was proven
bit-for-bit in tests/test_mixture.py::test_materialized_counts_match_duckdb
before these rows went live.

Both queries exercise the REAL pipeline: temperature plan (alpha=0.5
over documents.lang, weighted by n_chars) → milli-quantized epoch
allocation at a budget of 2× total chars → hash-gated
materialization (seed "mix") → per-(lang, epoch) counts /
per-lang audit. The budget is derived from the data (one bounded
1-row aggregate) so the same spelling holds at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus as CO
from ..operators import mixture as MX
from ..sources import load_table
from .queries import query

_MIX_SEED = "mix"

# DuckDB replay of plan → allocation → materialization: sqrt-
# temperature weights (alpha=0.5; pow(x,0.5) agrees with the JVM at
# the milli-epoch quantization the operator contracts), integer
# milli-epoch arithmetic, and the shared 60-bit md5 per-mil hash gate.
_MAT_CTES = f"""
    plan AS (
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
             CAST(round((SELECT 2 * sum(n_chars) FROM documents) * w
                        / n_tokens * 1000) AS BIGINT) AS rm
      FROM wt
    ),
    mat AS (
      SELECT d.lang, d.doc_id, d.n_chars, e.epoch
      FROM documents d
      JOIN alloc a USING (lang),
      LATERAL (SELECT unnest(range(0, (a.rm // 1000) + 1)) AS epoch) e
      WHERE d.doc_id IS NOT NULL
        AND (e.epoch < a.rm // 1000 OR
             ('0x' || substr(md5('{_MIX_SEED}:' || d.doc_id || ':' || e.epoch), 1, 15))::BIGINT
               % 1000 < a.rm % 1000)
    )"""


def _materialized(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = load_table(spark, sf_dir, "documents")
    budget = 2 * d.agg(F.sum("n_chars")).collect()[0][0]  # bounded: 1 row
    tplan = CO.temperature_mix_plan(d, "lang", "n_chars", alpha=0.5)
    alloc = MX.epoch_allocation(tplan, budget=budget, group_col="lang")
    mat = MX.materialize_mixture(
        d, alloc, group_col="lang", id_col="doc_id", seed=_MIX_SEED
    )
    return mat, alloc


@query(
    "mixture_epoch_materialization",
    oracle=f"""
    WITH {_MAT_CTES}
    SELECT lang, epoch, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM mat GROUP BY 1, 2
    ORDER BY lang, epoch
    """,
)
def mixture_epoch_materialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-tagged training mixture (operators/mixture.py): sqrt-
    temperature plan over languages → milli-quantized epoch
    allocation (budget 2× corpus chars: every lang upsamples past
    one epoch, low-resource langs hardest) → seeded hash-gated
    materialization, counted per (lang, epoch). Zero-shuffle
    materialize plan (broadcast allocation + generator explode);
    the counts are the only exchange."""
    mat, _ = _materialized(spark, sf_dir)
    return (
        mat.groupBy("lang", "epoch")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang", "epoch")
    )


@query(
    "mixture_epoch_audit",
    oracle=f"""
    WITH {_MAT_CTES},
    got AS (
      SELECT lang, count(*) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS achieved_tokens
      FROM mat GROUP BY 1
    )
    SELECT g.lang, g.n_rows, g.achieved_tokens,
           round(a.n_tokens * a.rm / 1000.0, 3) AS target_tokens,
           round(g.achieved_tokens / (a.n_tokens * a.rm / 1000.0), 6) AS achieved_ratio
    FROM got g JOIN alloc a USING (lang)
    ORDER BY lang
    """,
)
def mixture_epoch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achieved-vs-target closing report for the same materialized
    mixture (operators/mixture.py ``mixture_audit``): one row per
    lang with materialized rows, achieved vs target token mass, and
    the achieved/target ratio a scheduler tolerance-checks before
    the mix ships to packing."""
    mat, alloc = _materialized(spark, sf_dir)
    return MX.mixture_audit(
        mat, alloc, group_col="lang", tokens_col="n_chars"
    ).orderBy("lang")


_SHARD_N = 8
_SHARD_SEED = "ep"


@query(
    "mixture_shard_profile",
    oracle=f"""
    WITH {_MAT_CTES},
    sharded AS (
      SELECT lang, n_chars, epoch,
             ('0x' || substr(md5('{_SHARD_SEED}' || doc_id || ':' || epoch), 1, 8))::BIGINT
               % {_SHARD_N} AS shard
      FROM mat
    )
    SELECT shard, count(*) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           count(DISTINCT lang) AS n_langs,
           CAST(max(epoch) AS BIGINT) AS max_epoch
    FROM sharded GROUP BY 1 ORDER BY shard
    """,
)
def mixture_shard_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end integration: the materialized mixture lands in
    training shards via ``corpus.deterministic_shuffle`` keyed on the
    composite (doc_id, epoch) identity — an upsampled doc's epoch
    copies spread across shards instead of clumping — profiled per
    shard (rows, token mass, language spread, deepest epoch). The
    md5 shard route and per-shard rank replay in SQL; the profile
    aggregation is the only corpus-sized exchange after the
    zero-shuffle materialize."""
    mat, _ = _materialized(spark, sf_dir)
    keyed = mat.withColumn(
        "mix_id",
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("epoch").cast("string")),
    )
    sharded = CO.deterministic_shuffle(keyed, "mix_id", _SHARD_N, seed=_SHARD_SEED)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.max("epoch").cast("long").alias("max_epoch"),
        )
        .orderBy("shard")
    )
