"""Document deduplication operators (north-star extension).

The dedup ladder a 100 TB text pipeline actually runs, cheapest
first:

1. ``exact_duplicates`` — md5-of-normalized-text groupBy. One
   shuffle on the 128-bit key; no skew concern (hashes are uniform).
2. ``ngram_jaccard_pairs`` — exact shingle-set Jaccard via the same
   item-keyed self-join as user similarity (SURVEY §2.C6); the
   oracle-checkable ground truth for near-dup.
3. ``minhash_duplicate_pairs`` — MinHash LSH over word shingles;
   the scale path (cost tracks true-duplicate density, not N²).
4. ``simhash`` — 64-bit fingerprints + banded Hamming candidates;
   constant per-doc state, cheapest near-dup signal at scale.
5. ``embedding_near_duplicates`` — semantic near-dup via cosine on
   an embedding column (see ``vectorops`` for the ANN machinery).

Cluster → representative resolution (``dedup_representatives``) is
min-label propagation: iterative, each round one self-join keyed on
doc id. Rounds bound the diameter of dup clusters (real dup clusters
are shallow; 3 rounds covers diameter-8 chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textops as TX
from .similarity import exact_jaccard_pairs


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups by normalized-content fingerprint.
    Output: fingerprint, n_copies, keep_id (min id), doc_ids
    (sorted). Only groups with ≥2 docs."""
    return (
        df.select(F.col(id_col).alias("doc_id"), TX.fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_copies") >= 2)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per distinct normalized content — the
    basic exact-dedup pass. Window-free: groupBy fingerprint → min
    id → semi join back (two shuffles, both on uniform keys)."""
    keep = (
        df.select(F.col(id_col).alias(id_col), TX.fingerprint(text_col).alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def _shingle_pairs(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, shingle) exploded relation — the dedup analog of the
    user×item rated relation."""
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(TX.word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs (ground truth).

    Reuses the distributed set-similarity join from user similarity —
    shingles are the items. ``max_shingle_freq`` prunes boilerplate
    shingles (the skew control at scale: a boilerplate header shared
    by millions of docs would otherwise quadratically explode the
    join).
    Output: doc_a < doc_b, n_common, n_a, n_b, jaccard.
    """
    pairs = _shingle_pairs(df, id_col, text_col, n)
    out = exact_jaccard_pairs(
        pairs, "doc", "shingle", threshold=threshold, max_item_freq=max_shingle_freq
    )
    return out.withColumnsRenamed({"user_a": "doc_a", "user_b": "doc_b"})


def minhash_duplicate_pairs(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hash_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs with exact-Jaccard
    rescore (shingle → minhash signature → band-bucket join — the
    standard web-scale dedup pipeline, Broder 1997).

    Same machinery as ``similarity.minhash_lsh_pairs``; documented
    separately because the input unit is shingles of one column, not
    a two-column relation. Output matches ``ngram_jaccard_pairs``.
    """
    from .similarity import minhash_lsh_pairs

    pairs = _shingle_pairs(df, id_col, text_col, n)
    out = minhash_lsh_pairs(
        spark, pairs, "doc", "shingle",
        threshold=threshold, num_hash_tables=num_hash_tables, seed=seed,
    )
    return out.withColumnsRenamed({"user_a": "doc_a", "user_b": "doc_b"})


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per document (Charikar 2002).

    Pure column ops, no UDF: explode tokens → xxhash64(token) →
    per-bit ±1 votes aggregated with conditional sums → reassemble
    the sign bits into one long. The explode is map-local; the only
    shuffle is the doc-keyed aggregate carrying 64 small ints.

    Output: doc_id, simhash (long).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TX.tokens(TX.normalized_text(text_col))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_duplicate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Banded candidate generation (pigeonhole: distance ≤ 3 ⇒ at least
    one of 4 16-bit bands identical) → equi-join per band on the
    band value → exact Hamming check via bit_count(xor). The
    band-keyed equi-joins are ordinary shuffle joins — no N² pass.
    Output: doc_a, doc_b, hamming.
    """
    sigs = simhash(df, id_col, text_col).cache()
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    candidates = None
    for b in range(n_bands):
        band = F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(F.lit(mask))
        a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), band.alias("band"))
        bb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), band.alias("band"))
        cand = a.join(bb, "band").filter(F.col("doc_a") < F.col("doc_b")).drop("band")
        candidates = cand if candidates is None else candidates.unionByName(cand)
    out = (
        candidates.distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return out


def dedup_representatives(pairs: DataFrame, rounds: int = 3) -> DataFrame:
    """Resolve duplicate pairs to cluster representatives by
    min-label propagation: rep(d) starts as min(d, neighbors);
    each round joins reps through the pair edges and takes the min.
    Output: doc_id, rep_id (rep_id < doc_id rows only — docs that
    should be dropped in favor of rep).

    Each round = one shuffle join on doc id. ``rounds`` bounds chain
    diameter 2^rounds; beyond that, iterate-to-fixpoint with a
    convergence check (count of changed labels) — kept explicit so
    the cost is visible.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
    )
    labels = edges.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("rep")).withColumnsRenamed(
        {"a": "doc_id"}
    )
    for _ in range(rounds - 1):
        # rep(d) ← min(rep(d), min over neighbors of rep(neighbor))
        neighbor_reps = (
            edges.join(labels.withColumnsRenamed({"doc_id": "b", "rep": "nrep"}), "b")
            .groupBy("a")
            .agg(F.min("nrep").alias("nrep"))
            .withColumnsRenamed({"a": "doc_id"})
        )
        labels = (
            labels.join(neighbor_reps, "doc_id", "left")
            .select("doc_id", F.least("rep", "nrep").alias("rep"))
        )
    return labels.filter(F.col("rep") < F.col("doc_id")).select("doc_id", F.col("rep").alias("rep_id"))
