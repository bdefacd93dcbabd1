"""Degenerate-content contracts across the dedup ladder (r11 sweep,
after NULL/empty/non-finite/negative): empty, whitespace-only, and
mass-duplicated boilerplate documents are ROUTINE in a 100 TB corpus,
and each pair-mining operator must either pair them deterministically
under a quadratic-blowup governor or drop them by a documented rule —
never silently go N².

The ladder's governor matrix (each pinned below):

- minhash/ngram: empty docs degrade to one universal '' shingle
  (word_shingles short-doc rule) — quadratic ungoverned, neutralized
  by ``max_shingle_freq`` (which every gated registry query passes).
- simhash: empty docs have zero tokens ⇒ no vote rows ⇒ NO
  fingerprint — they never reach the band join. Identical boilerplate
  (same fingerprint, all bands equal) is the quadratic case;
  ``max_band_freq`` (added by this sweep) is the governor.
- fuzzy_edit_pairs: empties share the length-0 band and pair at
  distance 0 under the always-on ``max_band_size`` governor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import dedup as DD


def _docs(spark):
    rows = (
        [(f"e{i}", "") for i in range(6)]
        + [(f"w{i}", "   \t ") for i in range(4)]
        + [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy cat"),
        ]
        + [(f"t{i}", "standard boilerplate template text repeated verbatim") for i in range(12)]
    )
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_empty_docs_pair_via_universal_shingle_until_governed(spark):
    df = _docs(spark)
    # 10 empty/whitespace docs share the single '' shingle: C(10,2)=45
    # pairs, plus C(12,2)=66 boilerplate and 1 near-dup (a,b) = 112.
    ungoverned = DD.minhash_duplicate_pairs(spark, df, "doc_id", "text", threshold=0.5)
    assert ungoverned.count() == 112
    # The shingle-frequency governor (freq > 8 dropped) removes both
    # degenerate cliques; only the genuine near-dup pair survives.
    governed = DD.minhash_duplicate_pairs(
        spark, df, "doc_id", "text", threshold=0.5, max_shingle_freq=8
    )
    rows = governed.collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [("a", "b")]


def test_simhash_empty_docs_never_reach_the_band_join(spark):
    df = _docs(spark)
    sigs = DD.simhash(df, "doc_id", "text")
    fp_docs = {r["doc_id"] for r in sigs.collect()}
    assert not {d for d in fp_docs if d.startswith(("e", "w"))}
    pairs = DD.simhash_duplicate_pairs(df, "doc_id", "text")
    assert pairs.filter(
        F.col("doc_a").rlike("^[ew]") | F.col("doc_b").rlike("^[ew]")
    ).count() == 0


def test_simhash_band_governor_bounds_boilerplate_and_is_lossless_below_cap(spark):
    df = _docs(spark)
    # Ungoverned: the 12 identical-fingerprint boilerplate docs emit
    # all C(12,2)=66 pairs — the quadratic hazard at corpus scale
    # (the a/b docs differ by a whole word and sit beyond
    # max_hamming=3, so boilerplate is the entire output).
    assert DD.simhash_duplicate_pairs(df, "doc_id", "text").count() == 66
    # Governor at 8 drops the mega-bucket (12 > 8) from every band.
    governed = DD.simhash_duplicate_pairs(df, "doc_id", "text", max_band_freq=8)
    assert governed.count() == 0
    # Below the cap the governor is pair-for-pair lossless.
    loose = DD.simhash_duplicate_pairs(df, "doc_id", "text", max_band_freq=100)
    base = DD.simhash_duplicate_pairs(df, "doc_id", "text")
    assert sorted(map(tuple, loose.collect())) == sorted(map(tuple, base.collect()))


def test_embedding_lsh_key_governor_bounds_identical_vectors(spark):
    """N identical embeddings share every sign-LSH (table, key) and
    emit C(N,2) candidates ungoverned; max_key_freq drops the
    mega-buckets and is pair-for-pair lossless below the cap."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO

    # the genuine pair points AWAY from the clique (sign-LSH keys of
    # near-opposite vectors differ), so governing the clique's
    # mega-buckets must not touch it
    vec = [1.0, 0.0, 2.0, -1.0]
    rows = [(i, vec) for i in range(10)] + [
        (100, [-0.5, -0.1, -1.0, 0.4]),
        (101, [-0.5, -0.11, -1.0, 0.41]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    base = VO.embedding_near_duplicates_deterministic(df, min_cosine=0.9, dim=4)
    n_base = base.count()
    assert n_base >= 45  # the identical clique pairs all emitted
    governed = VO.embedding_near_duplicates_deterministic(
        df, min_cosine=0.9, dim=4, max_key_freq=8
    )
    got = {(r["id_a"], r["id_b"]) for r in governed.collect()}
    assert (100, 101) in got  # genuine near-dup survives
    assert not {p for p in got if p[0] < 100 and p[1] < 100}  # clique governed away
    # below the cap: identical output
    loose = VO.embedding_near_duplicates_deterministic(
        df, min_cosine=0.9, dim=4, max_key_freq=1000
    )
    assert sorted(map(tuple, loose.collect())) == sorted(map(tuple, base.collect()))


def test_simhash_governor_subset_property_random_corpus(spark):
    """Generative pin on the governor's two invariants over a mixed
    random corpus: governed pairs ⊆ ungoverned pairs at ANY cap, and
    equality once no band bucket exceeds the cap."""
    import random

    rng = random.Random(11)
    words = [f"w{j}" for j in range(40)]
    rows = [(f"d{i}", " ".join(rng.choices(words, k=12))) for i in range(40)]
    rows += [(f"t{i}", "fixed template text block") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    base = {tuple(r) for r in DD.simhash_duplicate_pairs(df, "doc_id", "text").collect()}
    for cap in (2, 5, 6, 47):
        gov = {
            tuple(r)
            for r in DD.simhash_duplicate_pairs(
                df, "doc_id", "text", max_band_freq=cap
            ).collect()
        }
        assert gov <= base, f"cap={cap} emitted pairs outside the ungoverned set"
    # 47 = corpus size: no bucket can exceed it, so zero recall loss
    full = {
        tuple(r)
        for r in DD.simhash_duplicate_pairs(
            df, "doc_id", "text", max_band_freq=47
        ).collect()
    }
    assert full == base


def test_duplicate_doc_ids_merge_shingle_sets(spark):
    """Two input rows with the SAME doc_id contribute the UNION of
    their shingles (id = identity; the distinct in _shingle_pairs is
    the merge). Pinned so a dedup-input change can't silently switch
    to first-wins or row-multiplication semantics."""
    df = spark.createDataFrame(
        [
            ("a", "alpha beta gamma delta"),
            ("a", "epsilon zeta eta theta"),  # same id, disjoint text
            ("b", "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id string, text string",
    )
    pairs = DD.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9)
    rows = pairs.collect()
    # a's merged 3-gram set ≠ b's (b has the cross-boundary 3-grams),
    # but every one of a's shingles is in b's: containment 1.0
    cont = DD.ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.9)
    crows = cont.collect()
    assert [(r["doc_a"], r["doc_b"], r["containment"]) for r in crows] == [
        ("a", "b", 1.0)
    ]
    assert rows == [] or all(r["jaccard"] < 1.0 for r in rows)


def test_fuzzy_empty_docs_pair_at_distance_zero_under_band_governor(spark):
    df = _docs(spark)
    pairs = DD.fuzzy_edit_pairs(df, "doc_id", "text", max_dist=2)
    empties = pairs.filter(F.col("id_a").rlike("^[ew]") & F.col("id_b").rlike("^[ew]"))
    got = empties.collect()
    assert len(got) == 45  # C(10,2): '' and whitespace normalize equal
    assert all(r["edit_distance"] == 0 for r in got)
    # and the always-on band governor removes them when a band
    # exceeds max_band_size (10 empties + adjacent-band copies > 5)
    tight = DD.fuzzy_edit_pairs(df, "doc_id", "text", max_dist=2, max_band_size=5)
    assert tight.filter(
        F.col("id_a").rlike("^[ew]") & F.col("id_b").rlike("^[ew]")
    ).count() == 0
