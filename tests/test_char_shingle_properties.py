"""Property pins for char_shingles and script detection over
ARBITRARY unicode (minus lone surrogates, which valid UTF-8 text
cannot carry): the r11 self-review found the original formulation
corrupted non-BMP text via Java's UTF-16 zero-width bump-along —
exactly the class a fixed-case table misses and a generator finds.

The naive reference windows the NORMALIZED text as returned by Spark
itself, so the property pins the shingling step (codepoint windows,
short-doc fallback) independent of lower()/whitespace semantics.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX

# full unicode incl. non-BMP; exclude surrogate category (not UTF-8)
texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=24,
    ),
    min_size=1,
    max_size=12,
)


def _naive(norm: str, n: int) -> list[str]:
    if len(norm) < n:
        return [norm]
    return [norm[i : i + n] for i in range(len(norm) - n + 1)]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_char_shingles_equal_naive_codepoint_windows(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i int, t string"
    )
    rows = df.select(
        "i",
        TX.normalized_text("t").alias("norm"),
        TX.char_shingles("t", 2).alias("s2"),
        TX.char_shingles("t", 5).alias("s5"),
    ).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r["s2"] == _naive(r["norm"], 2), repr(r["norm"])
        assert r["s5"] == _naive(r["norm"], 5), repr(r["norm"])


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_script_detection_total_and_consistent(spark, docs):
    """dominant_script is total over arbitrary unicode: always one of
    the class names or 'und', 'und' exactly when the stripped text is
    empty, and shares of non-empty docs sum to ~1."""
    names = set(TX.SCRIPT_PRIORITY) | {"other", "und"}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i int, t string"
    )
    rows = df.select(
        TX.dominant_script("t").alias("d"),
        TX.script_shares("t").alias("s"),
        F.length(F.regexp_replace("t", r"\s+", "")).alias("n"),
    ).collect()
    for r in rows:
        assert r["d"] in names
        if r["n"] == 0:
            assert r["d"] == "und"
            assert r["s"]["latin"] is None
        else:
            assert r["d"] != "und"
            # all classes incl. the r12 thai/lao/myanmar/khmer
            # additions — a hardcoded 6-class tuple here went stale
            # the moment SCRIPT_PRIORITY grew and failed on any
            # generated SEA-script codepoint (r12 self-review)
            share_names = TX.SCRIPT_PRIORITY + ("other",)
            total = sum(r["s"][c] for c in share_names)
            assert abs(total - 1.0) < len(share_names) * 1.1e-4


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts)
def test_transliterate_and_encoding_properties(spark, texts):
    """r12 additions over arbitrary unicode: transliterate_tokens
    emits exactly one alphabet codepoint per whitespace token (so the
    twin corpus preserves token-level structure 1:1), and the
    encoding-quality score stays in [0,1] (NULL only for empty docs),
    with the three damage counts never exceeding what the doc can
    hold."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    rows = df.select(
        "i",
        "t",
        F.size(TX.tokens(TX.normalized_text("t"))).alias("n_tok"),
        TX.transliterate_tokens("t", TX.HAN_ALPHABET).alias("xlit"),
        TX.replacement_char_count("t").alias("repl"),
        TX.control_char_count("t").alias("ctrl"),
        TX.mojibake_count("t").alias("moji"),
        TX.encoding_quality_score("t").alias("q"),
        F.length("t").alias("n_chars"),
    ).collect()
    han = set(TX.HAN_ALPHABET)
    for r in rows:
        # one codepoint per token, all from the alphabet
        assert len(r["xlit"]) == r["n_tok"], (r["t"], r["xlit"])
        assert set(r["xlit"]) <= han
        # counts bounded by document size
        assert 0 <= r["repl"] <= r["n_chars"]
        assert 0 <= r["ctrl"] <= r["n_chars"]
        # every mojibake signature consumes exactly 2 chars and
        # regexp_count matches are non-overlapping
        assert 0 <= 2 * r["moji"] <= r["n_chars"]
        # score contract
        if r["n_chars"] == 0:
            assert r["q"] is None
        else:
            assert 0.0 <= r["q"] <= 1.0
