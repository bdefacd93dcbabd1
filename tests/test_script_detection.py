"""Script detection (`textops.script_shares` / `dominant_script`):
the routing signal that sends unsegmented-script documents (CJK) to
the char shingle unit (tests/test_char_shingles.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX

CASES = [
    ("en", "The quick brown fox", "latin"),
    ("ja", "吾輩は猫である。名前はまだ無い", "cjk"),
    ("ko", "나는 고양이로소이다", "cjk"),
    ("ru", "Все счастливые семьи похожи друг на друга", "cyrillic"),
    ("ar", "كل السعداء متشابهون", "arabic"),
    ("num", "12345 67890", "digit"),
    ("empty", "", "und"),
    ("ws", "   \t ", "und"),
    ("mixed", "Tokyo 東京 2020", "latin"),  # 5 latin vs 2 cjk vs 4 digit
    ("math", "5×3 7÷2", "digit"),  # × ÷ are NOT latin letters
    ("extb", "𠜎𠜱𠝹𠱓𠱸𠲖爨爩", "cjk"),  # supplementary Han counts as cjk
]


def test_dominant_script_and_shares(spark):
    df = spark.createDataFrame([(k, t) for k, t, _ in CASES], "k string, t string")
    rows = {
        r["k"]: r
        for r in df.select(
            "k",
            TX.dominant_script("t").alias("script"),
            TX.script_shares("t").alias("s"),
        ).collect()
    }
    for k, _, want in CASES:
        assert rows[k]["script"] == want, f"{k}: got {rows[k]['script']}"
    # shares sum to 1 on non-empty docs; NULL on empty
    s = rows["mixed"]["s"]
    total = sum(s[c] for c in ("latin", "cjk", "cyrillic", "arabic", "digit", "other"))
    assert abs(total - 1.0) < 6e-4  # six 4-decimal-rounded shares
    assert rows["empty"]["s"]["latin"] is None
    assert rows["empty"]["s"]["n_chars"] == 0


def test_script_share_counts_match_duckdb(spark):
    """The per-class counts replay in DuckDB via
    len(regexp_extract_all(...)) over the same whitespace-stripped
    text — the oracle spelling a script-routing query would use."""
    df = spark.createDataFrame([(k, t) for k, t, _ in CASES], "k string, t string")
    sp = {
        r["k"]: (r["s"]["latin"], r["s"]["cjk"], r["s"]["n_chars"])
        for r in df.select("k", TX.script_shares("t").alias("s")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in CASES)
        + ") v(k, t)",
        [x for k, t, _ in CASES for x in (k, t)],
    )
    latin_re = TX.SCRIPT_RANGES["latin"]
    cjk_re = TX.SCRIPT_RANGES["cjk"]
    du = {
        k: (lat, cjk, n)
        for k, lat, cjk, n in con.execute(
            f"""
        WITH s AS (SELECT k, regexp_replace(t, '\\s+', '', 'g') AS st FROM t)
        SELECT k,
               round(len(regexp_extract_all(st, '{latin_re}')) * 1.0 / nullif(len(st), 0), 4),
               round(len(regexp_extract_all(st, '{cjk_re}')) * 1.0 / nullif(len(st), 0), 4),
               len(st)
        FROM s
        """
        ).fetchall()
    }
    assert sp == du


def test_routing_predicate_feeds_char_unit(spark):
    """End-to-end routing: docs whose dominant script is unsegmented
    go to the char unit, the rest to the word unit — both legs find
    their near-dup pair."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import dedup as DD

    rows = [
        ("ja1", "吾輩は猫である名前はまだ無いどこで生れたか"),
        ("ja2", "吾輩は犬である名前はまだ無いどこで生れたか"),
        ("en1", "the quick brown fox jumps over the lazy dog today"),
        ("en2", "the quick brown fox jumps over the lazy cat today"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    routed = df.withColumn(
        "unseg", TX.dominant_script("text").isin(*TX.UNSEGMENTED_SCRIPTS)
    )
    char_leg = DD.ngram_jaccard_pairs(
        routed.filter("unseg"), "doc_id", "text", n=5, threshold=0.3, unit="char"
    )
    word_leg = DD.ngram_jaccard_pairs(
        routed.filter("NOT unseg"), "doc_id", "text", n=3, threshold=0.3
    )
    assert [(r["doc_a"], r["doc_b"]) for r in char_leg.collect()] == [("ja1", "ja2")]
    assert [(r["doc_a"], r["doc_b"]) for r in word_leg.collect()] == [("en1", "en2")]
