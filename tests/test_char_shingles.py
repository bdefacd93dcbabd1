"""Character n-gram shingles (`textops.char_shingles`) and the
``unit='char'`` dedup path: the standard fallback for scripts
whitespace tokenization can't segment (CJK, Thai), where
``word_shingles`` degrades to one whole-doc shingle and near-dup
detection collapses to exact-dup."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import dedup as DD


def _naive(text: str, n: int) -> list[str]:
    norm = " ".join(text.lower().split())
    if len(norm) < n:
        return [norm]
    return [norm[i : i + n] for i in range(len(norm) - n + 1)]


CASES = [
    "abcdef",
    "Hello  World",
    "ab",
    "",
    "   ",
    "夏目漱石は明治の文豪である",
    "exact",  # len == n
    "línea acentuada über straße",
    # non-BMP: surrogate pairs in UTF-16 — the r11 self-review found
    # the regex-lookahead formulation emitted surrogate-corrupt extra
    # shingles here (Java Matcher advances zero-width matches by one
    # UTF-16 unit); Python strings are codepoint-indexed, so _naive
    # is the ground truth
    "a😀b😁c😂d",
    "𠜎𠜱𠝹𠱓𠱸𠲖爨爩",  # CJK Extension B ideographs
]


def test_char_shingles_match_naive_sliding_window(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, t string")
    got = {
        r["i"]: r["sh"]
        for r in df.select("i", TX.char_shingles("t", 5).alias("sh")).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == _naive(t, 5), f"case {i}: {t!r}"


def test_char_shingles_sql_spelling_matches(spark):
    """The docstring's DuckDB spelling (list_transform + substr with
    the short-doc CASE) reproduces the Spark shingle SET exactly —
    the contract an oracle for a char-unit query would rely on."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, t string")
    sp = {
        (r["i"], s)
        for r in df.select("i", F.explode(TX.char_shingles("t", 5)).alias("s")).collect()
        for s in [r["s"]]
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(CASES))) + ") v(i, t)",
                list(CASES))
    du = set(
        map(
            tuple,
            con.execute(
                """
        WITH nrm AS (
          SELECT i, trim(regexp_replace(lower(t), '\\s+', ' ', 'g')) AS norm FROM t
        )
        SELECT i, unnest(CASE WHEN len(norm) >= 5
               THEN list_transform(range(1, len(norm) - 3), j -> substr(norm, j, 5))
               ELSE [norm] END) AS s
        FROM nrm
        """
            ).fetchall(),
        )
    )
    assert sp == du


def test_char_unit_recovers_cjk_near_dups_word_unit_misses(spark):
    """Two unsegmented CJK docs differing by one character: the word
    unit sees two distinct whole-doc shingles (jaccard 0 — no pair);
    the char unit finds the near-dup."""
    a = "吾輩は猫である名前はまだ無い どこで生れたかとんと見当がつかぬ"
    b = "吾輩は犬である名前はまだ無い どこで生れたかとんと見当がつかぬ"
    df = spark.createDataFrame([("a", a), ("b", b)], "doc_id string, text string")
    word = DD.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.3)
    assert word.count() == 0
    char = DD.ngram_jaccard_pairs(df, "doc_id", "text", n=5, threshold=0.3, unit="char")
    rows = char.collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [("a", "b")]
    assert rows[0]["jaccard"] > 0.5
    # the minhash ladder accepts the same unit and finds the pair too
    mh = DD.minhash_duplicate_pairs(
        spark, df, "doc_id", "text", n=5, threshold=0.3, unit="char"
    )
    assert [(r["doc_a"], r["doc_b"]) for r in mh.collect()] == [("a", "b")]


def test_char_unit_decontamination_catches_cjk_quote(spark):
    """A CJK eval question quoted inside a larger corpus doc: the
    word unit sees no shared 13-gram (unsegmented text has no word
    n-grams), the char unit flags it."""
    bench = spark.createDataFrame(
        [("q1", "吾輩は猫である名前はまだ無い")], "qid string, text string"
    )
    corpus = spark.createDataFrame(
        [
            ("d1", "前置きの文章。吾輩は猫である名前はまだ無い。後続の文章がここに続く"),
            ("d2", "まったく無関係な別の文書でありこの中に引用は一切存在しないものとする"),
        ],
        "doc_id string, text string",
    )
    word_kept = DD.ngram_decontaminate(corpus, bench, "doc_id", "text", n=13)
    assert {r["doc_id"] for r in word_kept.collect()} == {"d1", "d2"}  # miss
    char_kept = DD.ngram_decontaminate(
        corpus, bench, "doc_id", "text", n=13, unit="char"
    )
    assert {r["doc_id"] for r in char_kept.collect()} == {"d2"}  # d1 flagged


def test_char_unit_rejects_unknown_unit(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    import pytest

    with pytest.raises(ValueError, match="unit"):
        DD.ngram_jaccard_pairs(df, "doc_id", "text", unit="byte").count()


def test_decontaminate_default_n_is_unit_aware(spark):
    """ADVICE r12: `ngram_decontaminate` used the 13-WORD standard as
    the default even when unit='char', silently over-flagging the
    corpus with weak 13-char collisions. The default is now unit-aware
    (13 word / 25 char); a shared 13-char-but-not-25-char run must NOT
    flag under the char default but MUST flag when n=13 is explicit."""
    shared13 = "一二三四五六七八九十甲乙丙"  # exactly 13 chars
    assert len(shared13) == 13
    bench = spark.createDataFrame(
        [("q1", shared13 + "丁戊己庚辛壬癸子丑寅卯辰巳")], "qid string, text string"
    )
    corpus = spark.createDataFrame(
        [
            ("d1", "前置きの文章がここにある" + shared13 + "後続の別内容が続いていく"),
            ("d2", "まったく無関係な別の文書でありこの中に引用は存在しないとする"),
        ],
        "doc_id string, text string",
    )
    # char default (n=25): the 13-char collision is below the window
    kept_default = DD.ngram_decontaminate(corpus, bench, "doc_id", "text", unit="char")
    assert {r["doc_id"] for r in kept_default.collect()} == {"d1", "d2"}
    # explicit n=13 still flags (override honored)
    kept_13 = DD.ngram_decontaminate(corpus, bench, "doc_id", "text", n=13, unit="char")
    assert {r["doc_id"] for r in kept_13.collect()} == {"d2"}
    # word default unchanged: 13-word collision flags
    w = " ".join(f"w{i}" for i in range(13))
    bench_w = spark.createDataFrame([("q1", w + " tail")], "qid string, text string")
    corpus_w = spark.createDataFrame(
        [("d1", "lead " + w + " trail"), ("d2", "nothing shared here at all")],
        "doc_id string, text string",
    )
    kept_w = DD.ngram_decontaminate(corpus_w, bench_w, "doc_id", "text")
    assert {r["doc_id"] for r in kept_w.collect()} == {"d2"}
