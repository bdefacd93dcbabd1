"""Encoding-quality signals (`textops.replacement_char_count /
control_char_count / mojibake_count / encoding_quality_score`): the
ingest-time QA battery for decode damage — replacement chars, stray
C0/C1 controls, UTF-8-as-Latin-1/cp1252 mojibake (r12)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX

CASES = [
    ("clean", "perfectly ordinary text, nothing wrong at all"),
    ("repl", "dec�ded with l�ss"),
    ("ctrl", "bell\x07 and unit\x1fseparator but \t\n\r are fine"),
    ("moji_latin1", "cafÃ© naÃ¯ ve rÃ©sumÃ©"),
    ("moji_cp1252", "â€œsmart quotesâ€ and â€™apostropheâ€™"),
    ("moji_nbsp", "Â½ cup Â· Â° degrees"),
    ("accents_real", "café naïve résumé — genuinely clean UTF-8"),
    ("empty", ""),
]
EXPECT = {
    "clean": (0, 0, 0),
    "repl": (2, 0, 0),
    "ctrl": (0, 2, 0),
    "moji_latin1": (0, 0, 4),
    "moji_cp1252": (0, 0, 4),
    "moji_nbsp": (0, 0, 3),
    "accents_real": (0, 0, 0),  # real accents must NOT count as mojibake
    "empty": (0, 0, 0),
}


def test_signal_counts_and_score(spark):
    df = spark.createDataFrame(CASES, "k string, t string")
    rows = {
        r["k"]: r
        for r in df.select(
            "k",
            TX.replacement_char_count("t").alias("repl"),
            TX.control_char_count("t").alias("ctrl"),
            TX.mojibake_count("t").alias("moji"),
            TX.encoding_quality_score("t").alias("q"),
        ).collect()
    }
    for k, (repl, ctrl, moji) in EXPECT.items():
        got = (rows[k]["repl"], rows[k]["ctrl"], rows[k]["moji"])
        assert got == (repl, ctrl, moji), f"{k}: {got}"
    assert rows["clean"]["q"] == 1.0
    assert rows["accents_real"]["q"] == 1.0
    assert rows["repl"]["q"] < 1.0
    assert rows["empty"]["q"] is None  # complete-case: no chars, no score


def test_signal_counts_match_duckdb(spark):
    """The three regex signals replay exactly in DuckDB RE2 — the
    \\x{..} codepoint-escape spelling both engines accept (literal
    cp1252-glyph ranges are NOT contiguous Unicode ranges and RE2
    rejects the reversed endpoints; pinned here so the spelling can't
    regress)."""
    df = spark.createDataFrame(CASES, "k string, t string")
    sp = {
        r["k"]: (r["repl"], r["ctrl"], r["moji"])
        for r in df.select(
            "k",
            TX.replacement_char_count("t").alias("repl"),
            TX.control_char_count("t").alias("ctrl"),
            TX.mojibake_count("t").alias("moji"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in CASES)
        + ") v(k, t)",
        [x for row in CASES for x in row],
    )
    du = {
        k: (a, b, c)
        for k, a, b, c in con.execute(
            f"""
        SELECT k,
               len(regexp_extract_all(t, '{TX.REPLACEMENT_CHAR_RE}')),
               len(regexp_extract_all(t, '{TX.CONTROL_CHAR_RE}')),
               len(regexp_extract_all(t, '{TX.MOJIBAKE_RE}'))
        FROM t
        """
        ).fetchall()
    }
    assert sp == du
