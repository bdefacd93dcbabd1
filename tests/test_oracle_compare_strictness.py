"""The local compare must PREDICT the driver's hash gate.

r05 lesson: three PQ/IVFADC queries were local-green but driver-red
because (a) DuckDB's HUGEINT sum arrived as float64 while Spark
emitted int64, and (b) the old ``%.9g`` float formatting collapsed
exact-integer differences above 1e9. These tests pin the hardened
behavior so the trap cannot reopen.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_compare import assert_frames_match, canonicalize


def test_int64_vs_float64_dtype_mismatch_fails():
    """Numerically-equal values under different dtype classes must
    fail locally (the driver hasher distinguishes them — r05)."""
    spark_pdf = pd.DataFrame({"k": [1, 2], "adc_dist": pd.array([604889, 12], dtype="int64")})
    oracle_pdf = pd.DataFrame({"k": [1, 2], "adc_dist": pd.array([604889.0, 12.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype-class mismatch"):
        assert_frames_match(spark_pdf, oracle_pdf, "dtype_trap")


def test_last_digit_difference_above_1e9_fails():
    """%.17g formatting: a 1-in-the-last-digit difference on a large
    exact-int float64 must fail (the old %.9g collapsed it)."""
    a = pd.DataFrame({"v": [1234567890123.0]})
    b = pd.DataFrame({"v": [1234567890124.0]})
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_frames_match(a, b, "ulp_trap")


def test_one_ulp_difference_fails():
    """17 significant digits round-trip float64 exactly, so even a
    1-ulp difference is visible."""
    import math

    x = 0.1 + 0.2  # 0.30000000000000004
    y = 0.3
    assert x != y
    a = pd.DataFrame({"v": [x]})
    b = pd.DataFrame({"v": [y]})
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_frames_match(a, b, "one_ulp")
    assert math.isclose(x, y)  # the old 9g canon would have collapsed these


def test_equal_frames_still_pass():
    a = pd.DataFrame({"k": ["x", "y"], "v": [1.5, -0.0], "n": pd.array([3, 4], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([4, 3], dtype="int64"), "v": [0.0, 1.5], "k": ["y", "x"]})
    assert_frames_match(a, b, "equal_ok")


def test_canonicalize_sorts_and_normalizes():
    df = pd.DataFrame({"b": [None, 2.0], "a": ["q", "p"]})
    out = canonicalize(df)
    assert list(out.columns) == ["a", "b"]
    assert out["b"].tolist() == ["2", "∅"]


def test_decimal_vs_int_dtype_mismatch_fails():
    """DuckDB DECIMAL output arrives as object-dtype Decimal cells;
    the driver hasher will not equate Decimal('5') with int64 5, so
    neither may the local compare (the object-dtype escape hatch must
    not swallow it)."""
    from decimal import Decimal

    spark_pdf = pd.DataFrame({"v": pd.array([5, 7], dtype="int64")})
    oracle_pdf = pd.DataFrame({"v": [Decimal("5"), Decimal("7")]})
    with pytest.raises(AssertionError, match="dtype-class mismatch"):
        assert_frames_match(spark_pdf, oracle_pdf, "decimal_trap")
