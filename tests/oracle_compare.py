"""Order-insensitive DataFrame comparison mirroring the driver's
row-count + schema + value-hash gate (``__spark_entry__.py`` doc)."""

from __future__ import annotations

import math

import pandas as pd


def _dtype_class(dtype) -> str:
    """Coarse dtype family for the strict pre-normalization check.

    The r05 driver gate proved the driver's hasher distinguishes an
    int64 Spark column from a float64 oracle column even when every
    value is numerically equal (DuckDB HUGEINT sum → pandas float64
    vs Spark bigint). The local compare must predict that, so dtype
    CLASSES are compared before any value normalization collapses
    them.
    """
    kind = getattr(dtype, "kind", "O")
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    return "object"


def _column_class(col: pd.Series) -> str:
    """_dtype_class, refined for object columns: a column of
    decimal.Decimal cells (DuckDB DECIMAL output — e.g. a weight
    literal chain the optimizer kept exact) is its own class, because
    the driver's hasher will not equate Decimal('5') with int64 5 any
    more than it equated float64 with int64 (r05)."""
    import decimal

    cls = _dtype_class(col.dtype)
    if cls == "object":
        sample = next((v for v in col if v is not None), None)
        if isinstance(sample, decimal.Decimal):
            return "decimal"
    return cls


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            # collapse -0.0 (the +0.0 add flips the sign bit, IEEE
            # 754). 17 significant digits round-trip every float64
            # exactly, so a last-digit difference above 1e9 (which
            # the old %.9g silently collapsed — r05 lesson) fails.
            return f"{v + 0.0:.17g}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    # Strict dtype-class gate BEFORE normalization: int64 vs float64
    # drift (DuckDB HUGEINT → float64) hash-failed 3 queries at the
    # r05 driver even though values matched — the local compare must
    # fail the same way so it predicts the driver gate.
    sa = {c: _column_class(spark_pdf[c]) for c in sorted(spark_pdf.columns)}
    ob = {c: _column_class(oracle_pdf[c]) for c in sorted(oracle_pdf.columns)}
    for c in sa:
        if c in ob and "object" not in (sa[c], ob[c]):
            assert sa[c] == ob[c], (
                f"{name}: dtype-class mismatch on column {c!r}: "
                f"spark={sa[c]} ({spark_pdf[c].dtype}) vs "
                f"oracle={ob[c]} ({oracle_pdf[c].dtype}) — the driver "
                f"hasher distinguishes these even when values match"
            )
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            {"spark": a[diff_mask].head(5), "oracle": b[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch in {int(diff_mask.sum())} rows\n{sample}")
