"""Order-insensitive DataFrame comparison mirroring the driver's
row-count + schema + value-hash gate (``__spark_entry__.py`` doc)."""

from __future__ import annotations

import math

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            # collapse -0.0 (the +0.0 add flips the sign bit, IEEE 754)
            # and float noise below the rounding we apply in queries
            return f"{v + 0.0:.9g}"
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
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            {"spark": a[diff_mask].head(5), "oracle": b[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch in {int(diff_mask.sum())} rows\n{sample}")
