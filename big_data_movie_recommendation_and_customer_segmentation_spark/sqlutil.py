"""Small SQL-text helpers for the plan-build collapse sites.

Several operators build ONE SQL-parsed expression instead of
per-term Column chains (the Py4J plan-build chatter collapse:
minhash r9, simhash/packing r10, ewma r11, CMS cells r11). Those
sites interpolate caller-supplied COLUMN NAMES into SQL text, so the
names must be quoted as identifiers, not pasted raw (ADVICE r12: a
name containing a backtick broke parsing or injected expression
text).
"""

from __future__ import annotations


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for interpolation into Spark SQL
    expression text, doubling any embedded backticks (Spark's escape
    for a literal backtick inside a quoted identifier). Rejects
    non-strings outright — an expression has no business reaching an
    identifier slot."""
    if not isinstance(name, str):
        raise TypeError(f"column name must be str, got {type(name).__name__}")
    return "`" + name.replace("`", "``") + "`"
