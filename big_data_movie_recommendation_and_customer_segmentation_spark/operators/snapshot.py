"""Snapshot diff and merge-upsert — the CDC half of a batch lakehouse
pipeline: classify row-level changes between two snapshots of the
same keyed relation, and apply a change set onto a base snapshot
(MERGE INTO semantics, expressed as plain DataFrame ops so it runs
on any store, not just ACID table formats).

The reference pipeline re-derives everything from full reloads
(reference: every script re-reads the whole ratings CSV — e.g.
codes/Customer Segmentation/part1/top_100_pairs.py:26); diff +
merge is what replaces that full reload at 100 TB.

100 TB shape
------------
* ``snapshot_diff`` is ONE full-outer shuffle join on the key. The
  attribute comparison is a null-safe struct equality — codegen'd
  column expressions, no hashing round-trip, no UDF.
* If both snapshots are written bucketed by the key (io.py
  ``write_bucketed``), the join is shuffle-free — the same
  contract the bucketed-join test pins.
* ``apply_changes`` is the same single join shape: base LEFT-ANTI
  changes (survivors) unioned with upserts — two reads, one
  shuffle each, no window, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots as ``insert`` (new
    only), ``delete`` (old only), ``update`` (both, any compare
    column differs, null-safely), or ``unchanged``.

    Returns the key columns + ``change_type`` + the NEW snapshot's
    compare columns (null for deletes) — exactly the shape a
    downstream MERGE consumes.
    """
    cmp_cols = compare_cols or [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*cmp_cols).alias("_old_attrs"))
    n = new.select(*keys, F.struct(*cmp_cols).alias("_new_attrs"))
    j = o.join(n, keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("_old_attrs").isNull(), F.lit("insert"))
        .when(F.col("_new_attrs").isNull(), F.lit("delete"))
        .when(
            F.col("_old_attrs").eqNullSafe(F.col("_new_attrs")), F.lit("unchanged")
        )
        .otherwise(F.lit("update"))
        .alias("change_type"),
        *[F.col(f"_new_attrs.{c}").alias(c) for c in cmp_cols],
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    change_type_col: str = "change_type",
) -> DataFrame:
    """MERGE a change set (rows shaped like :func:`snapshot_diff`
    output) onto ``base``: deletes drop the key, inserts/updates
    upsert the carried attributes, ``unchanged`` rows are ignored.

    Result is bit-identical to the ``new`` snapshot the diff was
    taken against — pinned by a round-trip test.
    """
    touched = changes.filter(F.col(change_type_col) != F.lit("unchanged"))
    survivors = base.join(
        touched.select(*keys), keys, "left_anti"
    )
    upserts = (
        touched.filter(F.col(change_type_col).isin("insert", "update"))
        .drop(change_type_col)
        .select(*base.columns)
    )
    return survivors.unionByName(upserts)
