"""Regenerate CORRECTNESS_LOCAL.json: the full-registry local gate at
sf0.01 (the driver's comparison SF).

Every registered query runs; oracle-backed ones (162) are compared
against DuckDB exactly as the driver does (row count, column names,
dtype class, canonicalized values); the rows-only-by-nature ones (6 —
seeded ML fits and probabilistic ANN variants, each with a
value-checked deterministic sibling in its family) record row count +
a clean run. Prior rounds regenerated this artifact with inline
scripts; this pins the procedure.

    python tools/local_gate.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entrymod
    from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
    from big_data_movie_recommendation_and_customer_segmentation_spark.plans import GATE_PRIORITY
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import TABLES
    from tests.oracle_compare import _column_class, canonicalize

    spark = get_spark(app_name="local-gate")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    gate = set(GATE_PRIORITY[:50])
    results: dict[str, dict] = {}
    n_pass = 0
    for name, fn in queries.items():
        row: dict = {"in_driver_gate": name in gate}
        try:
            sp = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sp)
            if name in oracles:
                du = con.execute(oracles[name]).fetchdf()
                dtype_ok = all(
                    _column_class(sp[c]) == _column_class(du[c])
                    or "object" in (_column_class(sp[c]), _column_class(du[c]))
                    for c in sp.columns
                    if c in du.columns
                )
                a, b = canonicalize(sp), canonicalize(du)
                row["oracle_rows"] = len(du)
                row["rows_match"] = len(sp) == len(du)
                row["schema_match"] = sorted(sp.columns) == sorted(du.columns)
                row["dtype_match"] = bool(dtype_ok)
                row["values_match"] = bool(
                    row["rows_match"] and row["schema_match"] and dtype_ok
                    and list(a.columns) == list(b.columns) and a.equals(b)
                )
                ok = row["values_match"]
            else:
                row["oracle"] = "rows_only"
                ok = True
            row["err"] = None
        except Exception as e:  # noqa: BLE001 — the sweep must keep going
            row["err"] = repr(e)[:300]
            ok = False
        n_pass += int(ok)
        results[name] = row
        print(f"{'PASS' if ok else 'FAIL'} {name}", flush=True)

    out_path = os.path.join(REPO, "CORRECTNESS_LOCAL.json")
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": len(queries), "n_pass": n_pass,
             "queries": results},
            f, indent=1,
        )
    print(f"{n_pass}/{len(queries)} pass → {out_path}")
    return 0 if n_pass == len(queries) else 1


if __name__ == "__main__":
    raise SystemExit(main())
