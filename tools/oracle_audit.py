"""Oracle audit at an arbitrary scale factor.

The driver's correctness gate (and the committed CORRECTNESS_LOCAL)
compare at sf0.01. Floating-point rounding-tie defects are
data-dependent: a query can be hash-green at one SF and flip at
another when an exact-rational result lands on a decimal rounding
boundary (observed twice this round — personalized PageRank and the
supplier HHI both passed sf0.001 and failed sf0.01). This tool
re-runs EVERY oracle-backed registry query against DuckDB at a
chosen SF so those latent ties surface before data growth finds
them:

    python tools/oracle_audit.py /root/testdata/sf0.1

Writes ORACLE_AUDIT_<sf>.json next to the repo root with per-query
pass/fail and prints a summary. Read-only: no gate artifacts are
touched.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = os.path.basename(sf_dir.rstrip("/"))

    import duckdb

    import __spark_entry__ as entrymod
    from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import TABLES
    from tests.oracle_compare import _column_class, canonicalize

    spark = get_spark(app_name=f"oracle-audit-{tag}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = 0
    for name in sorted(oracles):
        row: dict = {}
        try:
            sp = queries[name](spark, sf_dir).toPandas()
            du = con.execute(oracles[name]).fetchdf()
            # dtype-class drift (int64 vs float64) hash-fails at the
            # driver even when values match (r05) — audit it too
            dtype_ok = all(
                _column_class(sp[c]) == _column_class(du[c])
                or "object" in (_column_class(sp[c]), _column_class(du[c]))
                for c in sp.columns
                if c in du.columns
            )
            a, b = canonicalize(sp), canonicalize(du)
            row["spark_rows"], row["oracle_rows"] = len(sp), len(du)
            row["rows_match"] = len(sp) == len(du)
            row["dtype_match"] = bool(dtype_ok)
            row["values_match"] = bool(
                row["rows_match"] and dtype_ok
                and list(a.columns) == list(b.columns) and a.equals(b)
            )
            row["err"] = None
        except Exception as e:  # noqa: BLE001 — audit must keep going
            row["values_match"] = False
            row["err"] = repr(e)[:300]
        ok = row.get("values_match", False)
        n_pass += int(ok)
        results[name] = row
        print(f"{'PASS' if ok else 'FAIL'} {name}", flush=True)

    out_path = os.path.join(REPO, f"ORACLE_AUDIT_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": len(oracles), "n_pass": n_pass,
             "queries": results},
            f, indent=1,
        )
    print(f"{n_pass}/{len(oracles)} pass → {out_path}")
    return 0 if n_pass == len(oracles) else 1


if __name__ == "__main__":
    raise SystemExit(main())
