"""Run the driver-style correctness gate locally over the WHOLE
registry (not just the 50-slot driver window) and write
CORRECTNESS_LOCAL.json — committed evidence for the queries that
rotate out of the driver gate (see COVERAGE.md "gate budget").

    python tools/gate_report.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import TABLES
from tests.oracle_compare import _column_class, canonicalize


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gate-report")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    gate = set(list(queries)[:50])

    report: dict[str, dict] = {}
    for name, fn in queries.items():
        row: dict = {"in_driver_gate": name in gate}
        try:
            spdf = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = int(len(spdf))
            if name in oracles:
                oddf = con.execute(oracles[name]).fetchdf()
                row["oracle_rows"] = int(len(oddf))
                # dtype-class drift (int64 vs float64) hash-fails at
                # the driver even when values match (r05 lesson)
                dtype_ok = all(
                    _column_class(spdf[c]) == _column_class(oddf[c])
                    or "object" in (_column_class(spdf[c]), _column_class(oddf[c]))
                    for c in spdf.columns
                    if c in oddf.columns
                )
                a, b = canonicalize(spdf), canonicalize(oddf)
                row["rows_match"] = len(spdf) == len(oddf)
                row["schema_match"] = list(a.columns) == list(b.columns)
                row["dtype_match"] = bool(dtype_ok)
                row["values_match"] = bool(dtype_ok and a.equals(b))
            else:
                row["oracle"] = "rows_only"
            row["err"] = None
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        report[name] = row

    ok = [
        n for n, r in report.items()
        if r.get("err") is None and r.get("values_match", True)
    ]
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "n_pass": len(ok),
        "queries": report,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "CORRECTNESS_LOCAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(ok)}/{len(report)} pass → {path}")
    spark.stop()


if __name__ == "__main__":
    main()
