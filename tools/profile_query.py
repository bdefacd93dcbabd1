"""Profile one registry query: cold + warm timings, row count, and
the formatted physical plan.

    python tools/profile_query.py <query_name> [sf_dir] [runs]

Use when iterating on an operator: the cold run shows compile+exec
(what bench records), warm runs isolate execution, and the plan shows
whether pushdown/broadcast/codegen look right.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark(app_name=f"profile-{name}")
    queries = entrymod.queries()
    if name not in queries:
        raise SystemExit(f"unknown query {name!r}; known: {sorted(queries)}")

    # absorb session startup with an unrelated warmup
    queries["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings = []
    for i in range(runs):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings.append(round(time.perf_counter() - t0, 3))
    df = queries[name](spark, sf_dir)
    print(f"{name} @ {sf_dir}")
    print(f"  cold {timings[0]} s, warm {timings[1:]} s, rows {df.count()}")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    print(df._jdf.queryExecution().explainString(mode))


if __name__ == "__main__":
    main()
