"""Guards on the two driver-facing surfaces: bench.py's headline list
and the __spark_entry__ registry — a rename that orphans either would
silently weaken the per-round BENCH/CORRECTNESS record."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_headline_queries_all_registered():
    import bench
    from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

    missing = [n for n in bench.HEADLINE if n not in QUERY_REGISTRY]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"


def test_entry_contract_shape():
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert q, "queries() is empty"
    # every oracle refers to a registered query
    orphans = [k for k in o if k not in q]
    assert not orphans, f"oracle_sql entries without queries(): {orphans}"
    assert callable(next(iter(q.values())))
