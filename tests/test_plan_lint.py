"""Global plan lint: the 100 TB contract enforced over EVERY
registered query, not just hand-picked examples.

Two antipatterns are banned outright:
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan; the
  engine's only Python paths are Arrow-vectorized
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``).
- ``CartesianProduct`` — a non-broadcast cross join; every cross join
  in the engine is against a broadcast singleton/tiny frame, which
  plans as ``BroadcastNestedLoopJoin`` instead.

Also pinned: every registered query carries a DuckDB oracle twin —
the zero-rows-only invariant the correctness gate relies on.
"""

from __future__ import annotations

import pytest

from nova_pulsar_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

BANNED = ("CartesianProduct", "BatchEvalPython")


def test_every_query_has_an_oracle_twin():
    missing = [n for n, rq in all_queries().items() if rq.sql is None]
    assert not missing, f"rows-only queries (no oracle SQL): {missing}"


@pytest.mark.slow
def test_no_query_plans_a_scale_antipattern(spark):
    flagged = {}
    for name, rq in sorted(all_queries().items()):
        plan = rq.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        hits = [p for p in BANNED if p in plan]
        if hits:
            flagged[name] = hits
    assert not flagged, f"scale antipatterns in plans: {flagged}"
