"""Positive plan-shape pins: the 100 TB design claims, enforced
mechanically. `test_plan_lint` bans antipatterns everywhere; this file
asserts the GOOD shapes are actually planned on representative queries
— dims broadcast, filters and projections reaching the parquet scan,
partial (map-side) aggregation, global top-k as TakeOrdered. A Spark
upgrade or refactor that silently degrades one of these shapes fails
here, not in a production profile.
"""

from __future__ import annotations

import re

from nova_pulsar_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    """Operator-tree string (one line per operator — good for counts)."""
    return all_queries()[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(spark, name: str) -> str:
    """Formatted explain: scan details (PushedFilters/ReadSchema) untruncated."""
    df = all_queries()[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_star_joins_broadcast_every_dim(spark):
    """TPC-H Q5 joins 5 dims around lineitem: every one must plan as a
    broadcast join — zero sort-merge shuffles of the fact table."""
    p = _plan(spark, "tpch_q5")
    assert p.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in p
    p2 = _plan(spark, "join_multiway_star")
    assert p2.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p2


def test_flagship_scan_prunes_and_pushes(spark):
    """pricing_summary reads exactly its 7 columns with the shipdate
    predicate pushed into the parquet scan."""
    p = _plan_formatted(spark, "pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1)
    rs = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, cols


def test_aggregates_are_partial_then_final(spark):
    """Hash aggregations plan as partial (map-side combine) + final —
    the shuffle carries combined state, not raw rows."""
    for name in ("llm_dedup_exact", "agg_state_counts", "pricing_summary"):
        p = _plan(spark, name)
        assert p.count("HashAggregate") >= 2, name


def test_global_topk_is_take_ordered(spark):
    """Brute-force similarity top-k must plan as TakeOrderedAndProject
    (per-partition heads + driver merge), never a global sort."""
    p = _plan(spark, "llm_simsearch_topk")
    assert "TakeOrderedAndProject" in p
    assert "Sort [" not in p.split("TakeOrderedAndProject")[0]


def test_small_side_broadcasts_in_contamination(spark):
    """The benchmark shingle set is the broadcast side of the
    contamination join — the corpus side never shuffles for the join."""
    p = _plan(spark, "llm_contamination")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
