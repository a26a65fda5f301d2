from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols


def test_queries_and_oracle_keys_align(spark):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) > 0
    # every oracle key must have a query
    assert set(o) <= set(q)


def test_flagship_plan_is_aggregate_with_pushdown(spark, sf_dir):
    df = entrymod.entry(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
