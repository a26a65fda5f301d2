"""Complex analytic query shapes (TPC-H-style) — multi-level
subqueries, histograms over outer joins, anti-join aggregates, and
explicit null-ordering/empty-result pins.

These exercise Catalyst's decorrelation, exists-rewrites, and
null-semantics end to end; every query has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.functions.exact import sql_sum_cents, sum_cents
from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


@register(
    "q_min_cost_supplier",
    sql="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation, s.s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    """,
    doc="TPC-H-Q2 shape: correlated min subquery per group",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    mins = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(F.broadcast(mins), (s.s_nationkey == mins.nk) & (s.s_acctbal == mins.min_bal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), "s_acctbal")
    )


@register(
    "q_cust_order_histogram",
    sql="""
    SELECT n_orders, COUNT(*) AS n_customers FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
    GROUP BY n_orders
    """,
    doc="TPC-H-Q13 shape: per-customer order counts → distribution histogram",
)
def q_cust_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q_multi_exists",
    sql="""
    SELECT o.o_orderkey, o.o_orderpriority
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity < 5.0)
    """,
    doc="TPC-H-Q21 shape: EXISTS + NOT EXISTS on the same fact",
)
def q_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    has_r = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    has_small = l.filter(F.col("l_quantity") < 5.0).select("l_orderkey")
    return (
        o.join(has_r, o.o_orderkey == has_r.l_orderkey, "left_semi")
        .join(has_small, F.col("o_orderkey") == has_small.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "q_avg_quantity_outliers",
    sql=f"""
    SELECT l.l_orderkey, l.l_partkey, l.l_quantity
    FROM lineitem l
    JOIN (SELECT l_partkey, {sql_sum_cents("l_quantity", 100)} / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity > 1.8 * a.avg_qty
    """,
    doc="TPC-H-Q17 shape: rows above a per-key average (exact-sum parity)",
)
def q_avg_quantity_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (sum_cents(F.col("l_quantity"), 100) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(avg), l.l_partkey == avg.pk)
        .filter(F.col("l_quantity") > 1.8 * F.col("avg_qty"))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "order_nulls_explicit",
    sql="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000.0
    ORDER BY o_totalprice DESC NULLS LAST, c_custkey
    LIMIT 20
    """,
    doc="Explicit NULLS LAST ordering pin (Spark and DuckDB defaults differ)",
)
def order_nulls_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark desc() is NULLS LAST by default but DuckDB's is NULLS LAST
    # for DESC too — the pin makes the contract explicit either way;
    # ascending orders are where the defaults diverge (Spark NULLS
    # FIRST vs DuckDB NULLS LAST), so ordered+limited results must
    # always spell it out.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000.0), "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), "c_custkey")
        .limit(20)
    )


@register(
    "empty_result_schema",
    sql="""
    SELECT o_orderkey, o_totalprice, 'none' AS tag
    FROM orders WHERE o_totalprice < 0.0
    """,
    doc="Deterministic empty result: schema must survive zero rows",
)
def empty_result_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") < 0.0).select(
        "o_orderkey", "o_totalprice", F.lit("none").alias("tag")
    )
