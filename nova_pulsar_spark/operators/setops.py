"""Set-operation surface: union/unionByName, intersect, except (+ ALL).

Reference parity: queue migration unions (`scripts/setup.sh:60-113` —
review ∪ archived → completed with dedup), two-queue search
(`commands/pulsar.md:96-98`), eligible-set difference
(`agents/orbiter.md:85-87`). Queue-domain renditions live in
:mod:`nova_pulsar_spark.plans.queue_queries`; the general family here
runs on orders/customer slices (SURVEY.md §2.7).

Scale notes: INTERSECT/EXCEPT compile to aggregate/join plans —
Catalyst rewrites them; unions are zero-shuffle concatenations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


def _urgent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


def _large(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_custkey")
    )


@register(
    "setop_union_distinct",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
    doc="UNION with dedup (migration U1 shape)",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).union(_large(spark, sf_dir)).distinct()


@register(
    "setop_union_all",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
    doc="UNION ALL (bag semantics, zero shuffle)",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).union(_large(spark, sf_dir))


@register(
    "setop_intersect",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
    doc="INTERSECT (distinct semantics)",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).intersect(_large(spark, sf_dir))


@register(
    "setop_except",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
    doc="EXCEPT — the reference's eligible = queued ∖ blocked (U3)",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT DISTINCT (drops left rows that appear in right,
    # dedups the rest) — matching ANSI EXCEPT semantics exactly.
    return _urgent(spark, sf_dir).subtract(_large(spark, sf_dir))


@register(
    "setop_union_by_name",
    sql="""
    SELECT c_custkey AS custkey, c_acctbal AS acctbal, c_mktsegment AS segment FROM customer
    UNION ALL
    SELECT s_suppkey AS custkey, s_acctbal AS acctbal, NULL AS segment FROM supplier
    """,
    doc="Schema-evolving union (unionByName allowMissingColumns — migration §1.3)",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mirrors the reference's schema-evolution migration: records with
    # differing shapes unioned with missing columns null-filled
    # (SURVEY.md §1.3 → unionByName(allowMissingColumns=True)).
    c = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("custkey"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s, allowMissingColumns=True)
