"""Supplementary operator surface: string distance, unpivot, lateral
explode, distribution ranks, date arithmetic — rounding out the
"complete engine" claim beyond SURVEY §2's minimum.

All oracle-checked; cume_dist/percent_rank divisions are exact
(small-integer ratios identical in IEEE across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


@register(
    "fn_string_distance",
    sql="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.source, b.source) AS BIGINT) AS src_edit_dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND b.doc_id = a.doc_id + 1
    """,
    doc="Levenshtein edit distance (fuzzy matching primitive for dedup pipelines)",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("la"), F.col("source").alias("sa"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lb"), F.col("source").alias("sb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("doc_b") == F.col("doc_a") + 1))
        .select("doc_a", "doc_b", F.levenshtein("sa", "sb").cast("bigint").alias("src_edit_dist"))
    )


@register(
    "reshape_unpivot",
    sql="""
    SELECT l_orderkey, l_linenumber, k AS measure, CAST(v AS DOUBLE) AS val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (v FOR k IN (l_quantity, l_extendedprice, l_discount))
    """,
    doc="Unpivot / melt wide→long (stack)",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, 'l_discount', l_discount) AS (measure, val)",
    ).select("l_orderkey", "l_linenumber", "measure", F.col("val").cast("double").alias("val"))


@register(
    "lateral_explode_tokens",
    sql="""
    SELECT doc_id, t.token, CAST(length(t.token) AS BIGINT) AS token_len
    FROM documents, UNNEST(string_split(substr(text, 1, 40), ' ')) AS t(token)
    WHERE doc_id < 20
    """,
    doc="Lateral view / generator: per-row token explosion",
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.explode(F.split(F.substring("text", 1, 40), " ")).alias("token")
    ).select("doc_id", "token", F.length("token").cast("bigint").alias("token_len"))


@register(
    "window_distribution",
    sql="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CUME_DIST() OVER w AS bal_cume,
           PERCENT_RANK() OVER w AS bal_pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution ranks (cume_dist/percent_rank) per segment",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.cume_dist().over(w).alias("bal_cume"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
    )


@register(
    "fn_date_arith",
    sql="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
           date_trunc('month', o_orderdate) AS order_month
    FROM orders
    """,
    doc="Date arithmetic: interval add, diff, parts, truncation",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01"))).cast("bigint").alias("days_since_epoch_start"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
    )
