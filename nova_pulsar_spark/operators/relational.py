"""Core relational surface: scans, filters, projections, flagship query.

Reference parity: the reference's scan/filter/projection operators
(SURVEY.md §2.1-§2.2; e.g. queue scans `scripts/starry-daemon.sh:91-103`,
bounded scans, derived projections `hooks/status-tracker.sh:33-35`)
decompose into exactly these primitives; the queue-domain renditions
live in :mod:`nova_pulsar_spark.plans.queue_queries`. This module
carries the TPC-H-shaped analytic forms the oracle exercises.

Scale notes: every query here is pure DataFrame API → Catalyst gives
predicate pushdown, column pruning and whole-stage codegen. The
flagship aggregation is a map-side-combinable hash aggregate over a
low-cardinality key (6 groups): at 100 TB it scales linearly with
input and shuffles only #partitions × #groups partial rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table

# Exact-aggregation idiom shared with the DuckDB oracle: cast each
# row-level double (deterministic IEEE result, identical in both
# engines) to a decimal wide enough to hold it exactly, sum the
# decimals (exact, order-insensitive), and cast the final total back
# to double. This makes double aggregates bit-identical across
# engines regardless of summation order — required for the driver's
# value-hash comparison.


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem (scan→filter→agg→sort in one plan).

    Uses the long-cents exact-sum idiom (functions/exact.py): integer
    sums are both reproducible across engines and ~3× faster than
    decimal aggregation — this is the headline bench query.
    """
    from nova_pulsar_spark.functions.exact import sum_cents

    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_cents(F.col("l_quantity"), 100).alias("sum_qty"),
            sum_cents(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            sum_cents(disc_price, 1_000_000).alias("sum_disc_price"),
            sum_cents(charge, 1_000_000).alias("sum_charge"),
            (sum_cents(F.col("l_quantity"), 100) / n).alias("avg_qty"),
            (sum_cents(F.col("l_discount"), 100) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


from nova_pulsar_spark.functions.exact import sql_sum_cents as _ssc  # noqa: E402

FLAGSHIP_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_ssc("l_quantity", 100)} AS sum_qty,
  {_ssc("l_extendedprice", 100)} AS sum_base_price,
  {_ssc("l_extendedprice * (1.0 - l_discount)", 1000000)} AS sum_disc_price,
  {_ssc("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 1000000)} AS sum_charge,
  {_ssc("l_quantity", 100)} / COUNT(*) AS avg_qty,
  {_ssc("l_discount", 100)} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

register("pricing_summary", sql=FLAGSHIP_SQL, doc="Flagship: TPC-H-Q1-shaped pricing summary")(flagship)


@register(
    "scan_project_filter",
    sql="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45.0
    """,
    doc="Pruned scan: 2-column projection + pushed-down predicates",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both the filter and the 2-column projection reach the parquet
    # reader (PushedFilters / ReadSchema in .explain) — at 100 TB this
    # is the difference between scanning 2 columns' pages and all 11.
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01"))) & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_extendedprice")


@register(
    "filter_in_set",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice > 200000.0
    """,
    doc="IN-list + range predicate (pushdown-eligible)",
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & (F.col("o_totalprice") > 200000.0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "project_case_expr",
    sql="""
    SELECT
      o_orderkey,
      CASE WHEN o_totalprice >= 300000.0 THEN 'large'
           WHEN o_totalprice >= 100000.0 THEN 'medium'
           ELSE 'small' END AS size_class,
      CAST(o_totalprice * 0.1 AS DOUBLE) AS est_tax
    FROM orders
    """,
    doc="CASE/arithmetic projection (reference P9-P11 shape)",
)
def project_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "large")
        .when(F.col("o_totalprice") >= 100000.0, "medium")
        .otherwise("small")
        .alias("size_class"),
        (F.col("o_totalprice") * 0.1).cast("double").alias("est_tax"),
    )


@register(
    "filter_null_semantics",
    sql="""
    SELECT event_id, user_id, value
    FROM events
    WHERE (value IS NOT NULL AND value > 30.0) OR event_type = 'error'
    """,
    doc="Null-aware predicate composition (reference F11/jq-default shape)",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(
        (F.col("value").isNotNull() & (F.col("value") > 30.0)) | (F.col("event_type") == "error")
    ).select("event_id", "user_id", "value")
