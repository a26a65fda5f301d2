"""Window-function surface: ranking, offsets, frames, sessionization.

Reference parity: the reference's windowed computations are stall
detection via inactivity gaps (`agents/orbiter.md:176-181`),
hung-agent change detection via previous-value comparison
(`commands/pulsar.md:347-352`), and waited-longest ranking
(`agents/orbiter.md:80-81`) — all special cases of
rank/lag/frame analytics (SURVEY.md §2.6). Queue-domain renditions
live in :mod:`nova_pulsar_spark.plans.queue_queries`; the general
forms here run over `events`/`lineitem`.

Scale notes: every window partitions by a real key (user_id /
suppkey) — no global ORDER BY windows, which would single-task at
100 TB. Running sums use the decimal-exact idiom so prefix sums are
byte-stable regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import finite_measures, load_table, timestamped


@register(
    "window_rank",
    sql="""
    SELECT * FROM (
      SELECT
        l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        ROW_NUMBER()  OVER w AS rn,
        RANK()        OVER w AS rnk,
        DENSE_RANK()  OVER w AS drnk
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
    ) t WHERE rn <= 5
    """,
    doc="row_number/rank/dense_rank per group (W4 waited-longest shape)",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        l.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "window_running_sum",
    sql="""
    SELECT
      user_id, event_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM events WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
    """,
    doc="Per-user running sum/count (A6 tool-count counter shape)",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamped-rows + finite-measures contracts: time-ordered
    # frames are undefined for NULL ts, and the exact DECIMAL
    # accumulator is undefined for NaN/Inf — both excluded on both
    # sides (NULL values stay: SUM skips them identically)
    e = finite_measures(timestamped(load_table(spark, sf_dir, "events")), "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "window_lag_lead",
    sql="""
    SELECT
      user_id, event_id, ts, event_type,
      LAG(event_type)  OVER w AS prev_type,
      LEAD(event_type) OVER w AS next_type,
      CAST(EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS BIGINT) AS gap_us
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead + inactivity gap (W1 stall-detection primitive)",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamped-rows contract: time-ordered frames are undefined
    # for NULL ts (engines disagree on NULL placement) — excluded
    # explicitly on both sides
    e = timestamped(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "window_frame_moving",
    sql="""
    SELECT
      user_id, event_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
      COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_n
    FROM events WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
    """,
    doc="Bounded ROWS frame (moving sum over last 3 events)",
)
def window_frame_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamped-rows + finite-measures contracts (see
    # window_running_sum)
    e = finite_measures(timestamped(load_table(spark, sf_dir, "events")), "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, W.currentRow)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("moving_sum"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@register(
    "window_ntile_first_last",
    sql="""
    SELECT
      c_mktsegment, c_custkey, c_acctbal,
      NTILE(4) OVER w AS quartile,
      FIRST_VALUE(c_custkey) OVER w AS richest_cust,
      CAST(c_acctbal - FIRST_VALUE(c_acctbal) OVER w AS DOUBLE) AS bal_vs_top
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="ntile + first_value against group leader",
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE + group-leader comparison WITHOUT the per-segment window:
    c_mktsegment has 5 values, so `PARTITION BY c_mktsegment` ships a
    fifth of all customers to one task at any scale. The distributed
    grouped_rank (operators/ranks.py) supplies the rank and the group
    count; NTILE is integer arithmetic on those; FIRST_VALUE is the
    rank-1 row, broadcast back — the same leader every row of the
    group would have seen through the window."""
    from nova_pulsar_spark.operators.ranks import grouped_rank, ntile_expr

    c = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_custkey", "c_acctbal")
    ranked = grouped_rank(
        c,
        ["c_mktsegment"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        spark.sparkContext.defaultParallelism,
    )
    tops = ranked.filter(F.col("rn") == 1).select(
        "c_mktsegment",
        F.col("c_custkey").alias("richest_cust"),
        F.col("c_acctbal").alias("__top_bal"),
    )
    from nova_pulsar_spark.operators.ranks import nullsafe_equi_join

    # null-safe: NTILE/FIRST_VALUE oracle windows keep a NULL segment
    return nullsafe_equi_join(ranked, tops, ["c_mktsegment"], broadcast_right=True).select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        ntile_expr("rn", "n", 4).cast("int").alias("quartile"),
        "richest_cust",
        (F.col("c_acctbal") - F.col("__top_bal")).cast("double").alias("bal_vs_top"),
    )


@register(
    "window_sessionize",
    sql="""
    WITH gaps AS (
      SELECT
        user_id, event_id, ts,
        CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 600000000
             THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_no
    """,
    doc="Gap-based sessionization (the reference's 10-min inactivity stall gap, batch form)",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 10-minute inactivity gap == the reference's stall threshold
    # (agents/orbiter.md:176-181): a new "session" starts when an agent
    # is silent longer than the stall window. Timestamped-rows
    # contract: an un-timestamped event cannot bound a session.
    e = timestamped(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 600_000_000), 1).otherwise(0)
    return (
        e.select("user_id", "event_id", "ts", new_session.alias("new_session"))
        .select("user_id", "event_id", "ts", F.sum("new_session").over(wrun).alias("session_no"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
