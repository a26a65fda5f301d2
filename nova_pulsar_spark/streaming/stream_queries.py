"""Streaming-surface queries (SURVEY.md §2.9).

The watermark/window family is registered in batch form (a streaming
query with ``AvailableNow`` over static input produces exactly these
results — asserted in tests/test_streaming.py) so the driver's oracle
can check values; the stateful lifecycle family runs the state-machine
code (:mod:`nova_pulsar_spark.streaming.state`) in its deterministic
batch rendition and is registered rows-only, with the true
``applyInPandasWithState`` path exercised by the streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.plans.fixtures import STATUS_EVENTS
from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table
from nova_pulsar_spark.streaming.state import lifecycle_batch


@register(
    "stream_tumbling",
    sql="""
    SELECT
      make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 5-min window agg (streaming form: readStream + withWatermark + window)",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "stream_sliding",
    sql="""
    SELECT
      make_timestamp(((epoch_us(ts) // 60000000) - k.k) * 60000000) AS window_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN (SELECT UNNEST(range(0, 5)) AS k) k
    GROUP BY 1
    """,
    doc="Sliding window 5 min / 1 min slide (each event in 5 overlapping windows)",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "stream_session",
    sql="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
    doc="session_window(ts, '10 minutes') — the reference's stall gap as a session boundary",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session_window end = last event + gap, matching the oracle's
    # max(ts) + 10 min; the 10-minute gap IS the reference's stall
    # threshold (agents/orbiter.md:176-181).
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    sql="""
    SELECT user_id, event_type, event_id AS first_event, ts AS first_ts FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    doc="Streaming dedup (dropDuplicatesWithinWatermark): deterministic first event per key",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event"), F.col("ts").alias("first_ts"))
    )


# ---------------------------------------------------------------------------
# Stateful lifecycle (rows-only: Pandas state machine; streaming path in tests)
# ---------------------------------------------------------------------------


@register(
    "state_lifecycle",
    sql=None,  # stateful pandas path → rows-only; semantics pinned in tests
    doc="Q2/Q3: per-phase lifecycle transitions from the status stream (state machine replay)",
)
def state_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lifecycle_batch(STATUS_EVENTS.spark_df(spark))


@register(
    "state_claim",
    sql=None,
    doc="Q6: claim CAS — competing thread's events rejected (single-writer-per-key)",
)
def state_claim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Synthetic race: th-B reports on a phase th-A already owns.
    from datetime import datetime

    rows = [
        ("phase-1-p1", "alpha", "p1", 1, "th-A", "starting", 0, None, None, datetime(2026, 3, 1, 9, 0, 0), datetime(2026, 3, 1, 9, 0, 0), None),
        ("phase-1-p1", "alpha", "p1", 1, "th-B", "running", 3, "Edit", "x.py", datetime(2026, 3, 1, 9, 0, 30), datetime(2026, 3, 1, 9, 0, 0), None),
        ("phase-1-p1", "alpha", "p1", 1, "th-A", "running", 5, "Bash", "x.py", datetime(2026, 3, 1, 9, 1, 0), datetime(2026, 3, 1, 9, 0, 0), None),
        ("phase-1-p1", "alpha", "p1", 1, "th-A", "completed", 7, "Bash", "x.py", datetime(2026, 3, 1, 9, 2, 0), datetime(2026, 3, 1, 9, 0, 0), datetime(2026, 3, 1, 9, 2, 0)),
    ]
    df = spark.createDataFrame(rows, STATUS_EVENTS.spark_schema())
    return lifecycle_batch(df)


@register(
    "state_incident",
    sql=None,
    doc="Q7: stalled-consumer incidents + retry cap from event-time gaps",
)
def state_incident(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = lifecycle_batch(STATUS_EVENTS.spark_df(spark))
    return out.filter(F.col("kind").isin("stalled", "killed", "suppressed_regression"))
