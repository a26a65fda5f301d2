"""Change-data-capture shapes: change compression and SCD2 intervals.

The events table is treated as a change stream keyed by ``user_id``
and ordered by ``(ts, event_id)`` — the shape of any CDC feed
(Debezium-style row images, table snapshots diffs, metric updates).
Two batch operators here; the incremental counterpart is the
``ParquetMergeSink`` foreachBatch MERGE in streaming/sinks.py.

Scale notes (the 100 TB story): both operators are ONE shuffle on the
change key with window functions inside the partition — the same plan
at any scale, since a key's history lands in one task. Skewed keys
(one entity with millions of updates) would sessionize the window by
time range first; the fixture has no such key, but the note is the
production mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table, timestamped


def change_compress(changes: DataFrame) -> DataFrame:
    """Drop consecutive updates whose ``value`` did not change."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select("user_id", "event_id", "ts", "value", F.lag("value").over(w).alias("prev_value"))
        .filter(~F.col("value").eqNullSafe(F.col("prev_value")))
        .select("user_id", "event_id", "ts", "value")
    )


@register(
    "cdc_change_compress",
    sql="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM events WHERE ts IS NOT NULL)
    SELECT user_id, event_id, ts, value
    FROM seq WHERE value IS DISTINCT FROM prev_value
    """,
    doc="CDC change compression: drop consecutive per-key updates with an "
    "unchanged value (one shuffle on the change key, LAG inside the partition)",
)
def cdc_change_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change compression is the first stage of any CDC pipeline: a
    source that re-emits full row images on every touch (or a
    snapshot-diff job that re-reads unchanged rows) multiplies
    downstream cost for nothing; dropping no-op updates is a LAG
    against the previous image per key. One shuffle on ``user_id``,
    null-safe comparison (`eqNullSafe` / `IS DISTINCT FROM`) so NULL
    transitions are kept.
    """
    # timestamped-rows contract: a change stream is time-ordered;
    # NULL ts rows are excluded on both engines
    return change_compress(
        timestamped(load_table(spark, sf_dir, "events"))
    )


@register(
    "cdc_scd2_intervals",
    sql="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM events WHERE ts IS NOT NULL),
    changes AS (
      SELECT user_id, event_id, ts, value FROM seq
      WHERE value IS DISTINCT FROM prev_value)
    SELECT user_id, event_id, value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM changes
    """,
    doc="SCD type-2 validity intervals from a change stream: each compressed "
    "change holds [valid_from, valid_to) with NULL/current for the latest image",
)
def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from the compressed change
    stream: every surviving change opens an interval closed by the
    next change's timestamp (LEAD); the open interval is the current
    image. Composes with :func:`change_compress` in one window stage —
    Catalyst reuses the single ``user_id`` shuffle for both the LAG
    compression and the LEAD interval close, so the whole SCD2 build
    is one exchange. At 100 TB the output is the dimension table a
    MERGE sink (streaming/sinks.py ParquetMergeSink) maintains
    incrementally.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = change_compress(
        timestamped(load_table(spark, sf_dir, "events"))
    )
    return changes.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# --- Snapshot diff (table versioning / replication validation) ------------

# Synthetic "old" and "new" snapshots carved deterministically out of
# orders: old is missing keys ≡0 (mod 97) (appear as added), new is
# missing keys ≡0 (mod 89) (appear as removed), and keys ≡0 (mod 7)
# changed price in the new snapshot.
DIFF_OLD_MOD = 97
DIFF_NEW_MOD = 89
DIFF_CHG_MOD = 7


@register(
    "cdc_snapshot_diff",
    sql=f"""
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % {DIFF_OLD_MOD} <> 0),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % {DIFF_CHG_MOD} = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % {DIFF_NEW_MOD} <> 0)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           o.o_totalprice AS old_price,
           n.o_totalprice AS new_price
    FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
    doc="Snapshot diff: full-outer join two table versions on the key, emit "
    "added/removed/changed rows only — the replication-validation / "
    "time-travel-diff primitive (one co-partitioned shuffle)",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-version diff as ONE co-partitioned full-outer join: both
    snapshots shuffle on the primary key (identical partitioning, so
    AQE plans a single exchange per side and a local merge), and only
    difference rows survive — the output is |changes|-sized, not
    |table|-sized. At 100 TB the cheap pre-filter is dq_checksum per
    partition: compare order-independent partition checksums first and
    full-outer-join ONLY the partitions whose checksums differ (the
    merkle-descent pattern); wide rows compare one canonical row hash
    instead of column-by-column. This operator is the drill-down stage
    of that pipeline."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % DIFF_OLD_MOD != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % DIFF_NEW_MOD != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % DIFF_CHG_MOD == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("n.o_orderkey") == F.col("o.o_orderkey"), "full_outer"
    )
    return j.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        F.col("o.o_totalprice").alias("old_price"),
        F.col("n.o_totalprice").alias("new_price"),
    )
