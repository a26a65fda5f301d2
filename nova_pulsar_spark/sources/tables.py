"""Parquet catalog over the driver's test tables.

The driver's testdata (TESTDATA.md) is one parquet file per table at
``{sf_dir}/{name}.parquet``. Reads are plain ``spark.read.parquet``
so Catalyst gets full pushdown/pruning; at cluster scale the same
loader points at a partitioned directory tree instead of one file and
nothing else changes (partition pruning then composes with the same
predicates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# driver uses; used by operators to hint broadcast joins explicitly.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """Confs the engine relies on, set at runtime so they hold even on a
    session we did not build (the driver provides its own SparkSession).

    - ``nanosAsLong``: events.ts is parquet TIMESTAMP(NANOS), which
      Spark otherwise refuses to read (PARQUET_TYPE_ILLEGAL);
    - UTC session timezone: DuckDB-oracle timestamp parity.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Naive parquet timestamp[us] (current testdata encoding) must land
    # as session-TZ TIMESTAMP, not TIMESTAMP_NTZ, directly AT THE SCAN:
    # the post-scan cast fallback below would break min/max row-group
    # skipping and predicate pushdown on every date column.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # If the session still has the stock 200 shuffle partitions, right-
    # size to local parallelism (AQE coalesces anyway; this cuts task-
    # scheduling overhead on small/medium inputs). An explicit non-
    # default setting is respected.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        from nova_pulsar_spark.session import default_parallelism

        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # Older driver testdata: parquet TIMESTAMP(NANOS); with
            # spark.sql.legacy.parquet.nanosAsLong it arrives as a long
            # of nanos. The data is micro-precision, so `div 1000` is
            # lossless and matches DuckDB's ns→us read of the column.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Naive parquet timestamp[us] columns arrive as TIMESTAMP_NTZ in
    # Spark 4. Normalize to session-TZ TIMESTAMP (session is pinned to
    # UTC above) so wall-clock values are bit-identical to DuckDB's
    # naive read and to the engine's historical column types.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def timestamped(df: DataFrame, *extra_nonnull: str) -> DataFrame:
    """The timestamped-rows contract (round 6, centralized in round 7):
    every operator that ORDERS or WINDOWS by ``ts`` must consume rows
    through this helper. Spark and DuckDB place NULL timestamps at
    opposite ends of a sort (NULLS FIRST vs NULLS LAST defaults), and
    Spark's ``window()``/``session_window()`` silently DROP NULL
    event-times — so time-ordered semantics are only well-defined over
    ``ts IS NOT NULL`` rows, which is also exactly what Spark
    Structured Streaming enforces on an event-time column. The DuckDB
    twin must carry the same ``ts IS NOT NULL`` predicate (the edge
    fixture's NULL-ts rows pin the class; ``tests/test_plan_lint.py``
    bans inline re-implementations so a future operator cannot forget).

    ``extra_nonnull`` appends further NOT NULL requirements (e.g. the
    measure column of a value series) into the same scan predicate.
    """
    cond = F.col("ts").isNotNull()
    for c in extra_nonnull:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def finite_measures(df: DataFrame, *cols: str, keep_nulls: bool = True) -> DataFrame:
    """The finite-measures contract (round 7, sibling of
    ``timestamped``): every operator that feeds a measure column into
    an EXACT accumulator (the decimal/fixed-point idiom, histogram
    bucketing, cents-casting windows) consumes rows through this
    helper. Non-finite doubles make those accumulators undefined —
    DuckDB refuses ``CAST(nan AS BIGINT/DECIMAL)`` outright and Spark's
    ANSI casts overflow on ±Inf — so before this contract a single NaN
    row crashed 24 registered queries LOUDLY (the round-7 NaN-probe
    sweep; zero silent divergences, but a 100 TB corpus will contain
    one eventually). Non-finite rows are EXCLUDED on both engines (the
    DuckDB twin carries ``isfinite(col)``); they are not lost — they
    are exactly what ``dq_profile``/``dq_constraints`` surface, the
    same story as NULL-ts rows. ``keep_nulls=True`` (default)
    preserves NULL-measure rows so aggregates keep their identical
    both-engine NULL-skip semantics; ops that already require the
    measure non-NULL pass ``keep_nulls=False``. The edge fixture
    carries NaN/+Inf/-Inf value rows pinning the class."""
    cond = F.lit(True)
    for c in cols:
        fin = ~F.isnan(F.col(c)) & (F.abs(F.col(c)) != float("inf"))
        cond = cond & (
            (F.col(c).isNull() | fin) if keep_nulls else (F.col(c).isNotNull() & fin)
        )
    return df.filter(cond)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for the SQL-first paths)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
