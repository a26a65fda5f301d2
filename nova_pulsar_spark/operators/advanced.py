"""Advanced relational surface: as-of joins, subquery family, exact
medians, skew-salted aggregation, interval range frames, Pandas-UDF
parity.

These extend SURVEY.md §2 beyond the reference's own operators to the
full surface a Spark analytics user expects (§2.3 notes the engine
exposes the complete join family; §2.6 the full frame surface). Each
has a DuckDB oracle twin unless inherently approximate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import finite_measures, load_table, timestamped

# Inline checkpoint series for the as-of join (five aligned marks).
CHECKPOINTS = [
    ("2024-01-05 00:00:00", "cp1"),
    ("2024-01-12 00:00:00", "cp2"),
    ("2024-01-19 00:00:00", "cp3"),
    ("2024-01-26 00:00:00", "cp4"),
    ("2024-02-02 00:00:00", "cp5"),
]
_CP_VALUES = ", ".join(f"(TIMESTAMP '{t}', '{n}')" for t, n in CHECKPOINTS)


@register(
    "join_asof",
    sql=f"""
    WITH checkpoints AS (SELECT * FROM (VALUES {_CP_VALUES}) AS t(cts, cname))
    SELECT e.event_id, e.ts, c.cname AS checkpoint, c.cts AS checkpoint_ts
    FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
    ASOF LEFT JOIN checkpoints c ON e.ts >= c.cts
    """,
    doc="As-of join: latest checkpoint ≤ event time (broadcast+argmax small side; merge_asof per group at big-big scale)",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamped-rows contract: as-of keys must be non-NULL (pandas
    # merge_asof rejects NaT keys; engines disagree on NULL ordering)
    e = timestamped(load_table(spark, sf_dir, "events"))
    cps = spark.createDataFrame(
        [(c[0], c[1]) for c in CHECKPOINTS], "cts_s string, cname string"
    ).select(F.to_timestamp("cts_s").alias("cts"), "cname")
    # Small reference side → broadcast theta join + per-event argmax.
    # (For big-big as-of: repartition both on a shared bucket key and
    # pd.merge_asof inside applyInPandas — documented path.)
    joined = e.join(F.broadcast(cps), e.ts >= cps.cts, "left")
    return joined.groupBy("event_id", "ts").agg(
        F.max_by("cname", "cts").alias("checkpoint"),
        F.max("cts").alias("checkpoint_ts"),
    )


@register(
    "subquery_scalar",
    sql="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (
      SELECT CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*)
      FROM part)
    """,
    doc="Scalar subquery: parts above the average retail price",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    avg_price = p.agg(
        (F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("long")).cast("double") / 100 / F.count(F.lit(1))).alias("a")
    )
    return (
        p.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("a"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@register(
    "subquery_correlated",
    sql="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT CAST(SUM(CAST(ROUND(i.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*)
      FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar subquery (Catalyst decorrelates to an aggregate+join)",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).cast("double") / 100 / F.count(F.lit(1))).alias("cust_avg")
    )
    return (
        o.join(per_cust, o.o_custkey == per_cust.ck)
        .filter(F.col("o_totalprice") > 2 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "subquery_in",
    sql="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
    """,
    doc="IN-subquery (compiles to left-semi join)",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey").isin(0, 1))
    return s.join(n, s.s_nationkey == n.n_nationkey, "left_semi").select("s_suppkey", "s_name")


@register(
    "median_exact",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, value AS median_lower, n
    FROM ranked WHERE rn = (n + 1) // 2
    """,
    doc="Exact per-group median (lower-middle, engine-independent definition)",
)
def median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-middle median per group via the DISTRIBUTED rank
    (operators/ranks.py): a `PARTITION BY event_type` window would
    ship each group to one task — events has a handful of types, so
    at 100 TB that is a tens-of-TB task. grouped_rank range-partitions
    the corpus so groups span partitions; values are identical (the
    rank is the same integer) and the DuckDB ROW_NUMBER twin stays
    bit-exact."""
    from nova_pulsar_spark.operators.ranks import ranked_events_stage

    # shared materialized rank stage (VERDICT r5 #1): one store-read
    # scan instead of a per-call grouped_rank rebuild
    ranked = ranked_events_stage(spark, sf_dir)
    return ranked.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2)).select(
        "event_type", F.col("value").alias("median_lower"), "n"
    )


@register(
    "quantiles_exact",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type,
           MAX(CASE WHEN rn = (n + 3) // 4 THEN value END)     AS q25,
           MAX(CASE WHEN rn = (2 * n + 3) // 4 THEN value END) AS q50,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS q75,
           CAST(MAX(n) AS BIGINT) AS n
    FROM ranked GROUP BY event_type
    """,
    doc="Exact per-group quartiles via rank arithmetic (scalar result columns; "
    "the percentile_approx sketch is the 100 TB path, pinned in pytest)",
)
def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 (lower discrete) quantile at rank ceil(q*n) = (k*n+3)//4 —
    pure integer rank arithmetic, so both engines pick the identical row.
    Output columns are scalars (q25/q50/q75), never arrays: the driver's
    canonicalizer cannot hash list-valued cells.
    """
    from nova_pulsar_spark.operators.ranks import ranked_events_stage

    # shared materialized rank stage (VERDICT r5 #1): groups span
    # partitions in the stage build; this call is one parquet scan
    ranked = ranked_events_stage(spark, sf_dir)

    def at_rank(k: int):
        target = F.floor((F.lit(k) * F.col("n") + 3) / 4).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("value")))

    return ranked.groupBy("event_type").agg(
        at_rank(1).alias("q25"),
        at_rank(2).alias("q50"),
        at_rank(3).alias("q75"),
        F.max("n").cast("bigint").alias("n"),
    )


def quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) — the mergeable-sketch
    path a 100 TB quantile actually takes. Sketch internals are
    engine-specific, so this is NOT registered for the DuckDB oracle;
    tests/test_llm_ops.py pins it within rank tolerance of
    quantiles_exact instead.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.25, 0.5, 0.75], 10000).alias("quartiles")
    )


@register(
    "agg_salted_hot_key",
    sql="""
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
    FROM events WHERE value IS NULL OR isfinite(value)
    GROUP BY user_id
    """,
    doc="Skew-salted two-phase aggregation — provably identical to the plain groupBy (oracle = unsalted)",
)
def agg_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Phase 1 groups by (user_id, salt) spreading a hot key across
    # partitions; phase 2 merges partials. Integer partials make the
    # two-phase result bit-equal to the one-phase plan — which is
    # exactly what the oracle checks.
    # finite-measures contract: the integer partials are undefined on
    # NaN/Inf (NULL values stay — SUM skips, COUNT keeps, identically)
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    partial = (
        e.withColumn("salt", (F.col("event_id") % 8).cast("int"))
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("pc"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n"),
        (F.sum("pc").cast("double") / 100).alias("sum_value"),
    )


@register(
    "window_range_interval",
    sql="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
             AS sum_last_10min
    FROM events WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
    """,
    doc="RANGE frame over event time: rolling 10-minute per-user sum (the stall window as a frame)",
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamped-rows + finite-measures contracts: RANGE frames over
    # a NULL ordering key are an engine-specific special case, and the
    # cents accumulator is undefined on NaN/Inf
    e = finite_measures(timestamped(load_table(spark, sf_dir, "events")), "value")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w).cast("double") / 100).alias(
            "sum_last_10min"
        ),
    )


@register(
    "udf_pandas_score",
    sql="""
    SELECT doc_id,
           CAST((doc_id * 2654435761 % 1000003) AS BIGINT) AS doc_hash,
           CAST(n_chars * 2 + (doc_id % 7) AS BIGINT) AS synth_score
    FROM documents
    """,
    doc="Vectorized Pandas UDF with integer-exact oracle parity (Arrow batch path)",
)
def udf_pandas_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately integer-only arithmetic: the Arrow/pandas path then
    # produces bit-identical results to the SQL twin — demonstrating
    # the UDF surface without sacrificing the correctness gate.
    @F.pandas_udf("long")
    def doc_hash(s: pd.Series) -> pd.Series:
        return (s * 2654435761) % 1000003

    @F.pandas_udf("long")
    def synth_score(n_chars: pd.Series, doc_id: pd.Series) -> pd.Series:
        return n_chars * 2 + (doc_id % 7)

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        doc_hash(F.col("doc_id")).alias("doc_hash"),
        synth_score(F.col("n_chars"), F.col("doc_id")).alias("synth_score"),
    )


ASOF_TOLERANCE_H = 96  # as-of match window (hours)


@register(
    "join_asof_tolerance",
    sql=f"""
    WITH checkpoints AS (SELECT * FROM (VALUES {_CP_VALUES}) AS t(cts, cname))
    SELECT e.event_id, e.ts,
           CASE WHEN date_diff('second', c.cts, e.ts) <= {ASOF_TOLERANCE_H} * 3600
                THEN c.cname END AS checkpoint,
           CASE WHEN date_diff('second', c.cts, e.ts) <= {ASOF_TOLERANCE_H} * 3600
                THEN c.cts END AS checkpoint_ts
    FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
    ASOF LEFT JOIN checkpoints c ON e.ts >= c.cts
    """,
    doc=f"As-of join with tolerance: latest checkpoint <= event time, but only "
    f"within {ASOF_TOLERANCE_H} h — stale matches become NULL (pandas "
    "merge_asof(tolerance=...) semantics)",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of: the backward match is discarded when
    older than the tolerance window — the semantics sensor/trade
    pipelines need (a quote from last week must not price today's
    trade). Same broadcast + per-event argmax shape as `join_asof`;
    the tolerance is a post-argmax projection, not a join-condition
    change, so the match choice is identical and only its validity
    flips — matching merge_asof's definition exactly. Timestamped-rows
    contract: as-of keys must be non-NULL."""
    e = timestamped(load_table(spark, sf_dir, "events"))
    cps = spark.createDataFrame(
        [(c[0], c[1]) for c in CHECKPOINTS], "cts_s string, cname string"
    ).select(F.to_timestamp("cts_s").alias("cts"), "cname")
    joined = e.join(F.broadcast(cps), e.ts >= cps.cts, "left")
    best = joined.groupBy("event_id", "ts").agg(
        F.max_by("cname", "cts").alias("cp_raw"),
        F.max("cts").alias("cts_raw"),
    )
    fresh = (
        F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("cts_raw"))
        <= ASOF_TOLERANCE_H * 3600
    )
    return best.select(
        "event_id",
        "ts",
        F.when(fresh, F.col("cp_raw")).alias("checkpoint"),
        F.when(fresh, F.col("cts_raw")).alias("checkpoint_ts"),
    )


@register(
    "join_asof_nearest",
    sql=f"""
    WITH checkpoints AS (SELECT * FROM (VALUES {_CP_VALUES}) AS t(cts, cname)),
    scored AS (
      SELECT e.event_id, e.ts, c.cname, c.cts,
             ABS(date_diff('second', c.cts, e.ts)) AS dist,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY ABS(date_diff('second', c.cts, e.ts)), c.cts) AS rnk
      FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
      CROSS JOIN checkpoints c)
    SELECT event_id, ts, cname AS checkpoint, cts AS checkpoint_ts,
           CAST(dist AS BIGINT) AS dist_seconds
    FROM scored WHERE rnk = 1
    """,
    doc="Nearest-match as-of join: closest checkpoint in EITHER direction "
    "(|time delta| argmin, earlier wins ties) — merge_asof direction='nearest'",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third as-of flavor: argmin of |event − checkpoint| over the
    broadcast reference side, ties to the earlier checkpoint. Same
    cost shape as the backward as-of (broadcast + per-event argmin —
    the corpus never shuffles); at big-big scale the same bucketed
    merge_asof path applies. min_by on a (dist, cts, name) struct
    gives the argmin + tiebreak in ONE aggregate, no window.
    Timestamped-rows contract: as-of keys must be non-NULL."""
    e = timestamped(load_table(spark, sf_dir, "events"))
    cps = spark.createDataFrame(
        [(c[0], c[1]) for c in CHECKPOINTS], "cts_s string, cname string"
    ).select(F.to_timestamp("cts_s").alias("cts"), "cname")
    dist = F.abs(F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("cts")))
    scored = e.crossJoin(F.broadcast(cps)).select(
        "event_id", "ts", "cname", "cts", dist.alias("dist")
    )
    best = F.min_by(F.struct("cname", "cts", "dist"), F.struct("dist", "cts"))
    return (
        scored.groupBy("event_id", "ts")
        .agg(best.alias("b"))
        .select(
            "event_id",
            "ts",
            F.col("b.cname").alias("checkpoint"),
            F.col("b.cts").alias("checkpoint_ts"),
            F.col("b.dist").cast("bigint").alias("dist_seconds"),
        )
    )
