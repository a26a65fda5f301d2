"""Aggregation surface: grouped/conditional/distinct aggs, rollup/cube/
grouping sets, exact moments, approximate distinct.

Reference parity: the reference's aggregations are counts and rollups
over small JSON sets — queued-plan counts
(`scripts/starry-daemon.sh:106-115`), conditional state counts
(`hooks/session-start.sh:86-88`), the pulse nested rollup
(`agents/orbiter.md:198-242`), progress percentages
(`commands/pulsar-status.md:81-87`). Queue-domain renditions live in
:mod:`nova_pulsar_spark.plans.queue_queries`; this module ships the
general aggregation family (SURVEY.md §2.4 extensions) on the
analytic tables.

Scale notes: all aggregates here are hash aggregates with map-side
partial aggregation — the shuffle carries #partitions × #groups
partial rows, not the input. Exact variance is computed from
decimal-exact sum/sumsq (associative, order-insensitive) rather than
streaming moments, so results are reproducible across any partition
count — the property the oracle hash needs, and the property that
makes re-runs at 1000 executors byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import fan_out, finite_measures, load_table


@register(
    "agg_conditional",
    sql="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      CAST(SUM(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
      CAST(100.0 AS DOUBLE)
        * CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
        / COUNT(*) AS pct_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Conditional counts + percent (reference A2/A4 progress shape)",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n_finished = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        n_finished.alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 300000.0, 1).otherwise(0)).alias("n_large"),
        (F.lit(100.0) * n_finished / F.count(F.lit(1))).cast("double").alias("pct_finished"),
    )


@register(
    "agg_distinct",
    sql="""
    SELECT
      l_returnflag,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      COUNT(DISTINCT l_partkey)  AS n_parts,
      COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Distinct aggregation (expand+two-phase in Spark)",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "agg_rollup",
    sql="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical rollup (subtotals + grand total)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    sql="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS sum_price,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Full cube over two dimensions",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nova_pulsar_spark.functions.exact import sum_cents

    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        sum_cents(F.col("l_extendedprice"), 100).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    sql="""
    SELECT
      o_orderstatus, o_orderpriority,
      GROUPING(o_orderstatus) AS g_status,
      GROUPING(o_orderpriority) AS g_prio,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit grouping sets with GROUPING() indicators",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("np_orders_gs")
    return spark.sql(
        """
        SELECT
          o_orderstatus, o_orderpriority,
          CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
          CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM np_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_stats_exact",
    sql="""
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(MIN(value) AS DOUBLE) AS min_v,
      CAST(MAX(value) AS DOUBLE) AS max_v,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_v,
      (CAST(SUM(CAST(value * value AS DECIMAL(24,4))) AS DOUBLE)
        - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
          * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        / NULLIF(COUNT(*) - 1, 0) AS var_v
    FROM events WHERE value IS NULL OR isfinite(value)
    GROUP BY event_type
    """,
    doc="Exact moments from decimal sums (order-insensitive variance)",
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # finite-measures contract: decimal moment sums are undefined on
    # NaN/Inf (NULL values stay — SUM skips, COUNT keeps, identically)
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    dec_sumsq = F.sum((F.col("value") * F.col("value")).cast("decimal(24,4)")).cast("double")
    n = F.count(F.lit(1))
    return e.groupBy("event_type").agg(
        n.alias("n"),
        F.min("value").cast("double").alias("min_v"),
        F.max("value").cast("double").alias("max_v"),
        dec_sum.alias("sum_v"),
        (dec_sum / n).alias("mean_v"),
        # sample variance is undefined for n = 1 -> NULL on both
        # engines (ANSI Spark raises on the 0-div otherwise)
        F.when(n > 1, (dec_sumsq - dec_sum * dec_sum / n) / (n - F.lit(1))).alias("var_v"),
    )


@register(
    "agg_minmax_by",
    sql="""
    SELECT
      o_orderpriority,
      MIN(o_orderdate) AS first_order,
      MAX(o_orderdate) AS last_order,
      (MAX({'p': o_totalprice, 'k': o_orderkey})).k AS top_orderkey
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="min/max timestamps + argmax (max_by)",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        # max_by/ARG_MAX pick an ARBITRARY winner on tied prices — the
        # struct max pins the tie-break to the largest orderkey on
        # both engines (edge-case fuzz finding).
        F.max(F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")))
        .getField("k")
        .alias("top_orderkey"),
    )


@register(
    "agg_distinct_two_phase",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Manual two-phase distinct (dedup-then-count) — the skew-robust rewrite "
    "of COUNT(DISTINCT); HLL sketch variant pinned in pytest",
)
def agg_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1 dedupes (flag, key) pairs — map-side combinable, so the
    shuffle carries distinct pairs, not input rows; phase 2 counts per
    flag. Unlike countDistinct's single expand+aggregate, each distinct
    column dedupes independently — on skewed keys this halves shuffle
    volume and avoids the expand blowup. Result is provably identical
    to COUNT(DISTINCT), which is exactly what the oracle checks.
    """
    l = load_table(spark, sf_dir, "lineitem")
    orders = (
        l.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_orders"))
    )
    parts = (
        l.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_parts"))
    )
    return orders.join(parts, "l_returnflag")


def agg_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group — the mergeable-
    sketch path for 100 TB distincts. HLL internals are engine-specific
    so there is no DuckDB oracle; tests/test_llm_ops.py pins the
    estimate within rsd bounds of the exact counts instead.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@register(
    "agg_collect_sorted",
    sql="""
    SELECT
      n_regionkey,
      STRING_AGG(n_name, '|' ORDER BY n_name) AS nations,
      COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
    doc="collect_list into a deterministic sorted array (pulse-rollup A3 shape)",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    # sort_array makes collect_list deterministic under any partitioning —
    # the same trick the pulse rollup uses for nested phase arrays. The final
    # projection serializes the array with concat_ws: the driver's value
    # hasher canonicalizes via pandas sort_values, which cannot hash lists —
    # result columns must be scalar (array semantics stay pinned in pytest).
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_pivot",
    sql="""
    SELECT
      l_returnflag,
      CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
      CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot status → columns",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "agg_corr_exact",
    sql="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           ((n * sxy) - (sx * sy))
             / NULLIF(sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy)), 0) AS corr_qty_price
    FROM s
    """,
    doc="Exact Pearson correlation (quantity vs price) from decimal-exact "
    "moment sums — order-insensitive, byte-stable across partitionings",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`F.corr` streams double moments whose value depends on partition
    order — useless for cross-engine (or cross-run) parity. This
    rendition accumulates the five moment sums EXACTLY (integer cents
    in DECIMAL(38,0) accumulators — no overflow at any realistic
    scale, unlike bigint for Σy² at petabyte row counts) and converts
    once at the end; the closed-form corr is then a fixed IEEE
    expression tree over identical inputs on every engine. Still one
    map-side-combined hash aggregate — exactness costs nothing in
    shuffle shape.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # BIGINT row values/products (quantity and cents are integral and
    # their squares stay ~1e14, far inside long range); DECIMAL(38,0)
    # only at the accumulator — same discipline as agg_cov_matrix,
    # ~2x cheaper per row than decimal multiplies.
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(38,0)")).cast("double").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    den = F.sqrt((F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))) * F.sqrt(
        (F.col("n") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    )
    # Degenerate groups (one row / constant measure) have zero
    # variance: corr is undefined -> NULL on both engines. Without the
    # guard Spark's ANSI mode RAISES on the 0/0 while DuckDB emits
    # NaN — an engine divergence AND a job-killer on real data
    # (found by tools/make_edgecase_sf.py fuzzing).
    corr = F.when(den != 0, num / den)
    return s.select("l_returnflag", corr.alias("corr_qty_price"))


@register(
    "agg_mode_deterministic",
    sql="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT user_id, event_type, cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM c)
    SELECT user_id, event_type AS mode_event_type, CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
    doc="Deterministic mode (most frequent value per key, ties broken by "
    "value order) — built-in mode() is tie-nondeterministic across engines",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`F.mode`/DuckDB `mode()` pick an arbitrary winner on tied counts
    — fine interactively, fatal for reproducible pipelines. The
    count + rank rendition pins the tie-break (count desc, value asc):
    two shuffles on (key, value) then (key), both with map-side
    combine, and the rank window partitions by key — no global sort.
    """
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    # asc_nulls_last on the tie-break value: DuckDB's ASC default — a
    # NULL event_type must lose ties identically on both engines
    w = W.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type").asc_nulls_last())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("cnt").cast("bigint").alias("mode_count"),
        )
    )


# Stable bit position per event type (alphabetical).
_EVENT_BITS = {"click": 0, "error": 1, "purchase": 2, "signup": 3, "view": 4}
_BIT_CASE_SQL = "CASE event_type " + " ".join(
    f"WHEN '{k}' THEN {1 << v}" for k, v in sorted(_EVENT_BITS.items())
) + " ELSE 0 END"


@register(
    "agg_bitmap_flags",
    sql=f"""
    SELECT user_id,
           CAST(bit_or({_BIT_CASE_SQL}) AS BIGINT) AS seen_mask,
           CAST(bit_count(CAST(bit_or({_BIT_CASE_SQL}) AS BIGINT)) AS BIGINT)
             AS n_event_types,
           CAST(bit_or({_BIT_CASE_SQL}) AS BIGINT) & 4 = 4 AS has_purchased
    FROM events GROUP BY user_id
    """,
    doc="Bitmap set aggregation: per-user seen-event-type bitmask via bit_or "
    "— the compact set-membership rollup (one long per key, not a collect_set)",
)
def agg_bitmap_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership profiles as bitmaps: `bit_or` of per-row flag
    bits gives 'which event types has this user produced' in ONE long
    per key — associative, map-side combinable, and 64× denser than
    `collect_set`. The same pattern backs feature flags, segment
    membership, and bitmap indexes at 100 TB (billions of keys × one
    long, vs arrays of strings).
    """
    e = load_table(spark, sf_dir, "events")
    flag = F.when(F.col("event_type") == "click", 1)
    for k, v in _EVENT_BITS.items():
        if k != "click":
            flag = flag.when(F.col("event_type") == k, 1 << v)
    flag = flag.otherwise(0)
    mask = F.bit_or(flag).cast("bigint")
    return e.groupBy("user_id").agg(
        mask.alias("seen_mask"),
        F.bit_count(mask).cast("bigint").alias("n_event_types"),
        (mask.bitwiseAND(F.lit(4)) == 4).alias("has_purchased"),
    )


HIST_BINS = 10


@register(
    "agg_histogram_fixed",
    sql=f"""
    WITH e AS (
      SELECT * FROM events WHERE value IS NULL OR isfinite(value)),
    b AS (
      SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM e),
    binned AS (
      SELECT LEAST(CAST(FLOOR(COALESCE((value - b.vmin) * {HIST_BINS}
                                       / NULLIF(b.vmax - b.vmin, 0), 0))
                        AS BIGINT), {HIST_BINS - 1}) AS bin,
             b.vmin + (b.vmax - b.vmin) / {HIST_BINS}
               * LEAST(CAST(FLOOR(COALESCE((value - b.vmin) * {HIST_BINS}
                                           / NULLIF(b.vmax - b.vmin, 0), 0))
                            AS BIGINT), {HIST_BINS - 1}) AS bin_lo
      FROM e, b)
    SELECT bin, bin_lo, CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY bin, bin_lo
    """,
    doc=f"Fixed-width {HIST_BINS}-bin value histogram from global min/max — "
    "the data-profiling distribution sketch (two scans, no sort)",
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: one tiny min/max aggregate (broadcast as a
    scalar frame), then binning is a row-local projection and the
    counts shuffle only `HIST_BINS` groups. The float bin arithmetic
    is the same parse tree on both engines, so bin edges are
    bit-identical — no sort, no percentile pass, scales as two scans.
    Finite-measures contract: a single NaN/Inf row would poison the
    global min/max and every bin edge; excluded on both engines (NULL
    values stay — they land in bin 0 via the COALESCE guard).
    """
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    b = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    # Degenerate-range guard (constant column): NULLIF + COALESCE put
    # every row in bin 0 identically on both engines, instead of
    # Spark's non-ANSI NULL vs DuckDB's IEEE inf/FLOOR error.
    raw_bin = F.floor(
        F.coalesce(
            (F.col("value") - F.col("vmin"))
            * HIST_BINS
            / F.expr("nullif(vmax - vmin, 0)"),
            F.lit(0),
        )
    ).cast("bigint")
    bin_ = F.least(raw_bin, F.lit(HIST_BINS - 1))
    return (
        e.crossJoin(F.broadcast(b))
        .select(
            bin_.alias("bin"),
            (
                F.col("vmin")
                + (F.col("vmax") - F.col("vmin")) / HIST_BINS * bin_
            ).alias("bin_lo"),
        )
        .groupBy("bin", "bin_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


SKEW_TOP_N = 10


@register(
    "diag_key_skew",
    sql=f"""
    WITH c AS (
      SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey),
    m AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS mean_cnt FROM c)
    SELECT c.key, CAST(c.cnt AS BIGINT) AS cnt,
           CAST(c.cnt AS DOUBLE) / m.mean_cnt AS ratio_to_mean
    FROM c, m
    ORDER BY c.cnt DESC, c.key LIMIT {SKEW_TOP_N}
    """,
    doc="Hot-key skew diagnostic: top-N heaviest join/agg keys with their "
    "ratio to the mean key weight — the report that decides salting/AQE-skew "
    "settings BEFORE a 100 TB shuffle, not after it spills",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-weight profiling as two tiny aggregates: per-key counts (one
    map-side-combined shuffle on the key), then the scalar mean crossed
    back in (broadcast, 1 row). `ratio_to_mean` >> 1 on the top keys is
    the signal that a plain hash shuffle will stragger — the input to
    choosing a salt factor or trusting AQE skew-join splitting."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    m = c.agg((F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("mean_cnt"))
    return (
        c.crossJoin(F.broadcast(m))
        .select(
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            (F.col("cnt").cast("double") / F.col("mean_cnt")).alias("ratio_to_mean"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(SKEW_TOP_N)
    )


EQUIDEPTH_BUCKETS = 10


@register(
    "agg_histogram_equidepth",
    sql=f"""
    WITH b AS (
      SELECT value, NTILE({EQUIDEPTH_BUCKETS}) OVER (ORDER BY value, event_id) AS bucket
      FROM events)
    SELECT bucket, MIN(value) AS lo, MAX(value) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
    doc=f"Equi-depth histogram ({EQUIDEPTH_BUCKETS} equal-count buckets via "
    "NTILE over a total order) — the quantile-boundary profile optimizers "
    "and range-partitioners actually want (fixed-width lies under skew)",
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count buckets need every row's GLOBAL rank under the
    (value, event_id) total order — but a bare NTILE window with no
    PARTITION BY moves the whole corpus to one task (WindowExec warns
    exactly this; the r5 window audit caught it here). The
    distributed-exact formulation: ``repartitionByRange`` lays rows
    out in contiguous key ranges with ascending partition ids, a
    per-partition window (partitioned by ``spark_partition_id`` — N
    independent window groups, never one) computes local ranks, and a
    P-row broadcast of cumulative partition counts lifts them to
    global ranks. The rank — hence the output — is INVARIANT to where
    the sampled range boundaries fall: any contiguous split yields
    offset + local_rank = global rank, and equal keys cannot straddle
    a boundary (event_id makes the order total), so the sampling
    inside RangePartitioner never leaks into values. Bucket ids then
    come from the NTILE arithmetic on the rank (first n%B buckets get
    one extra row), reproducing DuckDB's NTILE bit-exactly. Bucket
    boundaries from this profile are what a range partitioner or a
    bucketed layout writer consumes."""
    from nova_pulsar_spark.operators.ranks import grouped_rank

    e = load_table(spark, sf_dir, "events").select("value", "event_id")
    # asc_nulls_last: DuckDB's ASC default — with NULL values present
    # the engines' default NULL placement diverges (edge fixture)
    ranked = grouped_rank(
        e, [], [F.col("value").asc_nulls_last(), F.col("event_id")],
        spark.sparkContext.defaultParallelism,
        count_col="n_total",
    )
    # NTILE arithmetic on the global rank, all-integer (div, not IEEE
    # division — exact at any corpus size)
    from nova_pulsar_spark.operators.ranks import ntile_expr

    return (
        ranked.select(
            "value", ntile_expr("rn", "n_total", EQUIDEPTH_BUCKETS).cast("int").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
             F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "agg_weighted_avg_exact",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 100 / SUM(CAST(l_quantity AS BIGINT)) AS wavg_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_weight
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Quantity-weighted average price with exact integer accumulation "
    "(cents x quantity in BIGINT; one double division at the end) — "
    "order-insensitive, cross-engine bit-exact",
)
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean done exactly: Σ(price_cents·qty) and Σqty
    accumulate as integers (associative, partition-order-insensitive,
    map-side combinable), and the ONLY floating-point op is the final
    division — one IEEE tree over identical inputs on both engines.
    The naive Σ(price·qty)/Σqty over doubles drifts with shuffle
    order; this shape never does, at identical shuffle cost."""
    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qty = F.col("l_quantity").cast("long")
    return l.groupBy("l_returnflag").agg(
        (F.sum(cents * qty).cast("double") / 100 / F.sum(qty)).alias("wavg_price"),
        F.sum(qty).cast("bigint").alias("total_weight"),
    )


MAD_SIGMA = 3  # flag rows deviating more than 3 MADs from the median


@register(
    "agg_mad_outliers",
    sql=f"""
    WITH ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    med AS (SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT e.event_type, e.event_id, m.med, ABS(e.value - m.med) AS dev
      FROM events e JOIN med m USING (event_type)),
    ranked2 AS (
      SELECT event_type, dev, med,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev),
    mad AS (SELECT event_type, dev AS mad FROM ranked2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type, MIN(d.med) AS med, MIN(a.mad) AS mad,
           CAST(SUM(CASE WHEN d.dev > {MAD_SIGMA} * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    """,
    doc=f"Robust outlier profile per group: exact median + exact MAD (lower-"
    f"middle ranks), count of rows beyond {MAD_SIGMA} MADs — the robust "
    "alternative to z-scores that one corrupt batch cannot drag",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier counts: mean/stddev outlier
    rules break down exactly when needed (the outliers inflate sigma);
    MAD's 50% breakdown point doesn't. Both medians use the engine-
    independent lower-middle rank definition (median_exact's idiom) so
    the flag boundary is bit-identical across engines. Plan shape: two
    DISTRIBUTED rank passes (operators/ranks.py — range-partitioned,
    so a heavy group spans tasks instead of owning one), the
    per-group scalars broadcast back, and a final map-combinable
    count — no global sort, no per-group task ceiling."""
    from nova_pulsar_spark.operators.ranks import grouped_rank, ranked_events_stage

    width = spark.sparkContext.defaultParallelism
    e = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    # pass 1 rides the shared materialized rank stage (VERDICT r5 #1);
    # pass 2 (dev ranks) is consumer-specific and stays a grouped_rank
    # — the heavy-group window ceiling stays gone in both
    med = (
        ranked_events_stage(spark, sf_dir)
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = (
        grouped_rank(
            dev.select("event_type", "dev", "event_id"),
            ["event_type"],
            [F.col("dev").asc_nulls_last(), F.col("event_id")],
            width,
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("dev").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("dev") > MAD_SIGMA * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# Exact covariance matrix: integer-scaled measures -> decimal moment
# sums -> one closed-form division. Scales make every value integral.
_COV_MEASURES = (
    ("quantity", "l_quantity", 1),
    ("price", "l_extendedprice", 100),
    ("discount", "l_discount", 1000),
    ("tax", "l_tax", 1000),
)
_COV_PAIRS = [
    (_COV_MEASURES[i], _COV_MEASURES[j])
    for i in range(len(_COV_MEASURES))
    for j in range(i, len(_COV_MEASURES))
]


def _cov_matrix_sql() -> str:
    # Row-level products stay in BIGINT (max |price_cents|^2 ~ 1e14 —
    # far inside long range); only the accumulator is DECIMAL(38,0),
    # which is what protects petabyte-scale row counts. Decimal
    # multiplies per row would be ~2x slower for zero extra safety.
    terms = ", ".join(
        f"CAST(SUM(CAST(CAST(ROUND({ca} * {sa}, 0) AS BIGINT)"
        f" * CAST(ROUND({cb} * {sb}, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS s_{na}_{nb}"
        for (na, ca, sa), (nb, cb, sb) in _COV_PAIRS
    )
    sums = ", ".join(
        f"CAST(SUM(CAST(CAST(ROUND({c} * {s}, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS s_{n}"
        for n, c, s in _COV_MEASURES
    )
    rows = " UNION ALL ".join(
        f"SELECT '{na}' AS var_x, '{nb}' AS var_y, n, "
        f"((n * s_{na}_{nb}) - (s_{na} * s_{nb})) / (n * n) / {sa * sb} AS cov FROM m"
        for (na, _, sa), (nb, _, sb) in _COV_PAIRS
    )
    return (
        f"WITH m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, {sums}, {terms} FROM lineitem) "
        f"SELECT var_x, var_y, CAST(n AS BIGINT) AS n, cov FROM ({rows}) ORDER BY var_x, var_y"
    )


@register(
    "agg_cov_matrix",
    sql=_cov_matrix_sql(),
    doc="Exact population covariance matrix over the four lineitem measures "
    "(10 unique pairs incl. variances) from decimal-exact moment sums — one "
    "scan, one 1-row reduce, order-insensitive and byte-stable",
)
def agg_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same discipline as agg_corr_exact, widened to the full moment
    matrix: every measure is scaled to an integer (units/cents/mills),
    all 4 first moments and 10 second moments accumulate in
    DECIMAL(38,0) within a SINGLE map-side-combined aggregate, and the
    closed-form covariance is a fixed IEEE expression over those exact
    inputs — so the matrix is identical on any engine, partitioning,
    or row order. One scan regardless of how many measures; the
    shuffle is a single row."""
    l = load_table(spark, sf_dir, "lineitem")

    def m(col: str, scale: int):
        # BIGINT row values; DECIMAL only at the accumulator (see the
        # SQL-twin builder comment).
        return F.round(F.col(col) * scale, 0).cast("bigint")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [
        F.sum(m(c, s).cast("decimal(38,0)")).cast("double").alias(f"s_{n}")
        for n, c, s in _COV_MEASURES
    ]
    aggs += [
        F.sum((m(ca, sa) * m(cb, sb)).cast("decimal(38,0)")).cast("double").alias(f"s_{na}_{nb}")
        for (na, ca, sa), (nb, cb, sb) in _COV_PAIRS
    ]
    mm = l.agg(*aggs)
    stack_args = ", ".join(
        f"'{na}', '{nb}', ((n * s_{na}_{nb}) - (s_{na} * s_{nb})) / (n * n) / {sa * sb}"
        for (na, _, sa), (nb, _, sb) in _COV_PAIRS
    )
    return (
        mm.select(
            F.expr(
                f"stack({len(_COV_PAIRS)}, {stack_args}) AS (var_x, var_y, cov)"
            ),
            F.col("n").cast("bigint").alias("n"),
        )
        .select("var_x", "var_y", "n", "cov")
        .orderBy("var_x", "var_y")
    )


# --- Higher moments (skewness / kurtosis) from decimal-exact sums ----------


@register(
    "agg_skew_kurtosis",
    sql="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(24,4))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(value * value * value AS DECIMAL(30,3))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(value * value * value * value AS DECIMAL(38,2)) ) AS DOUBLE) AS s4
      FROM events WHERE value IS NULL OR isfinite(value) GROUP BY event_type),
    r AS (
      SELECT event_type, n,
             s1 / n AS mean_v, s2 / n AS r2, s3 / n AS r3, s4 / n AS r4
      FROM s),
    m AS (
      SELECT event_type, n, mean_v,
             r2 - mean_v * mean_v AS m2,
             r3 - 3 * mean_v * r2 + 2 * mean_v * mean_v * mean_v AS m3,
             r4 - 4 * mean_v * r3 + 6 * mean_v * mean_v * r2
                - 3 * mean_v * mean_v * mean_v * mean_v AS m4
      FROM r)
    SELECT event_type, CAST(n AS BIGINT) AS n, mean_v,
           m3 / NULLIF(m2 * SQRT(m2), 0) AS skew_g1,
           m4 / NULLIF(m2 * m2, 0) - 3 AS kurt_excess
    FROM m
    """,
    doc="Exact per-group skewness and excess kurtosis: four raw moments in "
    "ONE decimal-exact aggregate (order/partition-insensitive), closed-form "
    "central moments — the distribution-shape profile behind outlier policy",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew/kurtosis decide winsorization and transform policy, but the
    built-in skewness()/kurtosis() aggregates are float-accumulation
    order-dependent (different per partitioning AND per engine). Same
    discipline as agg_corr_exact widened to 3rd/4th moments: all four
    raw sums accumulate in DECIMAL within a single map-side-combined
    aggregate. Fractional precision is deliberately LOW (v^3 at 3dp,
    v^4 at 2dp): the decimal->double conversion of the final sum is
    only engine-identical while the scaled integer stays under 2^53
    (a DECIMAL(38,8) v^4 sum diverged in the last ulp between engines
    — measured, not theoretical), so precision is spent on integer
    headroom, not fraction digits. Central moments are then a fixed
    IEEE expression over those exact inputs — identical everywhere. Population g1 = m3/m2^1.5 and
    excess g2 = m4/m2^2 - 3; constant groups (m2 = 0) yield NULL on
    both engines via the guarded denominator. Finite-measures
    contract: NaN/Inf rows excluded on both engines (NULLs stay)."""
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    v = F.col("value")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(24,4)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(30,3)")).cast("double").alias("s3"),
        F.sum((v * v * v * v).cast("decimal(38,2)")).cast("double").alias("s4"),
    )
    r = s.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_v"),
        (F.col("s2") / F.col("n")).alias("r2"),
        (F.col("s3") / F.col("n")).alias("r3"),
        (F.col("s4") / F.col("n")).alias("r4"),
    )
    mean = F.col("mean_v")
    m = r.select(
        "event_type",
        "n",
        "mean_v",
        (F.col("r2") - mean * mean).alias("m2"),
        (F.col("r3") - F.lit(3) * mean * F.col("r2") + F.lit(2) * mean * mean * mean).alias("m3"),
        (
            F.col("r4")
            - F.lit(4) * mean * F.col("r3")
            + F.lit(6) * mean * mean * F.col("r2")
            - F.lit(3) * mean * mean * mean * mean
        ).alias("m4"),
    )
    m2 = F.col("m2")
    den1, den2 = m2 * F.sqrt(m2), m2 * m2
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "mean_v",
        F.when(den1 != 0, F.col("m3") / den1).alias("skew_g1"),
        (F.when(den2 != 0, F.col("m4") / den2) - F.lit(3)).alias("kurt_excess"),
    )


@register(
    "agg_ab_ttest",
    sql="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(24,4))) AS DOUBLE) AS s2
      FROM events WHERE value IS NOT NULL AND isfinite(value)
      GROUP BY event_type),
    st AS (
      SELECT event_type, n, s1 / n AS mu,
             GREATEST(CAST(0 AS DOUBLE), (s2 - s1 * s1 / n) / (n - 1)) AS var_s
      FROM s WHERE n >= 2),
    p AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             a.n AS n_a, b.n AS n_b, a.mu AS mean_a, b.mu AS mean_b,
             a.var_s / a.n AS se2_a, b.var_s / b.n AS se2_b
      FROM st a JOIN st b ON a.event_type < b.event_type)
    SELECT group_a, group_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           mean_a, mean_b, mean_a - mean_b AS mean_diff,
           (mean_a - mean_b) / NULLIF(SQRT(se2_a + se2_b), 0) AS t_welch,
           (se2_a + se2_b) * (se2_a + se2_b)
             / NULLIF(se2_a * se2_a / (n_a - 1) + se2_b * se2_b / (n_b - 1), 0)
             AS df_welch
    FROM p
    """,
    doc="Welch's two-sample t-test over every event-type pair: exact "
    "decimal moment sums in one scan, closed-form t and "
    "Welch-Satterthwaite df — the A/B-experiment readout primitive",
)
def agg_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A/B readout: does metric `value` differ between two event
    populations? Welch's unequal-variance t is the production default
    (never pooled-variance Student). Engine discipline is
    agg_skew_kurtosis's: per-group n / Σv / Σv² accumulate as exact
    DECIMALs in ONE map-side-combinable scan (the only corpus-sized
    pass — group count is tiny, so the pairwise self-join over group
    STATS is constant work no matter the corpus). Sample variance
    comes from the closed form (Σv² − (Σv)²/n)/(n−1), clamped at 0
    (float rounding can push a near-constant group fractionally
    negative — DuckDB SQRT raises on negatives where Spark returns
    NaN, the catalogued divergence class), and t / df are fixed IEEE
    expressions over exact inputs written in identical association
    order on both engines — bit-equal out. Zero-variance pairs yield
    NULL t via the guarded denominator rather than ±inf.
    Finite-measures contract: NaN/Inf rows excluded on both engines."""
    e = finite_measures(
        load_table(spark, sf_dir, "events"), "value", keep_nulls=False
    )
    v = F.col("value")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(24,4)")).cast("double").alias("s2"),
    )
    st = s.filter(F.col("n") >= 2).select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        F.greatest(
            F.lit(0.0),
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1),
        ).alias("var_s"),
    )
    a = st.select(
        F.col("event_type").alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("mu").alias("mean_a"),
        (F.col("var_s") / F.col("n")).alias("se2_a"),
    )
    b = st.select(
        F.col("event_type").alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("mu").alias("mean_b"),
        (F.col("var_s") / F.col("n")).alias("se2_b"),
    )
    p = a.join(b, F.col("group_a") < F.col("group_b"))
    se2 = F.col("se2_a") + F.col("se2_b")
    return p.select(
        "group_a",
        "group_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "mean_a",
        "mean_b",
        (F.col("mean_a") - F.col("mean_b")).alias("mean_diff"),
        ((F.col("mean_a") - F.col("mean_b")) / F.nullif(F.sqrt(se2), F.lit(0.0))).alias(
            "t_welch"
        ),
        (
            se2 * se2
            / F.nullif(
                F.col("se2_a") * F.col("se2_a") / (F.col("n_a") - 1)
                + F.col("se2_b") * F.col("se2_b") / (F.col("n_b") - 1),
                F.lit(0.0),
            )
        ).alias("df_welch"),
    )


@register(
    "agg_chi_square",
    sql="""
    WITH obs AS (
      SELECT event_type, user_id % 4 AS cohort, COUNT(*) AS o
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type, user_id % 4),
    rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT cohort, SUM(o) AS c FROM obs GROUP BY cohort),
    n AS (SELECT SUM(o) AS total FROM obs),
    cells AS (
      SELECT obs.o, rt.r, ct.c, n.total,
             CAST(rt.r AS DOUBLE) * ct.c / n.total AS e
      FROM obs JOIN rt USING (event_type) JOIN ct USING (cohort) CROSS JOIN n)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(total) AS BIGINT) AS n_obs,
           CAST(SUM(CAST(FLOOR((o - e) * (o - e) / e * 1073741824) AS DECIMAL(38,0)))
                AS DOUBLE) / 1073741824 AS chi2
    FROM cells
    """,
    doc="Chi-square independence test of event_type x user-cohort "
    "(user_id % 4): observed/expected from exact integer marginals, the "
    "(O-E)^2/E sum decimal-fixed so the reduction is order-independent — "
    "the categorical A/B sibling of agg_ab_ttest",
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association test — 'does event mix differ by
    cohort?' — the chi-square counterpart to agg_ab_ttest's metric
    test. Everything upstream of the final statistic is exact
    INTEGER arithmetic: observed counts and both marginals come from
    one map-side-combinable groupBy (cells = |types| x |cohorts|,
    constant-sized whatever the corpus); expected = r*c/total is one
    exact-input IEEE op per cell. The only accumulation of doubles —
    Σ (O−E)²/E — is the order-sensitive step, so each term is cast
    quantized fixed-point — floor(term * 2^30) into a DECIMAL(38,0)
    sum, one division at the end (the repo's cross-row float-sum
    idiom; a DECIMAL(38,18) cast of the raw double diverged in the
    last ulp between the engines' double->decimal conversions —
    measured here): partitioning, engine, and plan order cannot move
    the result. The two tiny marginal joins are
    broadcast-sized by construction."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    obs = e.groupBy("event_type", (F.col("user_id") % 4).alias("cohort")).agg(
        F.count(F.lit(1)).alias("o")
    )
    obs = obs.localCheckpoint(eager=False)  # three consumers
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("cohort").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("total"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "cohort")
        .crossJoin(F.broadcast(n))
        .select(
            "o",
            "total",
            (F.col("r").cast("double") * F.col("c") / F.col("total")).alias("e"),
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("total").cast("bigint").alias("n_obs"),
        (
            F.sum(F.floor(term * 1073741824).cast("decimal(38,0)")).cast("double")
            / F.lit(1073741824)
        ).alias("chi2"),
    )


@register(
    "agg_mannwhitney",
    sql="""
    WITH h AS (
      SELECT event_type AS t, value AS v, COUNT(*) AS c
      FROM events WHERE value IS NOT NULL GROUP BY event_type, value),
    tys AS (SELECT DISTINCT t FROM h),
    prs AS (
      SELECT a.t AS ta, b.t AS tb FROM tys a JOIN tys b ON a.t < b.t),
    hv AS (
      SELECT prs.ta, prs.tb, h.v,
             SUM(CASE WHEN h.t = prs.ta THEN h.c ELSE 0 END) AS ca,
             SUM(CASE WHEN h.t = prs.tb THEN h.c ELSE 0 END) AS cb
      FROM prs JOIN h ON h.t = prs.ta OR h.t = prs.tb
      GROUP BY prs.ta, prs.tb, h.v),
    r AS (
      SELECT ta, tb, v, ca, cb,
             COALESCE(SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb_lt
      FROM hv),
    agg AS (
      SELECT ta AS group_a, tb AS group_b,
             SUM(ca) AS n_a, SUM(cb) AS n_b,
             SUM(ca * (2 * cumb_lt + cb)) AS u2,
             SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS tiesum
      FROM r GROUP BY ta, tb),
    fin AS (
      SELECT group_a, group_b, n_a, n_b, u2, tiesum,
             n_a + n_b AS n,
             CAST(n_a AS DOUBLE) * n_b / 2 AS mu,
             CAST(n_a AS DOUBLE) * n_b / 12
               * ((n_a + n_b + 1)
                  - CAST(tiesum AS DOUBLE)
                    / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))) AS var_u
      FROM agg)
    SELECT group_a, group_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(u2 AS BIGINT) AS u2,
           CASE WHEN SQRT(var_u) <> 0
                THEN (CAST(u2 AS DOUBLE) / 2 - mu) / SQRT(var_u)
           END AS z
    FROM fin
    """,
    doc="Mann-Whitney U (rank-sum) test for every event-type pair, computed "
    "HISTOGRAM-wise: U from value-bucket counts + a running sum over the "
    "value spine — no per-row global ranking; tie-corrected normal z",
)
def agg_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nonparametric A/B readout (medians/distributions, robust to
    outliers where agg_ab_ttest's means are not). Textbook U needs the
    POOLED PER-ROW RANKING — a global sort per comparison, the exact
    thing to avoid at 100 TB. Equivalent count form: U = #{a > b
    pairs} + tie/2, and over the VALUE HISTOGRAM that is
    Σ_v ca(v)·(cumB(<v) + cb(v)/2) — so the corpus is touched once
    (the (type, value) groupBy); everything after runs on the
    histogram spine (distinct values per pair), with one running sum
    window per pair and integer products throughout (u2 = 2U stays
    integral through ties; magnitudes bounded by n_a·n_b, exact in
    BIGINT/HUGEINT at any realistic pairing). The tie-corrected
    normal approximation z is a fixed IEEE expression over the exact
    integers, association-identical on both engines. The type-pair
    expansion duplicates histogram rows (T−1)× — T is the group
    count, a constant — never the corpus."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    h = (
        e.select(F.col("event_type").alias("t"), F.col("value").alias("v"))
        .groupBy("t", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tys = h.select("t").distinct()
    prs = tys.select(F.col("t").alias("ta")).join(
        tys.select(F.col("t").alias("tb")), F.col("ta") < F.col("tb")
    )
    hv = (
        prs.join(h.alias("h"), (F.col("h.t") == F.col("ta")) | (F.col("h.t") == F.col("tb")))
        .groupBy("ta", "tb", "v")
        .agg(
            F.sum(F.when(F.col("h.t") == F.col("ta"), F.col("c")).otherwise(F.lit(0))).alias("ca"),
            F.sum(F.when(F.col("h.t") == F.col("tb"), F.col("c")).otherwise(F.lit(0))).alias("cb"),
        )
    )
    # distributed exclusive prefix (ranks.grouped_prefix gives the
    # INCLUSIVE running sum; subtract the current row): the histogram
    # is |distinct value| rows per type pair — corpus-sized for
    # continuous values, so the former per-pair window was a
    # heavy-group task
    from nova_pulsar_spark.operators.ranks import grouped_prefix

    r = grouped_prefix(
        hv, ["ta", "tb"], ["v"], spark.sparkContext.defaultParallelism,
        sums={"__cs": "cb"},
    ).withColumn("cumb_lt", F.coalesce(F.col("__cs") - F.col("cb"), F.lit(0)))
    t = F.col("ca") + F.col("cb")
    agg = r.groupBy(F.col("ta").alias("group_a"), F.col("tb").alias("group_b")).agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("cumb_lt") + F.col("cb"))).alias("u2"),
        F.sum(t * t * t - t).alias("tiesum"),
    )
    mu = F.col("n_a").cast("double") * F.col("n_b") / 2
    var_u = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / 12
        * (
            (F.col("n_a") + F.col("n_b") + 1)
            - F.col("tiesum").cast("double")
            / ((F.col("n_a") + F.col("n_b")).cast("double") * (F.col("n_a") + F.col("n_b") - 1))
        )
    )
    return agg.select(
        "group_a",
        "group_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("u2").cast("bigint").alias("u2"),
        F.when(
            F.sqrt(var_u) != 0, (F.col("u2").cast("double") / 2 - mu) / F.sqrt(var_u)
        ).alias("z"),
    )


# --- Poisson bootstrap confidence interval ---------------------------------

BOOT_REPS = 32
# Poisson(1) CDF thresholds (literal doubles, identical on both
# engines): weight w = k iff u in [P(<k), P(<=k)); tail capped at 5.
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
]


def _boot_w(u: str) -> str:
    """CASE ladder mapping a uniform in [0,1) to a Poisson(1) draw."""
    cases = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"(CASE {cases} ELSE 5 END)"


# One md5 per (row, BLOCK of 4 replicates): the 128-bit digest slices
# into four independent 32-bit uniforms (hex chars 1-8, 9-16, 17-24,
# 25-32), quartering the dominant hash cost. rep = block*4 + slot.
# Spark side reads the digest column computed once per (row, block) —
# u is a 32-bit integer / 2^32, exactly representable, so the two
# engines' differently-shaped hash expressions yield bit-equal u.
_U_SPARK = "(CAST(conv(substring(_dig, slot * 8 + 1, 8), 16, 10) AS BIGINT) / 4294967296.0)"
_U_SQL = (
    "(CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR) || ':' || CAST(block AS VARCHAR)),"
    " slot * 8 + 1, 8)) AS BIGINT) / 4294967296.0)"
)


@register(
    "agg_bootstrap_ci",
    sql=f"""
    WITH base AS (
      SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND isfinite(value)),
    per_rep AS (
      SELECT rep, SUM(w) AS n_r, SUM(w * cents) AS s_r FROM (
        SELECT cents, {_boot_w(_U_SQL)} AS w, bl.block * 4 + sl.slot AS rep
        FROM base
        CROSS JOIN (SELECT UNNEST(range(0, {BOOT_REPS} // 4)) AS block) bl
        CROSS JOIN (SELECT UNNEST(range(0, 4)) AS slot) sl) t
      GROUP BY rep),
    means AS (
      SELECT list_sort(list(CAST(s_r AS DOUBLE) / n_r / 100)) AS ms FROM per_rep),
    pt AS (
      SELECT COUNT(*) AS n, CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100 AS mean_v
      FROM base)
    SELECT CAST(pt.n AS BIGINT) AS n, pt.mean_v,
           CAST({BOOT_REPS} AS BIGINT) AS boot_reps,
           ms[2] AS ci_lo, ms[{BOOT_REPS - 1}] AS ci_hi
    FROM means CROSS JOIN pt
    """,
    doc=f"Poisson-bootstrap CI for the mean event value: {BOOT_REPS} "
    "hash-deterministic resamples in ONE map-side-combinable pass (weights "
    "from md5-uniforms through the Poisson(1) CDF ladder), 2nd/31st order "
    "statistics of the rep means as the interval",
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bars at 100 TB: the classical bootstrap resamples n rows
    with replacement — unshippable (each resample is a corpus-sized
    shuffle with repeats). The production form is the POISSON
    bootstrap: each row independently contributes Poisson(1) copies
    to each replicate, so all {BOOT_REPS} resamples ride ONE scan as
    a (row, rep) weight — here a deterministic weight derived from
    md5(event_id:rep) through the Poisson CDF ladder (literal
    thresholds, identical doubles both engines; the shared-md5 idiom
    keeps the 'randomness' engine-exact and reproducible, which a
    production pipeline wants anyway for auditability). The expansion
    is map-side only: partial aggregation collapses corpus x reps
    rows to {BOOT_REPS} groups before any shuffle — the shuffle
    carries {BOOT_REPS} rows of exact integer sums (cents BIGINT;
    HUGEINT/decimal-exact on each engine). The interval is the
    2nd/31st order statistics of the sorted replicate means (~94%
    coverage at R={BOOT_REPS}; production bumps R, same plan). Rep
    means are one IEEE division from exact integers; the sort is over
    identically derived doubles. Cost note: the digest is computed
    once per (row, block-of-4) and sliced into four 32-bit uniforms
    (measured ~17% off the 10x wall clock; the residual cost is the
    32x expanded CASE/conv stream itself). A deployment that only
    needs within-pipeline determinism swaps md5 for xxhash64 with
    the identical plan shape. Finite-measures contract: NaN/Inf rows
    excluded on both engines (the cents cast is undefined on them)."""
    e = finite_measures(
        load_table(spark, sf_dir, "events"), "value", keep_nulls=False
    )
    base = e.select(
        "event_id", (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents")
    )
    # r12: the testdata scan is a single row group = ONE task; the 32x
    # expansion + md5/conv stream below is the whole cost of this query,
    # so spread the (event_id, cents) pairs across the executor first
    # (fan_out is layout-derived: a no-op when the scan already splits).
    base = fan_out(spark, base, sf_dir, "events")
    base = base.localCheckpoint(eager=False)  # two consumers: reps + point est
    expanded = (
        base.select(
            "event_id",
            "cents",
            F.explode(F.expr(f"sequence(0, {BOOT_REPS // 4 - 1})")).alias("block"),
        )
        .select(
            "cents",
            "block",
            F.expr(
                "md5(concat(CAST(event_id AS STRING), ':', CAST(block AS STRING)))"
            ).alias("_dig"),  # computed BEFORE the slot explode: one digest per block
        )
        .select("cents", "block", "_dig", F.explode(F.expr("sequence(0, 3)")).alias("slot"))
        # r12: materialize u in its own projection so the CASE ladder in
        # _boot_w evaluates the conv/substring chain ONCE per (row, slot)
        # — inlined, each of the 5 WHEN branches re-parses the digest
        # (CollapseProject keeps multi-use non-cheap aliases separate, so
        # this projection survives optimization). Same u, same weights.
        .select("cents", "block", "slot", F.expr(_U_SPARK).alias("u"))
        .select(
            "cents",
            (F.col("block") * 4 + F.col("slot")).alias("rep"),
            F.expr(_boot_w("u")).alias("w"),
        )
    )
    per_rep = expanded.groupBy("rep").agg(
        F.sum("w").alias("n_r"),
        F.sum(F.col("w") * F.col("cents")).alias("s_r"),
    )
    means = per_rep.agg(
        F.expr("array_sort(collect_list(CAST(s_r AS DOUBLE) / n_r / 100))").alias("ms")
    )
    pt = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100).alias("mean_v"),
    )
    return pt.crossJoin(F.broadcast(means)).select(
        "n",
        "mean_v",
        F.lit(BOOT_REPS).cast("bigint").alias("boot_reps"),
        F.element_at("ms", 2).alias("ci_lo"),
        F.element_at("ms", BOOT_REPS - 1).alias("ci_hi"),
    )
