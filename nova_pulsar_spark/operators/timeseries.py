"""Time-series operators over the `events` stream-at-rest table:
spine gap-fill with forward-fill, ordered funnel analysis, rolling
window distinct counts.

Reference parity: the reference's temporal logic is freshness/stall
windows (`agents/orbiter.md:176-181`) and heartbeat-age predicates
(`scripts/starry-daemon.sh:77-85`) — the generalized forms here are
the missing-observation (gap-fill), ordered-sequence (funnel), and
sliding-activity (rolling distinct) analytics any event pipeline
needs (SURVEY.md §2.6 extensions).

Scale notes:
- gap-fill generates the time spine FROM the per-key bounds (one row
  per key), so spine size is Σ key-spans — never a cartesian of
  keys × global calendar; the forward-fill window partitions by key;
- the funnel does one filtered aggregation per stage — each stage
  shuffles only that stage's event rows reduced to one row per user
  before the next stage's (broadcastable) join;
- rolling distinct avoids a range join entirely: each (user, day)
  pair explodes to its 7 covering window-days and a single
  count-distinct shuffle does the rest — linear in events, the plan
  that survives 100× (a day-range theta join does not).

All double sums use the long-cents idiom (`functions/exact.py`) so
results are bit-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.functions.exact import sql_sum_cents, sum_cents
from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import finite_measures, load_table, timestamped


@register(
    "ts_gapfill",
    sql=f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             {sql_sum_cents("value", 100)} AS day_value,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE value IS NULL OR isfinite(value) GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    spine AS (
      SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds)
    SELECT s.user_id, s.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           LAST_VALUE(d.day_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           d.day_value IS NOT NULL AS observed
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    doc="Time-spine gap fill with forward fill (LOCF): per-user daily spine "
    "from the user's own bounds; missing days carry the last observed value",
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill = spine generation + left join + last-non-null window.
    The spine is derived per key from that key's own [min, max] day
    span (one `sequence()` per key row — no key × calendar blowup),
    and the LOCF window partitions by the same key, so the whole plan
    is one shuffle on user_id. Day sums use long-cents for exact
    cross-engine parity. Finite-measures contract: the cents
    accumulator is undefined on NaN/Inf (NULL values stay — the day
    count keeps them, the sum skips them, identically on both engines).
    """
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    daily = e.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day")).agg(
        sum_cents(F.col("value"), 100).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # Two consumers (bounds branch + the spine join) — checkpoint the
    # per-(user, day) aggregate so `events` is scanned and aggregated
    # once, not twice. At 100 TB |users × days| is orders of magnitude
    # smaller than |events|, so materializing this frame is the cheap side.
    daily = daily.localCheckpoint(eager=False)
    bounds = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNotNull().alias("observed"),
        )
    )


# Ordered funnel stages (each must happen strictly after the previous).
FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "ts_funnel",
    sql="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_depth
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
    doc="Ordered conversion funnel (view → click → purchase, strictly "
    "increasing timestamps): per-user stage times + reached depth",
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage is a filtered min-aggregation: stage N's events are
    filtered by type BEFORE the shuffle, reduced to one row per user,
    then stage N+1 joins against that (small, broadcastable) frame.
    The corpus is never shuffled whole — per stage it ships only that
    stage's event rows, and the per-user frames stay tiny at any
    scale (≤ one row per user).
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    users = e.select("user_id").distinct()
    v = (
        e.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    depth = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            depth.cast("bigint").alias("funnel_depth"),
        )
    )


ROLL_DAYS = 7


@register(
    "ts_rolling_active",
    sql=f"""
    WITH pairs AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    b AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM pairs),
    exp AS (
      SELECT user_id,
             UNNEST(generate_series(day, day + INTERVAL {ROLL_DAYS - 1} DAY,
                                    INTERVAL 1 DAY)) AS wday
      FROM pairs),
    roll AS (
      SELECT wday AS day, COUNT(DISTINCT user_id) AS active_7d
      FROM exp, b WHERE wday BETWEEN b.d0 AND b.d1 GROUP BY 1),
    daily AS (
      SELECT day, COUNT(DISTINCT user_id) AS active_1d FROM pairs GROUP BY 1)
    SELECT r.day,
           CAST(COALESCE(d.active_1d, 0) AS BIGINT) AS active_1d,
           CAST(r.active_7d AS BIGINT) AS active_7d
    FROM roll r LEFT JOIN daily d ON d.day = r.day
    """,
    doc=f"Rolling {ROLL_DAYS}-day distinct active users per day (explode-to-"
    "window-days rewrite — linear shuffle, no day-range theta join)",
)
def ts_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window COUNT(DISTINCT) without a range join: each
    (user, day) observation is charged to the 7 window-days it
    covers, then one groupBy(day) count-distinct finishes the job.
    Work is 7× the distinct (user, day) pairs — linear in input and
    embarrassingly parallel, where the naive `day BETWEEN d-6 AND d`
    join is quadratic pressure on a single range dimension at 100 TB.

    Scan-once shape (r4 rewrite; the r2/r3 plan scanned events 3× —
    roll, daily, and bounds branches — with no ReusedExchange): the
    explode carries the window OFFSET k, `groupBy(wday, user_id).
    agg(min(k))` dedups during the first (map-side-combinable)
    shuffle, then one tiny per-day aggregation derives BOTH counts —
    active_7d = rows, active_1d = rows with k0 = 0 — with no
    count-distinct Expand. The [d0, d1] bounds filter is a global
    window over the per-day frame (|days| rows — a calendar, small at
    any corpus scale), so no third branch back to the fact table.
    Measured at sf0.1: 1 parquet scan vs 3, equal-or-faster warm.
    """
    e = load_table(spark, sf_dir, "events")
    exp = (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .select("user_id", "day", F.explode(F.expr(f"sequence(0, {ROLL_DAYS - 1})")).alias("k"))
        .select("user_id", "k", F.expr("day + make_dt_interval(k)").alias("wday"))
    )
    g = exp.groupBy("wday", "user_id").agg(F.min("k").alias("k0"))
    per_day = g.groupBy(F.col("wday").alias("day")).agg(
        F.count(F.lit(1)).alias("active_7d"),
        F.sum(F.when(F.col("k0") == 0, 1).otherwise(0)).alias("active_1d"),
    )
    wall = W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    obs_day = F.when(F.col("active_1d") > 0, F.col("day"))
    out = per_day.select(
        "*",
        F.min(obs_day).over(wall).alias("d0"),
        F.max(obs_day).over(wall).alias("d1"),
    )
    return out.filter(F.col("day").between(F.col("d0"), F.col("d1"))).select(
        "day",
        F.col("active_1d").cast("bigint").alias("active_1d"),
        F.col("active_7d").cast("bigint").alias("active_7d"),
    )


PATTERN_WINDOW_MIN = 5  # adjacency window for the two-step pattern


@register(
    "ts_event_pattern",
    sql=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             LEAD(event_type) OVER w AS next_type,
             LEAD(event_id)  OVER w AS next_event_id,
             LEAD(ts)        OVER w AS next_ts
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id, next_event_id, ts AS purchase_ts,
           next_ts AS error_ts,
           CAST((EPOCH_US(next_ts) - EPOCH_US(ts)) // 1000000 AS BIGINT) AS gap_seconds
    FROM seq
    WHERE event_type = 'purchase' AND next_type = 'error'
      AND EPOCH_US(next_ts) - EPOCH_US(ts) <= {PATTERN_WINDOW_MIN} * 60 * 1000000
    """,
    doc="Event-sequence pattern match (MATCH_RECOGNIZE shape): purchase "
    "IMMEDIATELY followed by error within 5 min, per user — the adjacency "
    "pattern is one LEAD window, no self-join",
)
def ts_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair pattern detection compiles to a single LEAD window
    partitioned by the entity key — one shuffle, no self-join, no
    per-row Python. Longer patterns chain more LEADs (fixed length) or
    fall back to the sessionize-then-aggregate shape; both keep the
    per-key ordering local to one partition, which is what makes
    MATCH_RECOGNIZE-style queries tractable at 100 TB.

    Timestamped-rows contract: a NULL-ts row adjacent to a purchase
    would otherwise change LEAD's answer differently per engine
    (Spark sorts NULLS FIRST, DuckDB NULLS LAST).
    """
    e = timestamped(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    gap_us = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & (F.col("next_type") == "error")
            & (gap_us <= PATTERN_WINDOW_MIN * 60 * 1_000_000)
        )
        .select(
            "user_id",
            "event_id",
            "next_event_id",
            F.col("ts").alias("purchase_ts"),
            F.col("next_ts").alias("error_ts"),
            F.floor(gap_us / 1_000_000).cast("bigint").alias("gap_seconds"),
        )
    )


@register(
    "ts_streaks",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    grp AS (
      SELECT user_id, day,
             day - INTERVAL (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)) DAY
               AS island
      FROM days)
    SELECT user_id,
           MIN(day) AS streak_start,
           MAX(day) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM grp
    GROUP BY user_id, island
    """,
    doc="Gaps-and-islands: consecutive-active-day streaks per user — the "
    "day-minus-row_number island trick, one window + one aggregation",
)
def ts_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streak detection without self-joins or loops: subtracting the
    per-key row number (in days) from each active day maps every run
    of consecutive days to one constant 'island' value; a groupBy on
    it yields the streaks. One shuffle for the window, one for the
    aggregate — both partitioned by the entity key, nothing global.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id",
        "day",
        (F.col("day") - F.make_interval(days=F.row_number().over(w))).alias("island"),
    )
    return grp.groupBy("user_id", "island").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
    ).drop("island")


@register(
    "ts_retention_cohorts",
    sql="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) // 7 AS BIGINT)
               AS week_offset
      FROM events e JOIN firsts f ON f.user_id = e.user_id)
    SELECT cohort_day, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY cohort_day, week_offset
    """,
    doc="Cohort retention: users grouped by first-seen day, activity counted "
    "per week offset — the (cohort × age) retention matrix",
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention matrix in three shuffles, none carrying events
    whole: first-seen day per user (map-side-combined min), a join
    back on user_id (at scale the firsts frame is small per-user
    metadata — broadcast or co-partitioned), and the distinct+count on
    (cohort, offset). Week offset is integer day-diff // 7, identical
    arithmetic on both engines."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(F.datediff(day, F.col("cohort_day")) / 7).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_users")
    )


ANOMALY_Z = 2.0
ANOMALY_TRAILING = 7  # trailing days in the baseline window


@register(
    "ts_anomaly_zscore",
    sql=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, day, cnt,
             SUM(cnt) OVER w AS s, SUM(cnt * cnt) OVER w AS ss, COUNT(*) OVER w AS k
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {ANOMALY_TRAILING} PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
           CASE WHEN CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k) > 0
                THEN (cnt - CAST(s AS DOUBLE) / k)
                     / SQRT(CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k))
                ELSE NULL END AS zscore
    FROM stats
    WHERE k >= {ANOMALY_TRAILING} AND (
      (CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k) > 0
       AND ABS((cnt - CAST(s AS DOUBLE) / k)
           / SQRT(CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k)))
           >= {ANOMALY_Z})
      OR (CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k) = 0
          AND cnt <> CAST(s AS DOUBLE) / k))
    """,
    doc=f"Volume anomaly detection: daily counts z-scored against the "
    f"trailing {ANOMALY_TRAILING}-day baseline (population moments from exact "
    f"integer sums) — days with |z| >= {ANOMALY_Z}",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline moments come from INTEGER sums (Σcnt, Σcnt²) over a
    bounded ROWS frame — exact regardless of accumulation order — and
    the z expression is one fixed IEEE tree over them, so both engines
    emit bit-identical scores. A zero-variance baseline with a
    deviating count is flagged with a NULL z (unbounded anomaly). The frame excludes the current day
    (PRECEDING..1 PRECEDING): today's spike must not inflate its own
    baseline. One shuffle on event_type for the window; daily counts
    upstream are map-side combined."""
    e = timestamped(load_table(spark, sf_dir, "events"))
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOMALY_TRAILING, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    var = F.col("ss").cast("double") / F.col("k") - mean * mean
    z = (F.col("cnt") - mean) / F.sqrt(var)
    # Degenerate baseline (constant trailing counts → var = 0): any
    # deviation is an anomaly of unbounded z — flag it with NULL zscore
    # on BOTH engines (emitting ±Inf/NaN would hit divergent NaN
    # comparison semantics between Spark and DuckDB).
    flagged = ((var > 0) & (F.abs(z) >= ANOMALY_Z)) | ((var == 0) & (F.col("cnt") != mean))
    return (
        stats.filter((F.col("k") >= ANOMALY_TRAILING) & flagged)
        .select(
            "event_type",
            "day",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.when(var > 0, z).alias("zscore"),
        )
    )


@register(
    "ts_cumulative_users",
    sql="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
      FROM events WHERE ts IS NOT NULL GROUP BY user_id),
    daily_new AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY first_day)
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM daily_new
    """,
    doc="Cumulative distinct users per day via first-seen flags + running "
    "sum — running COUNT(DISTINCT) without re-counting any prefix",
)
def ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count done right: each user contributes once at
    their first-seen day (one min-aggregate), daily new-user counts
    roll up map-side, and the cumulative series is a running sum over
    the (tiny) day spine. The naive per-day COUNT(DISTINCT user_id
    WHERE ts <= day) re-scans a growing prefix per day — quadratic in
    history; this shape is one scan + two small shuffles at any scale.
    """
    # timestamped-rows contract: time-bucketed/ordered series exclude
    # NULL ts on both engines (engines disagree on NULL placement)
    e = timestamped(load_table(spark, sf_dir, "events"))
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    daily_new = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily_new.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@register(
    "ts_seasonality",
    sql="""
    SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events WHERE value IS NULL OR isfinite(value)
    GROUP BY 1, 2
    """,
    doc="Seasonality profile: day-of-week x hour-of-day activity grid "
    "(the load-shape fingerprint behind anomaly baselines and capacity planning)",
)
def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-of-week × hour-of-day grid every anomaly detector
    normalizes against (ts_anomaly_zscore's trailing baseline assumes
    stationarity; this is the operator that checks it). One map-
    combinable aggregation into at most 168 groups — the shuffle
    carries 168 rows per task no matter the corpus size. Engine note:
    Spark's dayofweek() is 1-7 Sunday-first while DuckDB's dayofweek()
    is 0-6 Sunday-first, so the Spark side subtracts 1; sums use the
    decimal-exact idiom (finite-measures contract: NaN/Inf rows
    excluded on both engines, NULL values stay)."""
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "ts_downsample_ohlc",
    sql="""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket_ts,
           FIRST(value ORDER BY ts, event_id) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           LAST(value ORDER BY ts, event_id) AS close_v,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events WHERE ts IS NOT NULL
    GROUP BY event_type, date_trunc('hour', ts)
    """,
    doc="OHLC downsample: per (event_type, hour) open/high/low/close with "
    "(ts, event_id)-deterministic endpoint selection — the lossy rollup "
    "that turns a raw 100 TB event stream into a dashboard-sized series "
    "in one map-side-combinable aggregation",
)
def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy, no windows: open/close come from min/max over a
    (ts, event_id, value) struct, which combines associatively — so
    the whole rollup is a single shuffle with map-side partials, the
    shape that survives any scale. Endpoints are tie-broken by the
    unique event_id, making results partitioning-independent.
    Timestamped-rows contract: the NULL-ts bucket's open/close would
    otherwise hinge on engine-specific NULL ordering inside the
    endpoint structs."""
    e = timestamped(load_table(spark, sf_dir, "events"))
    key = F.struct("ts", "event_id", "value")
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            F.min(key).getItem("value").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(key).getItem("value").alias("close_v"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


@register(
    "ts_ewma",
    sql="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(ROUND(value * 1000, 0) AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1000 AS m
      FROM events
      WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
      GROUP BY 1, 2),
    series AS (
      SELECT event_type, list(m ORDER BY bucket_ts) AS ms FROM hourly GROUP BY 1)
    SELECT event_type,
           CAST(len(ms) AS BIGINT) AS n_hours,
           ms[len(ms)] AS last_mean,
           list_reduce(ms, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma
    FROM series ORDER BY event_type
    """,
    doc="Exponentially weighted moving average (alpha=0.5) of the hourly mean "
    "series per event type — the 'inherently sequential' smoother made "
    "scale-safe: the fold runs over a calendar-bounded array, never the raw "
    "event stream",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two stages, both scale-independent in state: (1) hourly means
    via the decimal-exact sum idiom (one map-side-combinable groupBy
    over the raw events — the only corpus-sized pass); (2) a per-type
    LEFT FOLD over the bucket_ts-ordered mean array. The array length
    is bounded by the calendar (8,760 hours/year/type), not by data
    volume, so collect_list here is a rollup artifact, not a memory
    smell. alpha=0.5 is an exact binary fraction and both engines fold
    left from the first element — bit-identical smoothing."""
    # timestamped-rows + finite-measures contracts: NULL ts and
    # NaN/Inf values excluded on both engines (NULL values stay)
    e = finite_measures(timestamped(load_table(spark, sf_dir, "events")), "value")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 1000, 0).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 1000
        ).alias("m")
    )
    series = hourly.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(bucket_ts, m))), s -> s.m)").alias("ms")
    )
    return series.select(
        "event_type",
        F.size("ms").cast("bigint").alias("n_hours"),
        F.element_at("ms", -1).alias("last_mean"),
        F.expr(
            "aggregate(slice(ms, 2, greatest(size(ms) - 1, 0)), element_at(ms, 1), "
            "(acc, x) -> CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * acc)"
        ).alias("ewma"),
    ).orderBy("event_type")


# --- CUSUM changepoint detection ------------------------------------------


@register(
    "ts_changepoint_cusum",
    sql="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, date_trunc('day', ts)),
    t AS (
      SELECT event_type, day, n,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM daily),
    c AS (
      SELECT event_type, day, n_days,
             SUM(n * n_days - total) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      FROM t),
    r AS (
      SELECT event_type, day, n_days, ABS(cusum) AS abs_cusum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(cusum) DESC, day) AS rn
      FROM c)
    SELECT event_type, day AS cp_day,
           CAST(abs_cusum AS BIGINT) AS max_abs_cusum_scaled,
           CAST(n_days AS BIGINT) AS n_days
    FROM r WHERE rn = 1
    """,
    doc="CUSUM changepoint per event_type: the day where the cumulative "
    "deviation of daily counts from the series mean peaks — integer-scaled "
    "(dev × n_days) so the running sum is exact on both engines",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection (CUSUM / binary-segmentation step):
    the argmax of |Σ_{i<=t}(x_i − mean)| locates the most likely single
    level shift in a series. Deviations are scaled by n_days
    (n·n_days − total) so every intermediate stays BIGINT — a running
    SUM over doubles would be last-ulp partitioning-dependent (DuckDB
    windows aggregate via segment trees, Spark sequentially; integers
    make the order irrelevant).

    Scale shape: one shuffle to daily counts (map-side combined), one
    shuffle on event_type for the windows — the per-series history
    lands in one task, which is the right layout since changepoint
    analysis is inherently sequential per series; millions of SERIES
    parallelize across tasks, and a single series of years of days is
    thousands of rows, never a memory risk."""
    e = timestamped(load_table(spark, sf_dir, "events"))
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = W.partitionBy("event_type")
    t = daily.select(
        "event_type",
        "day",
        "n",
        F.count(F.lit(1)).over(wt).alias("n_days"),
        F.sum("n").over(wt).alias("total"),
    )
    wc = W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = t.select(
        "event_type",
        "day",
        "n_days",
        F.sum(F.col("n") * F.col("n_days") - F.col("total")).over(wc).alias("cusum"),
    )
    wr = W.partitionBy("event_type").orderBy(F.abs(F.col("cusum")).desc(), "day")
    return (
        c.select(
            "event_type",
            "day",
            "n_days",
            F.abs(F.col("cusum")).alias("abs_cusum"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            F.col("abs_cusum").cast("bigint").alias("max_abs_cusum_scaled"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


# --- Autocorrelation function (seasonality / dependence screen) ------------

ACF_LAGS = 3


def _acf_lag_sql(lag: int) -> str:
    return f"""
    SELECT event_type, {lag} AS lag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE))
                     * SQRT(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)) <> 0
                THEN CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                     / (SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE))
                        * SQRT(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)))
           END AS acf
    FROM (SELECT event_type, x, LAG(x, {lag}) OVER (PARTITION BY event_type
                                                    ORDER BY ts, event_id) AS y
          FROM cents)
    WHERE y IS NOT NULL
    GROUP BY event_type"""


@register(
    "ts_acf",
    sql="""
    WITH cents AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value))
    """
    + "\n    UNION ALL\n".join(_acf_lag_sql(k) for k in range(1, ACF_LAGS + 1)),
    doc=f"Exact autocorrelation at lags 1..{ACF_LAGS} per event series "
    "(cents-integer Pearson over (x_t, x_t-lag) pairs, decimal accumulators) "
    "— the seasonality/dependence screen behind window-size choices",
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF decides rolling-window widths and seasonality hypotheses;
    the float-naive estimator is accumulation-order-dependent, so this
    one runs on cents integers (value canonicalized through
    DECIMAL(18,2) — the agg_corr_exact discipline) with DECIMAL(38,0)
    moment sums and one closed-form IEEE division per (series, lag).
    Plan (round-5 rewrite): a `LAG(x, k) OVER (PARTITION BY
    event_type ...)` window per lag ships each series to ONE task —
    the heavy-group ceiling (a handful of event_types means
    tens-of-TB tasks at 100 TB). Instead: ONE distributed rank pass
    (operators/ranks.py) positions every row in its series, each row
    fans out into {ACF_LAGS} probe rows via a map-side explode
    (rank+1..rank+K), and a single (event_type, rank) equi-join
    closes all K lag pairs at once — every stage shuffles by a
    high-cardinality composite key. Same pair multiset as the K
    windows, one distributed join instead of K single-task sorts.
    Degenerate series (constant either side) yield NULL via the
    guarded denominator."""
    from nova_pulsar_spark.operators.ranks import grouped_rank

    e = load_table(spark, sf_dir, "events")
    cents = finite_measures(timestamped(e), "value", keep_nulls=False).select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("x"),
    )
    ranked = grouped_rank(
        cents, ["event_type"], ["ts", "event_id"], spark.sparkContext.defaultParallelism
    ).select("event_type", "rn", "x")
    # each row offers its value as the LAGGED partner (y) of the rows
    # k=1..K positions ahead of it in the same series
    probe = ranked.select(
        "event_type",
        F.col("x").alias("y"),
        F.explode(F.expr(f"sequence(1, {ACF_LAGS})")).alias("lag"),
        F.col("rn").alias("src_rn"),
    ).select("event_type", "y", "lag", (F.col("src_rn") + F.col("lag")).alias("rn"))
    from nova_pulsar_spark.operators.ranks import nullsafe_equi_join

    # null-safe: the oracle's LAG window keeps a NULL event_type group;
    # a plain equi-join here would drop it (ADVICE r5)
    pairs = nullsafe_equi_join(ranked, probe, ["event_type", "rn"])
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return s.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n"),
        F.when(den != 0, num / den).alias("acf"),
    )


# --- Holt double-exponential smoothing (level + trend) ----------------------


@register(
    "ts_holt",
    sql="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(ROUND(value * 1000, 0) AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1000 AS m
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value) GROUP BY 1, 2),
    series AS (
      SELECT event_type, list(m ORDER BY bucket_ts) AS ms FROM hourly GROUP BY 1),
    fold AS (
      SELECT event_type, len(ms) AS n_hours, ms[len(ms)] AS last_mean,
             list_reduce(
               list_transform(ms, v -> [v, CAST(0 AS DOUBLE)]),
               (acc, x) -> [
                 CAST(0.5 AS DOUBLE) * x[1] + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
                 CAST(0.5 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * x[1]
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
                 + CAST(0.5 AS DOUBLE) * acc[2]]) AS h
      FROM series)
    SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours, last_mean,
           h[1] AS level, h[2] AS trend, h[1] + h[2] AS forecast_1
    FROM fold ORDER BY event_type
    """,
    doc="Holt double-exponential smoothing (alpha=beta=0.5) over the hourly "
    "mean series per event type: final level + trend and the one-step "
    "forecast — EWMA's trend-aware upgrade, same calendar-bounded fold",
)
def ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear method needs BOTH running level and running trend,
    so the fold carries a [l, b] ARRAY accumulator — Spark's
    ``aggregate`` takes any accumulator type; DuckDB's ``list_reduce``
    requires accumulator type == element type, so the twin lifts each
    mean into the same [v, 0] pair first (``list_transform``). A
    STRUCT accumulator is NOT usable here: DuckDB evaluates struct-
    returning lambda fields sequentially and rebinds ``acc`` in place,
    so the second field's ``acc.l`` reads the NEW level (verified on
    duckdb in-container; arrays are immutable values and don't alias).
    The per-step arithmetic is written in the identical association
    order on both engines and alpha=beta=0.5 are exact binary
    fractions: bit-identical doubles out. Scale shape is ts_ewma's:
    one map-side-combinable groupBy over the raw events (decimal-exact
    hourly means, the only corpus-sized pass), then a per-type fold
    over a calendar-bounded array — collect_list holds hours, not
    events. Series init: level = first mean, trend = 0 (the fold's
    first element IS the initial accumulator on both engines)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        finite_measures(timestamped(e), "value", keep_nulls=False)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 1000, 0).cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / 1000
            ).alias("m")
        )
    )
    series = hourly.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(bucket_ts, m))), s -> s.m)").alias("ms")
    )
    fold = F.expr(
        "aggregate(slice(ms, 2, greatest(size(ms) - 1, 0)), "
        "array(element_at(ms, 1), CAST(0 AS DOUBLE)), "
        "(acc, x) -> array("
        "CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * (acc[0] + acc[1]), "
        "CAST(0.5 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * x "
        "+ CAST(0.5 AS DOUBLE) * (acc[0] + acc[1])) - acc[0]) "
        "+ CAST(0.5 AS DOUBLE) * acc[1]))"
    )
    return (
        series.select(
            "event_type",
            F.size("ms").cast("bigint").alias("n_hours"),
            F.element_at("ms", -1).alias("last_mean"),
            fold.alias("h"),
        )
        .select(
            "event_type",
            "n_hours",
            "last_mean",
            F.element_at("h", 1).alias("level"),
            F.element_at("h", 2).alias("trend"),
            (F.element_at("h", 1) + F.element_at("h", 2)).alias("forecast_1"),
        )
        .orderBy("event_type")
    )


# --- One-step-ahead forecast backtest (Holt vs naive) -----------------------


@register(
    "ts_forecast_backtest",
    sql="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(ROUND(value * 1000, 0) AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1000 AS m
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value) GROUP BY 1, 2),
    series AS (
      SELECT event_type, list(m ORDER BY bucket_ts) AS ms FROM hourly GROUP BY 1),
    fold AS (
      SELECT event_type, len(ms) AS n_hours,
             list_reduce(
               list_transform(ms, v -> [v, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                                        CAST(0 AS DOUBLE), v]),
               (acc, x) -> [
                 CAST(0.5 AS DOUBLE) * x[1] + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
                 CAST(0.5 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * x[1]
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
                 + CAST(0.5 AS DOUBLE) * acc[2],
                 acc[3] + ABS(x[1] - (acc[1] + acc[2])),
                 acc[4] + ABS(x[1] - acc[5]),
                 x[1]]) AS h
      FROM series)
    SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
           CASE WHEN n_hours > 1 THEN h[3] / CAST(n_hours - 1 AS DOUBLE) END AS mae_holt,
           CASE WHEN n_hours > 1 THEN h[4] / CAST(n_hours - 1 AS DOUBLE) END AS mae_naive,
           CASE WHEN n_hours > 1
                THEN CAST(1 AS DOUBLE) - h[3] / NULLIF(h[4], CAST(0 AS DOUBLE)) END AS skill
    FROM fold ORDER BY event_type
    """,
    doc="Rolling-origin one-step-ahead backtest per series: Holt(0.5, 0.5) "
    "forecast MAE vs the naive last-value MAE and the resulting skill score "
    "— the honesty check every forecasting operator should ship with",
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A smoother is only worth deploying if it beats persistence —
    this backtest scores Holt's one-step forecast (made BEFORE each
    update, so it is a true rolling-origin evaluation, no leakage)
    against the naive carry-forward, in the SAME single fold: the
    array accumulator carries [level, trend, holt_abs_err, naive_
    abs_err, prev_value] (array, not struct — DuckDB struct lambdas
    rebind acc in place, see ts_holt). Scale shape unchanged from
    ts_ewma/ts_holt: one map-side-combinable hourly rollup over the
    corpus, then calendar-bounded per-series folds; adding two error
    accumulators costs nothing. skill > 0 means Holt beats naive;
    single-point series yield NULL metrics (no forecastable step)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        finite_measures(timestamped(e), "value", keep_nulls=False)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 1000, 0).cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / 1000
            ).alias("m")
        )
    )
    series = hourly.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(bucket_ts, m))), s -> s.m)").alias("ms")
    )
    fold = F.expr(
        "aggregate(slice(ms, 2, greatest(size(ms) - 1, 0)), "
        "array(element_at(ms, 1), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), "
        "CAST(0 AS DOUBLE), element_at(ms, 1)), "
        "(acc, x) -> array("
        "CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * (acc[0] + acc[1]), "
        "CAST(0.5 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * x "
        "+ CAST(0.5 AS DOUBLE) * (acc[0] + acc[1])) - acc[0]) "
        "+ CAST(0.5 AS DOUBLE) * acc[1], "
        "acc[2] + ABS(x - (acc[0] + acc[1])), "
        "acc[3] + ABS(x - acc[4]), "
        "x))"
    )
    n1 = F.col("n_hours") > 1
    den = (F.col("n_hours") - 1).cast("double")
    return (
        series.select(
            "event_type",
            F.size("ms").cast("bigint").alias("n_hours"),
            fold.alias("h"),
        )
        .select(
            "event_type",
            "n_hours",
            F.when(n1, F.element_at("h", 3) / den).alias("mae_holt"),
            F.when(n1, F.element_at("h", 4) / den).alias("mae_naive"),
            F.when(
                n1,
                F.lit(1).cast("double")
                - F.element_at("h", 3) / F.nullif(F.element_at("h", 4), F.lit(0).cast("double")),
            ).alias("skill"),
        )
        .orderBy("event_type")
    )


# --- Holt-Winters additive (level + trend + seasonality) --------------------

HW_PERIOD = 24  # hourly series, daily seasonality

_HW_ZEROS = ", ".join(["CAST(0 AS DOUBLE)"] * (HW_PERIOD + 1))
# DuckDB lambda body (1-based): acc = [l, b, s_cur, s_next, ..., s_last]
_HW_LNEW_DD = (
    "CAST(0.5 AS DOUBLE) * (x[1] - acc[3])"
    " + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2])"
)
# Spark lambda body (0-based [] indexing): same association order
_HW_LNEW_SP = (
    "CAST(0.5 AS DOUBLE) * (x - acc[2])"
    " + CAST(0.5 AS DOUBLE) * (acc[0] + acc[1])"
)


@register(
    "ts_holt_winters",
    sql=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(ROUND(value * 1000, 0) AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1000 AS m
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value) GROUP BY 1, 2),
    series AS (
      SELECT event_type, list(m ORDER BY bucket_ts) AS ms FROM hourly GROUP BY 1),
    fold AS (
      SELECT event_type, len(ms) AS n_hours,
             list_reduce(
               list_transform(ms, v -> [v, {_HW_ZEROS}]),
               (acc, x) -> list_concat(
                 [{_HW_LNEW_DD},
                  CAST(0.5 AS DOUBLE) * (({_HW_LNEW_DD}) - acc[1])
                    + CAST(0.5 AS DOUBLE) * acc[2]],
                 list_concat(
                   acc[4:{HW_PERIOD + 2}],
                   [CAST(0.5 AS DOUBLE) * (x[1] - ({_HW_LNEW_DD}))
                      + CAST(0.5 AS DOUBLE) * acc[3]]))) AS h
      FROM series)
    SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
           h[1] AS level, h[2] AS trend, h[3] AS season_next,
           h[1] + h[2] + h[3] AS forecast_1
    FROM fold ORDER BY event_type
    """,
    doc=f"Holt-Winters additive smoothing (alpha=beta=gamma=0.5, period="
    f"{HW_PERIOD}) over hourly means per event type via a rotating seasonal "
    "buffer in the fold accumulator — index-free, so the same fold runs on "
    "both engines; one-step forecast = level + trend + next season slot",
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple smoothing — the production upgrade
    of ts_holt when the series has a seasonal cycle (hour-of-day load,
    day-of-week traffic). The fold state is [level, trend,
    s_1..s_P] and the seasonal index is encoded POSITIONALLY: the
    CURRENT step's seasonal slot is always acc element 3, and each
    step rotates the buffer (slots 2..P slide forward, the freshly
    updated slot appends at the back) — index-free, which matters
    because neither engine's fold lambda exposes an element index;
    the rotation IS the modular arithmetic. Update order (l' from
    x - s_cur; b' from l' - l; s' from x - l'), every intermediate
    inlined in the identical association order on both engines, and
    alpha = beta = gamma = 0.5 are exact binary fractions: the
    doubles match bit-for-bit. Initialization: l0 = first mean,
    b0 = 0, seasons all 0 (the lifted first element IS the initial
    accumulator on both engines). Scale: identical to ts_holt — one
    map-side-combinable decimal-exact groupBy over events (the only
    corpus-sized pass), then a per-type fold over a calendar-bounded
    hour array; the accumulator is P + 2 doubles, the per-step cost
    O(P) array copy, n_hours * (P + 2) work per series total."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        finite_measures(timestamped(e), "value", keep_nulls=False)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 1000, 0).cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / 1000
            ).alias("m")
        )
    )
    series = hourly.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(bucket_ts, m))), s -> s.m)").alias("ms")
    )
    fold = F.expr(
        "aggregate(slice(ms, 2, greatest(size(ms) - 1, 0)), "
        f"concat(array(element_at(ms, 1)), array_repeat(CAST(0 AS DOUBLE), {HW_PERIOD + 1})), "
        "(acc, x) -> concat(array("
        f"{_HW_LNEW_SP}, "
        f"CAST(0.5 AS DOUBLE) * (({_HW_LNEW_SP}) - acc[0]) "
        "+ CAST(0.5 AS DOUBLE) * acc[1]), "
        f"slice(acc, 4, {HW_PERIOD - 1}), "
        f"array(CAST(0.5 AS DOUBLE) * (x - ({_HW_LNEW_SP})) "
        "+ CAST(0.5 AS DOUBLE) * acc[2])))"
    )
    return (
        series.select(
            "event_type",
            F.size("ms").cast("bigint").alias("n_hours"),
            fold.alias("h"),
        )
        .select(
            "event_type",
            "n_hours",
            F.element_at("h", 1).alias("level"),
            F.element_at("h", 2).alias("trend"),
            F.element_at("h", 3).alias("season_next"),
            (F.element_at("h", 1) + F.element_at("h", 2) + F.element_at("h", 3)).alias(
                "forecast_1"
            ),
        )
        .orderBy("event_type")
    )


# --- Lagged cross-correlation between event-type series ---------------------

XCORR_LAGS = 3  # hours 0..XCORR_LAGS


def _xcorr_lag_sql(k: int) -> str:
    # plain BIGINT sums: DuckDB accumulates in HUGEINT (exact) and casts
    # to DOUBLE once — the ts_acf discipline (explicit DECIMAL casts here
    # would hit DuckDB's width-capped decimal arithmetic instead)
    return f"""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           {k} AS lag_hours, CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN SQRT(CAST(COUNT(*) * SUM(a.mx * a.mx) - SUM(a.mx) * SUM(a.mx) AS DOUBLE))
                     * SQRT(CAST(COUNT(*) * SUM(b.mx * b.mx) - SUM(b.mx) * SUM(b.mx) AS DOUBLE)) <> 0
                THEN CAST(COUNT(*) * SUM(a.mx * b.mx) - SUM(a.mx) * SUM(b.mx) AS DOUBLE)
                     / (SQRT(CAST(COUNT(*) * SUM(a.mx * a.mx) - SUM(a.mx) * SUM(a.mx) AS DOUBLE))
                        * SQRT(CAST(COUNT(*) * SUM(b.mx * b.mx) - SUM(b.mx) * SUM(b.mx) AS DOUBLE)))
           END AS xcorr
    FROM hourly a
    JOIN hourly b ON b.bucket_ts = a.bucket_ts + INTERVAL {k} HOUR
                 AND a.event_type <> b.event_type
    GROUP BY a.event_type, b.event_type"""


@register(
    "ts_xcorr",
    sql="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(FLOOR(CAST(SUM(CAST(ROUND(value * 1000, 0) AS DECIMAL(38,0))) AS DOUBLE)
                        / COUNT(*) / 1000 * 1024) AS BIGINT) AS mx
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value) GROUP BY 1, 2)
    """
    + "\n    UNION ALL\n".join(_xcorr_lag_sql(k) for k in range(0, XCORR_LAGS + 1)),
    doc=f"Lagged cross-correlation (hours 0..{XCORR_LAGS}) between every "
    "ordered pair of event-type hourly series — 2^-20 fixed-point means, "
    "integer Pearson moments; the lead/lag detection screen",
)
def ts_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does one event stream LEAD another (errors now -> support
    tickets in two hours)? Cross-correlation at small lags is the
    screen. Alignment problem: two types never share raw timestamps,
    so both series first land on the hourly grid (the ts_holt
    decimal-exact hourly mean), and the mean — a double — is
    quantized 2^-10 fixed-point (floor, the catalogued idiom — and a
    deliberately COARSE scale: the calendar bounds n, and keeping
    n·Σmx² under 2^53 keeps the one decimal->double cast per moment
    engine-exact, the catalogued conversion class) so
    every downstream moment is INTEGER arithmetic: the Pearson sums
    accumulate in DECIMAL(38,0), order/partition-proof, one closed-
    form IEEE division per (pair, lag). Per lag the shifted alignment
    is an equi-join on bucket_ts + INTERVAL k (hash join on the
    calendar-bounded hourly spine — never the raw corpus; the corpus
    is touched once, by the grouped hourly scan). Lags are a
    compile-time constant: XCORR_LAGS+1 spine joins total.
    Constant series yield NULL via the guarded denominator."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        finite_measures(timestamped(e), "value", keep_nulls=False)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("value") * 1000, 0).cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / 1000
                * 1024
            )
            .cast("bigint")
            .alias("mx")
        )
        .localCheckpoint(eager=False)  # 2*(XCORR_LAGS+1) join sides
    )
    a = hourly.select(
        F.col("event_type").alias("type_a"), F.col("bucket_ts").alias("ts_a"), F.col("mx").alias("xa")
    )
    outs = []
    for k in range(0, XCORR_LAGS + 1):
        b = hourly.select(
            F.col("event_type").alias("type_b"),
            F.col("bucket_ts").alias("ts_b"),
            F.col("mx").alias("xb"),
        )
        p = a.join(
            b,
            (F.col("ts_b") == F.expr(f"ts_a + INTERVAL {k} HOUR"))
            & (F.col("type_a") != F.col("type_b")),
        )
        s = p.groupBy("type_a", "type_b").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("xa").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("xb").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("xa") * F.col("xa")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("xb") * F.col("xb")).cast("decimal(38,0)")).alias("syy"),
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(38,0)")).alias("sxy"),
        )
        den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        )
        num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        outs.append(
            s.select(
                "type_a",
                "type_b",
                F.lit(k).alias("lag_hours"),
                F.col("n").cast("bigint").alias("n"),
                F.when(den != 0, num / den).alias("xcorr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --- LTTB downsampling (largest-triangle-three-buckets) ---------------------

LTTB_K = 24  # output points per series


@register(
    "ts_lttb",
    sql=f"""
    WITH RECURSIVE pts0 AS (
      SELECT event_type, epoch_us(ts) AS xa, value AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value)),
    pts1 AS (
      SELECT event_type, xa - MIN(xa) OVER (PARTITION BY event_type) AS x, y,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM pts0),
    pts AS (
      SELECT event_type, x, y, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, y) - 1 AS j
      FROM pts1),
    bk AS (
      SELECT event_type, x, y,
             CASE WHEN j = 0 THEN 0
                  WHEN j = n - 1 THEN {LTTB_K - 1}
                  ELSE LEAST({LTTB_K - 2},
                             1 + CAST(FLOOR((j - 1) * {LTTB_K - 2} / (n - 2)) AS INT))
             END AS i
      FROM pts WHERE n > {LTTB_K}),
    bstats AS (
      SELECT event_type, i,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS ax,
             CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ay
      FROM bk GROUP BY event_type, i),
    nexts AS (
      SELECT event_type, i,
             LEAD(ax) OVER (PARTITION BY event_type ORDER BY i) AS nax,
             LEAD(ay) OVER (PARTITION BY event_type ORDER BY i) AS nay
      FROM bstats),
    sel(event_type, i, sx, sy) AS (
      SELECT event_type, 0, x, y FROM bk WHERE i = 0
      UNION ALL
      SELECT t.event_type, t.i, t.x, t.y FROM (
        SELECT p.event_type, p.i, p.x, p.y,
               ROW_NUMBER() OVER (PARTITION BY p.event_type, p.i ORDER BY
                 ABS((CAST(s.sx AS DOUBLE) - nx.nax) * (p.y - s.sy)
                     - (CAST(s.sx AS DOUBLE) - CAST(p.x AS DOUBLE)) * (nx.nay - s.sy)) DESC,
                 p.x DESC, p.y DESC) AS rn
        FROM sel s
        JOIN bk p ON p.event_type IS NOT DISTINCT FROM s.event_type AND p.i = s.i + 1
                 AND p.i <= {LTTB_K - 2}
        JOIN nexts nx ON nx.event_type IS NOT DISTINCT FROM p.event_type AND nx.i = p.i) t
      WHERE t.rn = 1)
    SELECT event_type, CAST(i AS BIGINT) AS seq,
           CAST(sx AS BIGINT) AS x_rel_us, sy AS value
    FROM sel
    UNION ALL
    SELECT event_type, CAST({LTTB_K - 1} AS BIGINT) AS seq,
           CAST(x AS BIGINT) AS x_rel_us, y AS value
    FROM bk WHERE i = {LTTB_K - 1}
    UNION ALL
    SELECT event_type, CAST(j AS BIGINT) AS seq,
           CAST(x AS BIGINT) AS x_rel_us, y AS value
    FROM pts WHERE n <= {LTTB_K}
    """,
    doc=f"LTTB downsampling to {LTTB_K} points per event-type series: "
    "visually-lossless compaction (keeps the extremes a bucket-mean "
    "downsample erases) — Spark folds the bucket array; the oracle derives "
    "the same march independently via a recursive CTE",
)
def ts_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets (Steinarsson 2013) — THE
    dashboard downsampler: a 10^9-point series becomes K points that
    still show every spike, because each bucket keeps the point
    maximizing the triangle area with the previously kept point and
    the next bucket's centroid. That chain is sequential by
    definition, which is why generic engines don't ship it; here the
    sequential part runs over the K-2 BUCKET summaries per series
    (a calendar/K-bounded array), never the raw points: one corpus
    scan buckets and summarizes map-side (decimal-exact centroids),
    and the fold walks 22 buckets each holding only its own point
    list (n/K points). x is re-based to micros-from-series-start so
    every centroid stays under 2^53 for the one decimal->double cast
    (the conversion class). Selection ties break (area, x, y)-max on
    both engines; the oracle twin is an INDEPENDENT derivation — a
    recursive CTE marching bucket i -> i+1 with a ROW_NUMBER argmax —
    so a fold bug cannot self-confirm. Series with n <= K pass
    through unsampled (both engines' third branch)."""
    K = LTTB_K
    e = finite_measures(timestamped(load_table(spark, sf_dir, "events")), "value", keep_nulls=False)
    p0 = e.select("event_type", F.unix_micros(F.col("ts")).alias("xa"), F.col("value").alias("y"))
    # Distributed rank (ranks.py, round-5): the former PARTITION BY
    # event_type windows (min/count/row_number) each shipped a whole
    # series to one task. grouped_rank orders by (xa, y) — identical
    # ordering to the old (x, y) since x = xa - min(xa) is a per-group
    # monotone shift — and min(xa) is just the rank-1 row, broadcast
    # back. n comes with the rank for free.
    from nova_pulsar_spark.operators.ranks import grouped_rank

    ranked = grouped_rank(
        p0, ["event_type"], ["xa", "y"], spark.sparkContext.defaultParallelism
    )
    from nova_pulsar_spark.operators.ranks import nullsafe_equi_join

    mins = ranked.filter(F.col("rn") == 1).select("event_type", F.col("xa").alias("minx"))
    pts = (
        # null-safe: the oracle's MIN/COUNT windows keep a NULL
        # event_type group; a plain equi-join here would drop it
        nullsafe_equi_join(ranked, mins, ["event_type"], broadcast_right=True)
        .select(
            "event_type",
            (F.col("xa") - F.col("minx")).alias("x"),
            "y",
            "n",
            (F.col("rn") - 1).alias("j"),
        )
        .localCheckpoint(eager=False)
    )
    small = pts.filter(F.col("n") <= K).select(
        "event_type",
        F.col("j").cast("bigint").alias("seq"),
        F.col("x").cast("bigint").alias("x_rel_us"),
        F.col("y").alias("value"),
    )
    big = pts.filter(F.col("n") > K)
    bi = (
        F.when(F.col("j") == 0, F.lit(0))
        .when(F.col("j") == F.col("n") - 1, F.lit(K - 1))
        .otherwise(
            F.least(
                F.lit(K - 2),
                1 + F.floor((F.col("j") - 1) * (K - 2) / (F.col("n") - 2)).cast("int"),
            )
        )
    )
    buckets = (
        big.withColumn("i", bi)
        .groupBy("event_type", "i")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(x, y))), s -> struct(s.x AS x, s.y AS y))").alias("pts"),
            (F.sum(F.col("x").cast("decimal(38,0)")).cast("double") / F.count(F.lit(1))).alias("ax"),
            (F.sum(F.col("y").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("ay"),
        )
    )
    wl = W.partitionBy("event_type").orderBy("i")
    buckets = buckets.withColumn("nax", F.lead("ax").over(wl)).withColumn(
        "nay", F.lead("ay").over(wl)
    )
    ser = buckets.groupBy("event_type").agg(
        F.expr("array_sort(collect_list(struct(i, pts, nax, nay)))").alias("bs")
    )
    prev = "element_at(acc, -1)"
    area = (
        f"abs((CAST({prev}.x AS DOUBLE) - b.nax) * (p.y - {prev}.y) "
        f"- (CAST({prev}.x AS DOUBLE) - CAST(p.x AS DOUBLE)) * (b.nay - {prev}.y))"
    )
    pick = f"array_max(transform(b.pts, p -> struct({area} AS a, p.x AS x, p.y AS y)))"
    fold = F.expr(
        f"concat(aggregate(slice(bs, 2, {K} - 2), "
        "array(struct(element_at(element_at(bs, 1).pts, 1).x AS x, "
        "element_at(element_at(bs, 1).pts, 1).y AS y)), "
        f"(acc, b) -> concat(acc, array(struct({pick}.x AS x, {pick}.y AS y)))), "
        f"array(struct(element_at(element_at(bs, {K}).pts, 1).x AS x, "
        f"element_at(element_at(bs, {K}).pts, 1).y AS y)))"
    )
    sampled = ser.select("event_type", F.posexplode(fold).alias("seq", "p")).select(
        "event_type",
        F.col("seq").cast("bigint").alias("seq"),
        F.col("p.x").cast("bigint").alias("x_rel_us"),
        F.col("p.y").alias("value"),
    )
    return sampled.unionByName(small)


@register(
    "ts_drawdown",
    sql="""
    WITH cents AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value)),
    run AS (
      SELECT event_type, c,
             MAX(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM cents),
    dd AS (
      SELECT event_type, MAX({'d': peak - c, 'p': peak}) AS best
      FROM run GROUP BY event_type)
    SELECT event_type,
           CAST(best.d AS BIGINT) AS max_dd_cents,
           CAST(best.p AS BIGINT) AS peak_at_dd_cents,
           CAST(best.d AS DOUBLE) / NULLIF(best.p, 0) AS max_dd_frac
    FROM dd
    """,
    doc="Maximum drawdown per event-type series: running peak via an "
    "ordered window on exact cents, argmax over (drawdown, peak) structs — "
    "the metric-degradation / SLA-regression screen",
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown — the largest peak-to-trough fall — is the
    canonical 'how bad did it get' statistic (SLA regressions, KPI
    slumps, not just portfolios). One ordered-window pass computes
    the running peak in exact cents (deterministic ordering by
    (ts, event_id)); the answer is then a struct-argmax over
    (drawdown, peak) — both integers, so ties resolve identically on
    both engines and the single final division is engine-exact.
    Linear, one shuffle on the series key; the window's running max
    is O(1) per row. Timestamped-rows contract: a non-NULL value on a
    NULL-ts row would otherwise enter the running peak at an
    engine-specific position."""
    e = finite_measures(timestamped(load_table(spark, sf_dir, "events")), "value", keep_nulls=False)
    cents = e.select(
        "event_type", "ts", "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    )
    # distributed running max (ranks.py grouped_prefix): the former
    # per-series window shipped each event_type's full history to one
    # task; the range-partitioned high-water mark has no such ceiling
    from nova_pulsar_spark.operators.ranks import grouped_prefix

    run = grouped_prefix(
        cents,
        ["event_type"],
        ["ts", "event_id"],
        spark.sparkContext.defaultParallelism,
        maxes={"peak": "c"},
    )
    dd = run.groupBy("event_type").agg(
        F.max(F.struct((F.col("peak") - F.col("c")).alias("d"), F.col("peak").alias("p"))).alias(
            "best"
        )
    )
    return dd.select(
        "event_type",
        F.col("best.d").cast("bigint").alias("max_dd_cents"),
        F.col("best.p").cast("bigint").alias("peak_at_dd_cents"),
        (F.col("best.d").cast("double") / F.nullif(F.col("best.p"), F.lit(0))).alias(
            "max_dd_frac"
        ),
    )
