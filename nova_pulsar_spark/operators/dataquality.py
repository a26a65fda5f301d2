"""Data-quality checks for large-scale training-data pipelines:
column profiling, declarative constraint suites, and freshness/lag
reports (Deequ/Great-Expectations-shaped, re-expressed Spark-first).

A 100 TB curation pipeline gates every ingest batch on checks like
these before it reaches dedup/tokenization; the reference's guard
predicates (P3 completed-write guard, P7 fresh-pulse — see
agents/orbiter.md:198-242 for the staleness checks) are the
queue-domain instance of the same idea.

Scale notes:
- ``dq_profile`` long-forms the table with one ``stack`` (map-side,
  no Python) and aggregates once: a single scan + a single shuffle
  keyed by column NAME — at most #columns groups, so the reduce side
  is trivially small no matter the input size. The alternative (one
  wide agg row of ``countDistinct`` per column) triggers Catalyst's
  Expand with the same row multiplication but a far wider row.
- ``dq_constraints`` computes all row-level predicates in ONE scan as
  conditional sums (map-side partial agg -> 1-row exchange); the
  uniqueness and referential checks are the only shuffling members
  and each shuffles the minimal key (pk pair / join key semi-set).
- ``dq_freshness`` is a single groupBy over the event log; lag is
  derived against the global max via a broadcast 1-row cross join,
  not a window over the whole log.

Every ratio divides integer counts once in double — identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import fan_out, finite_measures, load_table, timestamped

# Columns profiled by dq_profile (orders table).
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "dq_profile",
    sql="""
    WITH long AS (
      SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
      UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL SELECT 'o_orderstatus', CAST(o_orderstatus AS VARCHAR) FROM orders
      UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
      UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
      UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders)
    SELECT
      col_name,
      COUNT(*) AS n_rows,
      COUNT(*) - COUNT(v) AS n_null,
      COUNT(DISTINCT v) AS n_distinct,
      CAST(COUNT(v) AS DOUBLE) / COUNT(*) AS completeness
    FROM long
    GROUP BY col_name
    ORDER BY col_name
    """,
    doc="Per-column profile of orders: rows, nulls, distinct count, completeness ratio (single stack scan + one tiny shuffle)",
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile in one pass.

    Values are cast to string ONLY as a per-engine-injective distinct
    key; the strings themselves are never emitted (double/timestamp
    rendering differs across engines, but distinct-ness is preserved
    by either rendering), so counts are exact and portable.
    """
    o = load_table(spark, sf_dir, "orders")
    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS)
    long = o.select(F.expr(f"stack({len(_PROFILE_COLS)}, {pairs}) AS (col_name, v)"))
    return (
        long.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
            (F.count("v").cast("double") / F.count(F.lit(1))).alias("completeness"),
        )
        .orderBy("col_name")
    )


@register(
    "dq_constraints",
    sql="""
    WITH rowlevel AS (
      SELECT
        COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0) AS quantity_range,
        COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END), 0) AS discount_range,
        COALESCE(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), 0) AS shipdate_not_null,
        COALESCE(SUM(CASE WHEN l_linenumber < 1 THEN 1 ELSE 0 END), 0) AS linenumber_positive,
        COALESCE(SUM(CASE WHEN l_linestatus NOT IN ('O', 'F') OR l_linestatus IS NULL THEN 1 ELSE 0 END), 0) AS status_domain
      FROM lineitem),
    pk AS (
      SELECT COUNT(*) - COUNT(DISTINCT l_orderkey * 1000 + l_linenumber) AS pk_unique FROM lineitem),
    fk AS (
      SELECT COUNT(*) AS fk_orders FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
    u AS (
      SELECT 'quantity_range' AS constraint_name, quantity_range AS violations FROM rowlevel
      UNION ALL SELECT 'discount_range', discount_range FROM rowlevel
      UNION ALL SELECT 'shipdate_not_null', shipdate_not_null FROM rowlevel
      UNION ALL SELECT 'linenumber_positive', linenumber_positive FROM rowlevel
      UNION ALL SELECT 'status_domain', status_domain FROM rowlevel
      UNION ALL SELECT 'pk_unique', pk_unique FROM pk
      UNION ALL SELECT 'fk_orders', fk_orders FROM fk)
    SELECT constraint_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM u ORDER BY constraint_name
    """,
    doc="Declarative constraint suite over lineitem: range/domain/null checks in one scan, pk-uniqueness, fk referential integrity (anti join)",
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite -> (constraint_name, violations, passed).

    Row-level predicates share ONE scan (conditional sums, map-side
    partial agg). The pk check counts surplus rows over distinct
    (orderkey, linenumber) pairs via an injective integer fusion
    (linenumber < 1000 by schema), the fk check is a left-anti join
    on the minimal key. At 100 TB each piece shuffles either one row
    or the bare key set.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def cnt(pred) -> F.Column:
        return F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))

    rowlevel = l.agg(
        cnt((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias("quantity_range"),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias("discount_range"),
        cnt(F.col("l_shipdate").isNull()).alias("shipdate_not_null"),
        cnt(F.col("l_linenumber") < 1).alias("linenumber_positive"),
        cnt(~F.col("l_linestatus").isin("O", "F") | F.col("l_linestatus").isNull()).alias(
            "status_domain"
        ),
    )
    pk = l.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(F.col("l_orderkey") * 1000 + F.col("l_linenumber"))
        ).alias("pk_unique")
    )
    fk = (
        l.join(o.select("o_orderkey"), l.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orders"))
    )

    def unpivot(df: DataFrame, names: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{n}', {n}" for n in names)
        return df.select(
            F.expr(f"stack({len(names)}, {pairs}) AS (constraint_name, violations)")
        )

    u = (
        unpivot(
            rowlevel,
            [
                "quantity_range",
                "discount_range",
                "shipdate_not_null",
                "linenumber_positive",
                "status_domain",
            ],
        )
        .unionAll(unpivot(pk, ["pk_unique"]))
        .unionAll(unpivot(fk, ["fk_orders"]))
    )
    return u.select(
        "constraint_name",
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("constraint_name")


@register(
    "dq_freshness",
    sql="""
    WITH g AS (SELECT MAX(ts) AS global_max FROM events),
    per AS (
      SELECT event_type,
             COUNT(*) AS n_events,
             MIN(ts) AS first_ts,
             MAX(ts) AS last_ts,
             COUNT(DISTINCT CAST(ts AS DATE)) AS days_active
      FROM events GROUP BY event_type)
    SELECT p.event_type, p.n_events, p.first_ts, p.last_ts, p.days_active,
           CAST(date_diff('second', p.last_ts, g.global_max) AS BIGINT) AS lag_behind_s
    FROM per p CROSS JOIN g
    ORDER BY p.event_type
    """,
    doc="Per-event-type freshness report: volume, first/last seen, active days, lag behind the newest event (broadcast 1-row global max)",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/lag per event type.

    The global high-water mark is a 1-row aggregate broadcast into
    the per-type report — no window over the full log, so the only
    full-data shuffle is the per-type groupBy itself.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("global_max"))
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.countDistinct(F.col("ts").cast("date")).alias("days_active"),
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            "first_ts",
            "last_ts",
            "days_active",
            (F.unix_timestamp("global_max") - F.unix_timestamp("last_ts"))
            .cast("bigint")
            .alias("lag_behind_s"),
        )
        .orderBy("event_type")
    )


# Canonical per-row serialization for the checksum: integers as-is,
# doubles integer-scaled (cents), timestamps formatted — every piece
# renders identically on both engines.
# Every piece is COALESCEd to a sentinel: concat_ws SKIPS bare NULLs
# on both engines, which would make ('a', NULL, 'b') and ('a', 'b',
# NULL) collide — a NULL sliding between columns must flip the hash.
_CANON_PIECES = [
    "CAST(l_orderkey AS {S})",
    "CAST(l_partkey AS {S})",
    "CAST(l_suppkey AS {S})",
    "CAST(l_linenumber AS {S})",
    "CAST(CAST(ROUND(l_quantity, 0) AS BIGINT) AS {S})",
    "CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS {S})",
    "CAST(CAST(ROUND(l_discount * 1000, 0) AS BIGINT) AS {S})",
    "CAST(CAST(ROUND(l_tax * 1000, 0) AS BIGINT) AS {S})",
    "l_returnflag",
    "l_linestatus",
    "{TS}",
]


def _canon(str_type: str, ts_expr: str) -> str:
    pieces = ", ".join(
        f"COALESCE({p.format(S=str_type, TS=ts_expr)}, '~null~')" for p in _CANON_PIECES
    )
    return f"concat_ws('|', {pieces})"


_CANON_SPARK = _canon("STRING", "date_format(l_shipdate, 'yyyy-MM-dd HH:mm:ss')")
_CANON_SQL = _canon("VARCHAR", "strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')")


@register(
    "dq_checksum",
    sql=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(concat('0x', substring(md5({_CANON_SQL}), 1, 15))
                         AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Order-independent table checksum: canonical row serialization -> "
    "60-bit md5 -> exact decimal SUM per partition-ish group. The "
    "cross-environment 'did the migration/copy preserve every row' "
    "primitive — one scan, map-side combinable, no sort anywhere",
)
def dq_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-hash SUM (not XOR-fold of an ordered stream) makes the
    fingerprint independent of row order and partitioning — two
    environments compare one tiny result frame instead of 100 TB of
    rows, and a per-group breakdown localizes any mismatch. Doubles
    enter the canonical string integer-scaled and timestamps
    formatted, because raw float/timestamp rendering is
    engine-specific; the 60-bit hash keeps the per-row value inside
    a BIGINT while DECIMAL(38,0) absorbs the sum exactly at any row
    count. Swapping any row cell flips the checksum with probability
    1 - 2^-60."""
    # r12: the testdata scan is one row group = ONE task and the md5
    # stream is this query's entire cost — spread the rows first
    # (fan_out is layout-derived: no-op when the scan splits itself).
    l = fan_out(spark, load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem")
    # Two short convs (8 + 7 hex chars, both inside long math) instead
    # of one 15-char conv: conv's cost grows superlinearly with digit
    # count, and hi*2^28 + lo is bit-identical to the single parse
    # (measured ~1.5x faster end-to-end on the serial local scan).
    # r12: the digest is projected ONCE per row below the aggregate —
    # inlined, both conv operands re-hash the canonical string, and the
    # multi-use non-cheap alias keeps CollapseProject from re-inlining.
    h = l.select("l_returnflag", F.expr(f"md5({_CANON_SPARK})").alias("_dig"))
    row_hash = F.expr(
        "CAST(conv(substring(_dig, 1, 8), 16, 10) AS BIGINT) * 268435456L"
        " + CAST(conv(substring(_dig, 9, 7), 16, 10) AS BIGINT)"
    )
    return (
        h.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(row_hash.cast("decimal(38,0)")).cast("string").alias("checksum"),
        )
        .orderBy("l_returnflag")
    )


# --- k-anonymity over quasi-identifiers ------------------------------------

KANON_K = 5  # groups smaller than this are re-identifiable


@register(
    "dq_k_anonymity",
    sql=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(MIN(n) AS BIGINT) AS k_anon FROM g)
    SELECT g.c_nationkey, g.c_mktsegment, g.n,
           g.n < {KANON_K} AS at_risk,
           tot.k_anon AS table_k,
           CAST(SUM(CASE WHEN g.n < {KANON_K} THEN g.n ELSE 0 END) OVER () AS BIGINT) AS n_at_risk_rows
    FROM g CROSS JOIN tot
    ORDER BY g.c_nationkey, g.c_mktsegment
    """,
    doc=f"k-anonymity audit: quasi-identifier (nation, segment) group sizes, "
    f"k={KANON_K} risk flags, table-level k and total re-identifiable rows",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy/governance gate for releasing or training on tabular
    data: a record is k-anonymous iff its quasi-identifier combination
    is shared by >= k rows. One groupBy on the QI tuple gives every
    group size; the table-level k (the MIN) and the count of at-risk
    rows ride along via a broadcastable 1-row aggregate and an
    unpartitioned window over the GROUP frame (group-count-sized, not
    row-sized — at 100 TB the window input is |distinct QI| rows, and
    the QI groupBy is an ordinary map-side-combinable shuffle).
    Training-data relevance: the same shape audits PII joinability of
    metadata columns before a corpus release (suppression lists come
    straight from `at_risk` groups)."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # table-level scalars (min group size, at-risk row count) ride ONE
    # 1-row aggregate broadcast back — r5: the at-risk sum moved out of
    # an unpartitioned window over the group frame (|distinct QI| rows
    # can be large for wide quasi-identifiers) into the same aggregate
    tot = g.agg(
        F.min("n").cast("bigint").alias("table_k"),
        F.sum(F.when(F.col("n") < KANON_K, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_at_risk_rows"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n",
            (F.col("n") < KANON_K).alias("at_risk"),
            "table_k",
            "n_at_risk_rows",
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --- Winsorization (per-group exact-quantile outlier clipping) -------------


@register(
    "dq_winsorize",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL),
    b AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (n + 19) // 20 THEN value END) AS p05,
             MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS p95
      FROM ranked GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value IS NULL THEN NULL
                ELSE LEAST(GREATEST(e.value, b.p05), b.p95) END AS value_w,
           COALESCE(e.value < b.p05, FALSE) AS clipped_low,
           COALESCE(e.value > b.p95, FALSE) AS clipped_high
    FROM events e LEFT JOIN b ON b.event_type = e.event_type
    """,
    doc="Winsorization: clip each event's value to its group's exact "
    "[p05, p95] (type-1 rank-arithmetic quantiles), flagging which tail was "
    "clipped — the outlier-robust normalization step feature pipelines run "
    "before aggregation",
)
def dq_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outliers poison means and z-scores; winsorizing to exact
    per-group percentile bounds is the deterministic fix (dropping
    rows changes counts; clipping preserves them). Bounds use the
    quantiles_exact rank idiom — type-1 quantile at ceil(q*n) via
    integer rank arithmetic, NULL values excluded from ranking on both
    engines (ASC NULL placement differs between them) — then broadcast
    back: the bounds table is |group|-sized, so the corpus never
    shuffles; the clip is a map-side LEAST/GREATEST over non-NULL
    inputs (the NULL-argument divergence class never arises). NULL
    values pass through unclipped with both flags false."""
    from nova_pulsar_spark.operators.ranks import nullsafe_equi_join, ranked_events_stage

    e = load_table(spark, sf_dir, "events")
    # Shared materialized rank stage (VERDICT r5 #1). The stage ranks
    # ALL rows with NULLS LAST, so each non-NULL row's stage rank
    # equals its rank among non-NULLs alone — the filter below keeps
    # the ranks valid, and the non-NULL group size is just max(rn)
    # (a |group|-row map-combinable agg instead of a full re-rank).
    r = ranked_events_stage(spark, sf_dir).filter(F.col("value").isNotNull()).drop("n")
    nn = r.groupBy("event_type").agg(F.max("rn").alias("n"))
    r = nullsafe_equi_join(r, nn, ["event_type"], broadcast_right=True)

    def at_rank(num: int):
        target = F.floor((F.lit(num) * F.col("n") + 19) / 20).cast("bigint")
        return F.max(F.when(F.col("rn") == target, F.col("value")))

    b = r.groupBy("event_type").agg(at_rank(1).alias("p05"), at_rank(19).alias("p95"))
    return (
        e.join(F.broadcast(b), "event_type", "left")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(
                F.col("value").isNotNull(),
                F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")),
            ).alias("value_w"),
            F.coalesce(F.col("value") < F.col("p05"), F.lit(False)).alias("clipped_low"),
            F.coalesce(F.col("value") > F.col("p95"), F.lit(False)).alias("clipped_high"),
        )
    )


# --- Benford first-digit drift (fraud / synthetic-data detector) -----------

# log10(1 + 1/d) as literals: log() is not correctly rounded cross-engine,
# so the expected frequencies are compile-time constants, not runtime math.
_BENFORD = {
    "1": 0.3010299956639812, "2": 0.17609125905568124, "3": 0.12493873660829992,
    "4": 0.09691001300805642, "5": 0.07918124604762482, "6": 0.06694678963061322,
    "7": 0.05799194697768673, "8": 0.05115252244738129, "9": 0.04575749056067514,
}
_BENFORD_SQL = "CASE g.digit " + " ".join(
    f"WHEN '{d}' THEN {v!r}" for d, v in _BENFORD.items()
) + " END"


@register(
    "dq_benford",
    sql=f"""
    WITH f AS (
      SELECT event_type,
             regexp_extract(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), '[1-9]') AS digit
      FROM events WHERE value IS NOT NULL AND isfinite(value)),
    g AS (
      SELECT event_type, digit, COUNT(*) AS n_obs
      FROM f WHERE digit <> '' GROUP BY event_type, digit),
    t AS (SELECT event_type, SUM(n_obs) AS n_grp FROM g GROUP BY event_type)
    SELECT g.event_type, g.digit, CAST(g.n_obs AS BIGINT) AS n_obs,
           CAST(g.n_obs AS DOUBLE) / t.n_grp AS obs_frac,
           {_BENFORD_SQL} AS exp_frac,
           CAST(g.n_obs AS DOUBLE) / t.n_grp - {_BENFORD_SQL} AS deviation
    FROM g JOIN t ON t.event_type = g.event_type
    """,
    doc="Benford first-digit audit per group: observed vs expected "
    "log10(1+1/d) leading-digit frequencies (literal constants — log-free at "
    "runtime) — the classic fabricated/synthetic-numeric-data detector",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Organic multiplicative measures follow Benford's law; fabricated
    or template-generated numbers don't — per-group first-digit
    deviation is the cheap screen. The digit comes from the DECIMAL
    rendering (both engines format DECIMAL(18,2) identically — raw
    DOUBLE formatting diverges on scientific notation), first nonzero
    char via the same regex. One count shuffle on (group, digit) with
    map-side combine; totals are a 9-row-per-group rollup; expected
    frequencies are inlined literals so no runtime log(). Negative
    values contribute their magnitude digit (the sign never matches
    [1-9]); zeros carry no leading digit and drop on both engines."""
    # finite-measures contract: the DECIMAL rendering is undefined on
    # NaN/Inf — excluded on both engines
    e = finite_measures(load_table(spark, sf_dir, "events"), "value", keep_nulls=False)
    digit = F.regexp_extract(
        F.col("value").cast("decimal(18,2)").cast("string"), "[1-9]", 0
    )
    g = (
        e
        .select("event_type", digit.alias("digit"))
        .filter(F.col("digit") != "")
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = g.groupBy("event_type").agg(F.sum("n_obs").alias("n_grp"))
    exp_frac = F.lit(None).cast("double")
    for d, v in _BENFORD.items():
        exp_frac = F.when(F.col("digit") == d, F.lit(v)).otherwise(exp_frac)
    obs = F.col("n_obs").cast("double") / F.col("n_grp")
    return (
        g.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "digit",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            obs.alias("obs_frac"),
            exp_frac.alias("exp_frac"),
            (obs - exp_frac).alias("deviation"),
        )
    )


# --- Referential-integrity orphan audit (whole-schema FK sweep) -------------

# (edge label, child table, fk column, parent table, pk column)
_FK_EDGES = (
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _fk_edge_sql(edge: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{edge}' AS fk_edge,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(cnt) FILTER (WHERE k IS NULL), 0) AS BIGINT) AS n_null_fk,
           CAST(COALESCE(SUM(cnt) FILTER (WHERE k IS NOT NULL AND NOT hit), 0) AS BIGINT)
             AS n_orphans,
           CAST(COALESCE(SUM(cnt) FILTER (WHERE k IS NOT NULL AND NOT hit), 0) AS DOUBLE)
             / NULLIF(SUM(cnt) FILTER (WHERE k IS NOT NULL), 0) AS orphan_frac
    FROM (SELECT {fk} AS k, COUNT(*) AS cnt,
                 EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = {fk}) AS hit
          FROM {child} GROUP BY {fk})"""


@register(
    "dq_referential",
    sql="\n    UNION ALL\n".join(_fk_edge_sql(*e) for e in _FK_EDGES),
    doc="Referential-integrity audit over every FK edge of the star schema: "
    "per-edge child rows, NULL FKs, orphan count and orphan fraction — the "
    "batch-ingest gate that catches partial loads before they poison joins",
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A partial parent-table load silently turns inner joins into row
    drops; this audit measures every FK edge in one sweep. Scale shape
    per edge: the child collapses to (fk, count) FIRST — a map-side-
    combinable groupBy whose reduce side is keyed by distinct FK
    values, not rows — then a left join against the parent's pk column
    (Spark dedups the build side via the aggregate; parent pks are
    unique anyway) and a 1-row rollup. The 100 TB child table never
    moves: only its distinct-key census does. NULL FKs are counted,
    never treated as orphans (ANSI: NULL fails no FK)."""
    outs = []
    for edge, child, fk, parent, pk in _FK_EDGES:
        c = (
            load_table(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        j = c.join(p.withColumn("hit", F.lit(True)), "k", "left").withColumn(
            "hit", F.coalesce(F.col("hit"), F.lit(False))
        )
        nonnull = F.col("k").isNotNull()
        orphan = F.sum(F.when(nonnull & ~F.col("hit"), F.col("cnt")))
        outs.append(
            j.agg(
                F.lit(edge).alias("fk_edge"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.coalesce(F.sum(F.when(~nonnull, F.col("cnt"))), F.lit(0))
                .cast("bigint")
                .alias("n_null_fk"),
                F.coalesce(orphan, F.lit(0)).cast("bigint").alias("n_orphans"),
                (
                    F.coalesce(orphan, F.lit(0)).cast("double")
                    / F.nullif(F.sum(F.when(nonnull, F.col("cnt"))), F.lit(0))
                ).alias("orphan_frac"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


DRIFT_BIN_W = 10  # fixed-width value bins


@register(
    "dq_drift",
    sql=f"""
    WITH base AS (
      SELECT event_type, ts, value,
             CAST(FLOOR(value / {DRIFT_BIN_W}) AS BIGINT) AS bin
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL AND isfinite(value)),
    bounds AS (
      SELECT event_type, MIN(ts) AS t0, MAX(ts) AS t1 FROM base GROUP BY event_type),
    tagged AS (
      SELECT b.event_type, b.bin,
             CASE WHEN epoch_us(b.ts) * 2 < epoch_us(bo.t0) + epoch_us(bo.t1)
                  THEN 1 ELSE 0 END AS early
      FROM base b JOIN bounds bo ON bo.event_type = b.event_type),
    h AS (
      SELECT event_type, bin,
             SUM(early) AS ca, SUM(1 - early) AS cb
      FROM tagged GROUP BY event_type, bin),
    tot AS (
      SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM h GROUP BY event_type)
    SELECT h.event_type,
           CAST(tot.na AS BIGINT) AS n_early, CAST(tot.nb AS BIGINT) AS n_late,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(ABS(h.ca * tot.nb - h.cb * tot.na)) AS DOUBLE)
             / NULLIF(2.0 * tot.na * tot.nb, 0) AS tv_distance
    FROM h JOIN tot ON tot.event_type = h.event_type
    GROUP BY h.event_type, tot.na, tot.nb
    """,
    doc=f"Distribution drift per event type: total-variation distance "
    f"between the early-half and late-half value histograms (width-"
    f"{DRIFT_BIN_W} bins) — integer numerator Sum|ca*nb - cb*na|, one exact "
    "division; the feature-drift alarm for training snapshots",
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the metric's DISTRIBUTION move between the first and second
    half of the window — the drift alarm that row counts and means
    miss (a mean-preserving variance explosion is invisible to
    dq_freshness/profile). Split point is the per-series time
    midpoint (computed from exact epoch integers — `2*ts < t0+t1`
    avoids both a float midpoint and an interval division); the
    histogram is fixed-width bins, so the drift statistic is
    TV = 1/2 Σ |p_early − p_late| computed with an INTEGER
    numerator Σ|ca·nb − cb·na| and one final division — exact on
    both engines without any fixed-point machinery (NULL, not a
    raise, when a degenerate series lands entirely in one half —
    the ANSI 0-div class). One corpus scan
    plus a bin-bounded groupBy; the bounds join broadcasts
    (one row per type). PSI needs ln and is deliberately NOT here —
    the engine-divergent-log class; TV and the companion
    `agg_chi_square` cover the same alarm surface log-free."""
    # finite-measures contract: FLOOR-binning is undefined on NaN/Inf
    e = finite_measures(
        timestamped(load_table(spark, sf_dir, "events")), "value", keep_nulls=False
    )
    base = e.select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("tus"),
        F.floor(F.col("value") / DRIFT_BIN_W).cast("bigint").alias("bin"),
    )
    bounds = base.groupBy("event_type").agg(
        F.min("tus").alias("t0"), F.max("tus").alias("t1")
    )
    tagged = base.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "bin",
        F.when(F.col("tus") * 2 < F.col("t0") + F.col("t1"), F.lit(1)).otherwise(F.lit(0)).alias("early"),
    )
    h = tagged.groupBy("event_type", "bin").agg(
        F.sum("early").alias("ca"), F.sum(F.lit(1) - F.col("early")).alias("cb")
    )
    h = h.localCheckpoint(eager=False)  # totals + the distance aggregate
    tot = h.groupBy("event_type").agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = h.join(F.broadcast(tot), "event_type")
    return j.groupBy("event_type", "na", "nb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        (
            F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).cast("double")
            / F.nullif(2.0 * F.col("na") * F.col("nb"), F.lit(0.0))
        ).alias("tv_distance"),
    ).select(
        "event_type",
        F.col("na").cast("bigint").alias("n_early"),
        F.col("nb").cast("bigint").alias("n_late"),
        "n_bins",
        "tv_distance",
    )
