"""Join surface: inner/left/full/semi/anti/cross + multiway star join.

Reference parity: every reference join is an equi- or theta-join over
tiny keyed record sets — marker↔status enrichment
(`hooks/status-tracker.sh:72-78`), pid lookup
(`hooks/status-tracker.sh:46-69`), plan↔board MERGE
(`commands/pulsar.md:160-165`), dependency overlap self-join
(`agents/orbiter.md:57-62`). Queue-domain renditions live in
:mod:`nova_pulsar_spark.plans.queue_queries`; this module carries the
general join surface on the analytic tables (SURVEY.md §2.3 notes the
engine exposes Spark's full join family since the oracle exercises it).

Scale notes:
- dimension sides (region/nation/supplier/part/customer at TPC-H
  ratios) are broadcast explicitly — no shuffle of the fact table;
- fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE
  handles skew splitting. At 100 TB the win is bucketing both fact
  tables on orderkey at write time, which this layout anticipates
  (co-partitioned single-key joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


@register(
    "join_inner",
    sql="""
    SELECT
      o.o_orderkey,
      o.o_orderdate,
      CAST(SUM(CAST(ROUND((l.l_extendedprice * (1.0 - l.l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000 AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    doc="Fact-fact inner equi-join + aggregate (shuffle join, AQE-managed)",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nova_pulsar_spark.functions.exact import sum_cents

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            sum_cents(revenue, 1_000_000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_left",
    sql="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000.0
    """,
    doc="Left outer join with ON-clause filter on the right side",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000.0), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0
    )
    """,
    doc="Left-semi join (EXISTS) — reference P1 dependency-satisfied shape",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49.0)
    return o.join(l, o.o_orderkey == l.l_orderkey, "left_semi").select("o_orderkey", "o_totalprice")


@register(
    "join_anti",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    doc="Left-anti join (NOT EXISTS) — reference U3 eligible-set-minus shape",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_full_outer",
    sql="""
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS n_big FROM orders
      WHERE o_totalprice > 350000.0 GROUP BY o_custkey
    ),
    urgent AS (
      SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    )
    SELECT
      COALESCE(b.o_custkey, u.o_custkey) AS custkey,
      b.n_big, u.n_urgent
    FROM big b FULL OUTER JOIN urgent u ON b.o_custkey = u.o_custkey
    """,
    doc="Full outer join of two disjoint-ish aggregates",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 350000.0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    b, u = big.alias("b"), urgent.alias("u")
    return b.join(u, F.col("b.o_custkey") == F.col("u.o_custkey"), "full_outer").select(
        F.coalesce(F.col("b.o_custkey"), F.col("u.o_custkey")).alias("custkey"),
        "n_big",
        "n_urgent",
    )


@register(
    "join_multiway_star",
    sql="""
    SELECT
      r.r_name AS region_name,
      n.n_name AS nation_name,
      CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
    doc="TPC-H-Q5-shaped star join: broadcast dims, one fact shuffle",
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # Dims are broadcast: the 100 TB fact side never shuffles for them;
    # the only wide exchange is lineitem⋈orders on orderkey.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(revenue.cast("decimal(22,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_cross",
    sql="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE r.r_regionkey <> n.n_regionkey
    """,
    doc="Cross join (tiny × tiny) with theta filter",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).filter(F.col("r_regionkey") != F.col("n_regionkey")).select(
        "r_name", "n_name"
    )


@register(
    "join_theta_range",
    sql="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
    """,
    doc="Equi + range theta join (reference J4 files-overlap + created< shape)",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal)
    ).select("s_suppkey", "s_name", "c_custkey")


INTERVAL_DAYS = 3
_BIN_SECONDS = INTERVAL_DAYS * 86400


@register(
    "join_interval_binned",
    sql=f"""
    SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_shipped_in_window
    FROM orders o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL {INTERVAL_DAYS} DAY
    GROUP BY o.o_orderkey
    """,
    doc="Binned interval join: point-in-interval with NO equi key, rewritten as "
    "an equi-join on time bins + residual filter (the scalable form of a range "
    "join Spark lacks natively) — count of corpus-wide shipments inside each "
    "order's 3-day window",
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A raw `ts BETWEEN start AND end` join has no equi key → Spark
    would plan BroadcastNestedLoopJoin (OOM on big-big) or refuse.
    The binned rewrite: bin width = interval length, so every interval
    spans ≤2 bins and every point exactly 1; explode intervals to
    their bins, hash-join on the bin, then apply the exact residual.
    Join fan-out is bounded by per-bin density × 2, shuffle is
    bin-keyed — linear, skew-managed by AQE like any hash join. The
    DuckDB twin states the same join declaratively (its optimizer
    runs an IEJoin — the single-node luxury Spark's distributed
    setting replaces with binning).
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    e_start = F.unix_timestamp("o_orderdate")
    b_start = F.floor(e_start / _BIN_SECONDS)
    # end-exclusive window of exactly one bin width → last covered
    # second is e_start + W - 1
    b_end = F.floor((e_start + _BIN_SECONDS - 1) / _BIN_SECONDS)
    intervals = o.select(
        "o_orderkey",
        "o_orderdate",
        F.explode(F.array_distinct(F.array(b_start, b_end))).alias("bin"),
    )
    points = l.select(
        "l_shipdate", F.floor(F.unix_timestamp("l_shipdate") / _BIN_SECONDS).alias("bin")
    )
    return (
        intervals.join(points, "bin")
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr(f"INTERVAL {INTERVAL_DAYS} DAYS"))
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shipped_in_window"))
    )


N_SALTS = 8


@register(
    "join_salted_skew",
    sql="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, s.s_name
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    """,
    doc="Skew-salted join — provably identical to the plain equi-join "
    "(oracle = unsalted): fact side salted, dim side replicated per salt",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-join rescue when AQE's runtime splitting isn't enough
    (or the engine predates it): a hot join key floods one reducer;
    salting appends `hash(row) % N` to the fact side's key and
    replicates the dimension side N× (one copy per salt), so the hot
    key's rows spread over N reducers. The oracle is the PLAIN join —
    the rewrite must be (and is) result-identical; only the shuffle
    distribution changes. Replication cost = N × |dim|, which is why
    the technique pairs with a small/broadcastable dim or with
    targeted salting of only the detected-hot keys.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    salts = spark.range(N_SALTS).select(F.col("id").cast("int").alias("salt"))
    # fact: deterministic per-row salt (any uniform function works; the
    # row id keeps it stable across retries)
    lf = l.withColumn(
        "salt", F.pmod(F.hash(F.col("l_orderkey"), F.col("l_linenumber")), F.lit(N_SALTS))
    )
    # dim: one replica per salt value
    sr = s.crossJoin(salts)
    return (
        lf.join(
            sr.hint("shuffle_hash"),
            (F.col("s_suppkey") == F.col("l_suppkey")) & (lf["salt"] == sr["salt"]),
        )
        .select("l_orderkey", "l_linenumber", "l_suppkey", "s_name")
    )
