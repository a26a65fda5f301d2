"""Sort / limit / top-k surface.

Reference parity: best-plan top-1 selection (`agents/orbiter.md:85-89`
— sort by priority then created, take first), latest-queued default
(`commands/pulsar.md:99-101`), bounded listings (head -5). The
queue-domain renditions live in
:mod:`nova_pulsar_spark.plans.queue_queries`; here is the general
family (SURVEY.md §2.5) with deterministic tie-breaks — a LIMIT
without a total order is nondeterministic in any engine, so every
top-k orders by a unique key suffix.

Scale notes: global top-k in Spark is TakeOrderedAndProject — each
partition keeps k rows, the driver merges #partitions × k, no global
sort. Per-group top-k is a rank-filter window, shuffling once on the
group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table, timestamped


@register(
    "topk_global",
    sql="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-10 (TakeOrderedAndProject — no full sort)",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@register(
    "topk_per_group",
    sql="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) t WHERE rn <= 3
    """,
    doc="Top-3 per group via rank filter (O1 per-project variant)",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per segment via the two-stage head (ranks.grouped_head):
    c_mktsegment has 5 values, so the former `PARTITION BY` window
    shipped a fifth of all customers to one task at any scale; the
    two-stage head takes the local top-3 per input partition first —
    the global top-3 is always inside that union — and ranks only the
    3 x partitions survivors per group exactly."""
    from nova_pulsar_spark.operators.ranks import grouped_head

    c = load_table(spark, sf_dir, "customer")
    return grouped_head(
        c, ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 3
    ).select("c_mktsegment", "c_custkey", "c_acctbal", "rn")


@register(
    "topk_latest",
    sql="""
    SELECT event_id, user_id, ts, event_type
    FROM events
    WHERE ts IS NOT NULL
    ORDER BY ts DESC, event_id
    LIMIT 5
    """,
    doc="Most-recent-N (O2 latest-queued-plan shape)",
)
def topk_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamped-rows contract: "latest" is undefined for NULL ts and
    # the engines disagree on NULL sort placement
    e = timestamped(load_table(spark, sf_dir, "events"))
    return (
        e.orderBy(F.col("ts").desc(), "event_id")
        .limit(5)
        .select("event_id", "user_id", "ts", "event_type")
    )


@register(
    "topk_best_per_key_argmax",
    sql="""
    SELECT user_id,
           ARG_MAX(event_id, value) AS best_event,
           CAST(MAX(value) AS DOUBLE) AS best_value
    FROM events
    GROUP BY user_id
    """,
    doc="Top-1 per key as argmax — cheaper than a window when k=1",
)
def topk_best_per_key_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k=1 top-k degenerates to max_by: a hash aggregate (one shuffle,
    # map-side combinable) instead of a sort window — the plan we'd
    # want at 100 TB for O1-style "best plan per project".
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_id", "value").alias("best_event"),
        F.max("value").cast("double").alias("best_value"),
    )


@register(
    "topk_skyline",
    sql="""
    WITH p AS (
      SELECT p_partkey, p_retailprice, p_size FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL)
    SELECT a.p_partkey, a.p_retailprice AS price, a.p_size AS size
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
    doc="2D skyline (Pareto frontier): parts not dominated on "
    "(min retail price, max size) — sort-based O(n log n) running-max "
    "plan vs the oracle's independent O(n^2) NOT-EXISTS derivation",
)
def topk_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier selection — the multi-criteria cousin of top-k
    (Borzsony/Kossmann/Stocker's SKYLINE OF, ICDE'01): keep rows no
    other row beats on every dimension at once (here: cheaper AND
    bigger part). The naive formulation the oracle twin uses — a
    dominance NOT EXISTS — is an all-pairs theta join, quadratic and
    un-shippable at 100 TB. For 2 dimensions there is a sort-based
    plan that is pure window algebra: group rows by price, take each
    price group's max size, and a row is dominated iff
      (a) some STRICTLY cheaper price group reaches its size
          (running max over the price-sorted group spine — that row
          dominates via strict price), or
      (b) its OWN price group holds a strictly larger size (dominates
          via strict size at equal price).
    Exact duplicates on both dims tie and both survive, matching the
    strict-somewhere dominance definition. Cost: one groupBy(price)
    (map-side combinable to |distinct price| rows), a 1-column
    running-max window over that compact spine, and one equi-join
    back on price — O(n log n), no pair blow-up, skew-immune (the
    heaviest price group still contributes one spine row). No
    broadcast hint on the join-back: with a CONTINUOUS price dim the
    spine approaches corpus cardinality, so AQE picks broadcast only
    when the spine actually is small. The window's single global
    ordering runs over the spine, not the corpus — at 100 TB you'd
    range-partition the spine; the corpus itself never global-sorts."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .select("p_partkey", F.col("p_retailprice").alias("price"), F.col("p_size").alias("size"))
    )
    spine = p.groupBy("price").agg(F.max("size").alias("gmax"))
    hwm = spine.select(
        "price",
        "gmax",
        F.max("gmax")
        .over(W.orderBy("price").rowsBetween(W.unboundedPreceding, -1))
        .alias("cheaper_hwm"),
    )
    return (
        p.join(hwm, "price")
        .filter(
            (F.col("cheaper_hwm").isNull() | (F.col("cheaper_hwm") < F.col("size")))
            & (F.col("size") == F.col("gmax"))
        )
        .select("p_partkey", "price", "size")
    )
