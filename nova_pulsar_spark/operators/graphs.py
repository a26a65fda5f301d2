"""Graph analytics over relational co-occurrence: triangle counting
and the global clustering coefficient via degree-ordered orientation.

The graph is the part co-purchase graph — parts are vertices, an edge
joins two parts that appear in the same order. It is derived, not
stored: a 100 TB lineitem table yields it in two bounded shuffles.
Dup-cluster density, co-citation analysis, and feature-co-occurrence
audits all reduce to exactly this triangle/wedge census.

Scale design (the "forward"/degree-ordering algorithm, Schank &
Wagner 2005; also Suri & Vassilvitskii's MapReduce variant, WWW'11):
a naive wedge join explodes on hub vertices — sum(deg^2) is quadratic
in the worst case. Orienting every edge from its lower-(degree, id)
endpoint to its higher one caps every out-degree at O(sqrt(m)), so
the wedge join is bounded by m^1.5 TOTAL regardless of skew — the
textbook bound, achieved here with nothing but groupBy/join (no
custom partitioner needed; AQE handles residual key skew). The
basket pair-generation is capped per order (MAX_BASKET, mirrored in
the oracle twin) following the repo-wide rule that every blocking
key needs a cap or a ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table

# Per-order basket cap: TPC-H baskets hold <= 7 parts, but adversarial
# fixtures (and real carts) can be huge — pair-gen is quadratic in
# basket size, so keep the first MAX_BASKET parts by partkey.
MAX_BASKET = 32


@register(
    "graph_triangles",
    sql=f"""
    WITH basket AS (
      SELECT o, p FROM (
        SELECT l_orderkey AS o, l_partkey AS p,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
              WHERE l_partkey IS NOT NULL))
      WHERE rn <= {MAX_BASKET}),
    edges AS (
      SELECT DISTINCT b1.p AS a, b2.p AS b
      FROM basket b1 JOIN basket b2 ON b1.o = b2.o AND b1.p < b2.p),
    deg AS (
      SELECT v, COUNT(*) AS d
      FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
      GROUP BY v),
    oriented AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.a ELSE e.b END AS src,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.b ELSE e.a END AS dst,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN db.d ELSE da.d END AS dst_deg
      FROM edges e
      JOIN deg da ON da.v = e.a
      JOIN deg db ON db.v = e.b),
    tri AS (
      SELECT COUNT(*) AS t FROM (
        SELECT e1.dst AS b, e2.dst AS c
        FROM oriented e1 JOIN oriented e2
          ON e1.src = e2.src
         AND (e1.dst_deg < e2.dst_deg
              OR (e1.dst_deg = e2.dst_deg AND e1.dst < e2.dst))) w
      JOIN oriented o ON o.src = w.b AND o.dst = w.c),
    es AS (SELECT COUNT(*) AS n_edges FROM edges),
    ns AS (SELECT COUNT(*) AS n_nodes, SUM((d * (d - 1)) // 2) AS n_wedges FROM deg)
    SELECT CAST(ns.n_nodes AS BIGINT) AS n_nodes,
           CAST(es.n_edges AS BIGINT) AS n_edges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           CAST(ns.n_wedges AS BIGINT) AS n_wedges,
           CAST(3 * tri.t AS DOUBLE) / NULLIF(ns.n_wedges, 0) AS global_clustering
    FROM tri CROSS JOIN es CROSS JOIN ns
    """,
    doc="Triangle count + global clustering coefficient of the part "
    "co-purchase graph via degree-ordered orientation (forward algorithm): "
    "every out-degree capped at O(sqrt(m)), wedge join bounded m^1.5 even "
    "under hub skew; per-order basket capped at "
    f"{MAX_BASKET} parts",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles/clustering measure how clumpy a co-occurrence graph
    is (dup-cluster density, community structure). The naive count —
    join edges twice and close the wedge — is quadratic at hubs. The
    fix is pure plan shape: orient each edge from its lower-(deg, id)
    endpoint; each wedge (a->b, a->c) is then generated exactly once
    at its lowest-ranked vertex, whose OUT-degree is provably
    O(sqrt(m)); the Spark side then counts each triangle once at its
    base edge as |N+(src) ∩ N+(dst)| over grouped out-adjacency
    arrays (compact-forward) — same O(m^1.5) work as the wedge join
    the oracle twin spells out, but it shuffles m bounded arrays
    instead of the sum-outdeg² wedge stream. Five bounded stages:
    capped per-order pair-gen (MAX_BASKET keeps the quadratic
    in-basket step constant-bounded), edge distinct (one shuffle on
    the 16-byte pair), degree groupBy, two endpoint joins, adjacency
    intersect. Everything integer until the final
    clustering division; counts are partitioning-independent, so both
    engines agree bit-exactly."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey").isNotNull())
    # One shuffle to capped sorted baskets (collect_set dedups in the
    # aggregate — same parts as the twin's ROW_NUMBER <= cap over
    # DISTINCT pairs ordered by partkey), then MAP-SIDE pair explosion:
    # no basket self-join, no second pass over lineitem.
    baskets = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.expr(f"slice(array_sort(collect_set(l_partkey)), 1, {MAX_BASKET})").alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, greatest(size(ps) - i - 1, 0)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("e")
    )
    # Three consumers (degree census, orientation join, edge count) —
    # checkpoint so the pair-gen runs once, not per consumer.
    edges = pairs.select("e.a", "e.b").distinct().localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    # Three consumers again (both wedge sides + the closing probe).
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    # Compact-forward: each triangle is counted once at its base edge
    # (src, dst) as |N+(src) ∩ N+(dst)|. Equivalent count to the wedge
    # join (the oracle twin keeps that formulation — values, not plans,
    # must match), but it ships m adjacency-array rows instead of the
    # sum-outdeg² wedge stream (41M rows vs 1.2M at sf0.1, 5.4 s → ~2 s).
    # collect_list is safe: orientation bounds every out-list at
    # O(sqrt(m)) elements, the same bound that caps the intersect work.
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    # The intersect stage is CPU-dense but byte-light (sum-outdeg² element
    # comparisons over ~24-byte rows), so AQE's byte-based coalescing
    # squeezes it onto 3-4 tasks at sf0.1 (measured 1.70 s -> 0.53 s with
    # an explicit core-count fan-out). Pin the join width to the cluster's
    # parallelism; at real scale the byte heuristic takes over anyway.
    width = spark.sparkContext.defaultParallelism
    tri = (
        oriented.select("src", "dst")
        .repartition(width, "src")
        .join(adj, "src")
        .join(
            adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_dst")),
            "dst",
        )
        .select(F.size(F.array_intersect("nbrs", "nbrs_dst")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("t"))
    )
    es = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    ns = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("bigint").alias("n_wedges"),
    )
    return (
        tri.crossJoin(F.broadcast(es))
        .crossJoin(F.broadcast(ns))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            "n_wedges",
            ((F.lit(3) * F.col("t")).cast("double") / F.nullif(F.col("n_wedges"), F.lit(0))).alias(
                "global_clustering"
            ),
        )
    )
