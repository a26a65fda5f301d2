"""Supplementary operator surface: string distance, unpivot, lateral
explode, distribution ranks, date arithmetic — rounding out the
"complete engine" claim beyond SURVEY §2's minimum.

All oracle-checked; cume_dist/percent_rank divisions are exact
(small-integer ratios identical in IEEE across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table


@register(
    "fn_string_distance",
    sql="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.source, b.source) AS BIGINT) AS src_edit_dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND b.doc_id = a.doc_id + 1
    """,
    doc="Levenshtein edit distance (fuzzy matching primitive for dedup pipelines)",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("la"), F.col("source").alias("sa"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lb"), F.col("source").alias("sb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("doc_b") == F.col("doc_a") + 1))
        .select("doc_a", "doc_b", F.levenshtein("sa", "sb").cast("bigint").alias("src_edit_dist"))
    )


@register(
    "reshape_unpivot",
    sql="""
    SELECT l_orderkey, l_linenumber, k AS measure, CAST(v AS DOUBLE) AS val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (v FOR k IN (l_quantity, l_extendedprice, l_discount))
    """,
    doc="Unpivot / melt wide→long (stack)",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, 'l_discount', l_discount) AS (measure, val)",
    ).select("l_orderkey", "l_linenumber", "measure", F.col("val").cast("double").alias("val"))


@register(
    "lateral_explode_tokens",
    sql="""
    SELECT doc_id, t.token, CAST(length(t.token) AS BIGINT) AS token_len
    FROM documents, UNNEST(string_split(substr(text, 1, 40), ' ')) AS t(token)
    WHERE doc_id < 20
    """,
    doc="Lateral view / generator: per-row token explosion",
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.explode(F.split(F.substring("text", 1, 40), " ")).alias("token")
    ).select("doc_id", "token", F.length("token").cast("bigint").alias("token_len"))


@register(
    "window_distribution",
    sql="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CUME_DIST() OVER w AS bal_cume,
           PERCENT_RANK() OVER w AS bal_pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution ranks (cume_dist/percent_rank) per segment",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist/percent_rank per segment WITHOUT the per-segment
    window (5 segments = whole-corpus tasks at scale): the distributed
    grouped_rank (ranks.py) gives every row its total-order row number
    and group count; ties collapse via a (segment, value) peer
    aggregate joined back — cume_dist = last peer's row number / n,
    percent_rank = (first peer's row number - 1) / (n - 1), with the
    single-row-group case pinned to 0.0 exactly as SQL defines it."""
    from nova_pulsar_spark.operators.ranks import grouped_rank

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    ranked = grouped_rank(
        c,
        ["c_mktsegment"],
        ["c_acctbal", "c_custkey"],
        spark.sparkContext.defaultParallelism,
    )
    peers = ranked.groupBy("c_mktsegment", "c_acctbal").agg(
        F.min("rn").alias("__rmin"), F.max("rn").alias("__rmax")
    )
    from nova_pulsar_spark.operators.ranks import nullsafe_equi_join

    # null-safe for consistency with grouped_rank's offset join: the
    # CUME_DIST/PERCENT_RANK oracle keeps NULL-keyed peer groups
    return nullsafe_equi_join(ranked, peers, ["c_mktsegment", "c_acctbal"]).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        (F.col("__rmax").cast("double") / F.col("n")).alias("bal_cume"),
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise((F.col("__rmin") - 1).cast("double") / (F.col("n") - 1))
        .alias("bal_pct_rank"),
    )


@register(
    "fn_date_arith",
    sql="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
           date_trunc('month', o_orderdate) AS order_month
    FROM orders
    """,
    doc="Date arithmetic: interval add, diff, parts, truncation",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01"))).cast("bigint").alias("days_since_epoch_start"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
    )


def _spread8_sql(expr: str) -> str:
    """Interleave-ready bit spread of an 8-bit value (x -> x with a zero
    between every bit), via the standard magic-number doubling steps —
    identical integer ops on both engines."""
    s = f"(({expr}) & 255)"
    s = f"(({s} | ({s} << 4)) & 3855)"   # 0x0F0F
    s = f"(({s} | ({s} << 2)) & 13107)"  # 0x3333
    s = f"(({s} | ({s} << 1)) & 21845)"  # 0x5555
    return s


_ZGRID = 256  # per-dimension quantization grid (8 bits)
_PQ = f"(((l_partkey - pmin) * {_ZGRID}) // (pmax - pmin + 1))"
_SQ = f"(((l_suppkey - smin) * {_ZGRID}) // (smax - smin + 1))"


@register(
    "fn_zorder",
    sql=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_spread8_sql(_PQ)} | ({_spread8_sql(_SQ)} << 1) AS BIGINT) AS zval
    FROM lineitem CROSS JOIN (
      SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
      FROM lineitem) b
    """,
    doc="Z-order (Morton) curve value over (partkey, suppkey) — the "
    "multi-dimensional clustering key for data layout: sort-by-zval makes "
    "row-group min/max stats selective on BOTH dimensions at once",
)
def fn_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton interleave with per-dimension min-max quantization onto an
    equal-width 256-cell grid — without the normalization, a dimension
    with more value bits dominates the curve's high bits and the other
    dimension degenerates (the standard ZORDER pitfall). The quantized
    cells interleave via magic-number bit spreading (integer ops only,
    no UDF — stays in whole-stage codegen; the min/max frame is a
    broadcast scalar). Writing 100 TB sorted by zval gives every
    parquet row group a tight bounding box in (partkey, suppkey)
    space, so predicates on EITHER key skip most row groups — the
    layout trick lakehouse OPTIMIZE ZORDER applies, here expressed as
    one projection + sortWithinPartitions at write time.
    """
    l = load_table(spark, sf_dir, "lineitem")
    bounds = l.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )

    def spread(qexpr: str) -> F.Column:
        s = F.expr(f"({qexpr}) & 255")
        for shift, mask in ((4, 0x0F0F), (2, 0x3333), (1, 0x5555)):
            s = s.bitwiseOR(F.shiftleft(s, shift)).bitwiseAND(F.lit(mask))
        return s

    pq = f"((l_partkey - pmin) * {_ZGRID}) div (pmax - pmin + 1)"
    sq = f"((l_suppkey - smin) * {_ZGRID}) div (smax - smin + 1)"
    z = spread(pq).bitwiseOR(F.shiftleft(spread(sq), 1))
    return l.crossJoin(F.broadcast(bounds)).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", z.cast("bigint").alias("zval")
    )


@register(
    "fn_props_parse",
    sql="""
    WITH p AS (
      SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM p GROUP BY event_type
    """,
    doc="Semi-structured column parse: JSON props field extracted typed "
    "(get_json_object ≡ json_extract) then aggregated — the raw-event "
    "payload-mining shape",
)
def fn_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload mining on the raw `props` JSON column: extraction happens
    IN the scan projection (whole-stage codegen JSON path evaluation,
    no UDF), so only the extracted long survives to the aggregate —
    at 100 TB the JSON blobs never reach the shuffle. For hot paths a
    real pipeline promotes the field to a typed column at ingest; the
    expression here is the probe that justifies the promotion.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )
