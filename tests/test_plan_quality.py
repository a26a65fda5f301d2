"""Positive plan-shape pins: the 100 TB design claims, enforced
mechanically. `test_plan_lint` bans antipatterns everywhere; this file
asserts the GOOD shapes are actually planned on representative queries
— dims broadcast, filters and projections reaching the parquet scan,
partial (map-side) aggregation, global top-k as TakeOrdered. A Spark
upgrade or refactor that silently degrades one of these shapes fails
here, not in a production profile.
"""

from __future__ import annotations

import re

from nova_pulsar_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    """Operator-tree string (one line per operator — good for counts)."""
    return all_queries()[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(spark, name: str) -> str:
    """Formatted explain: scan details (PushedFilters/ReadSchema) untruncated."""
    df = all_queries()[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_star_joins_broadcast_every_dim(spark):
    """TPC-H Q5 joins 5 dims around lineitem: every one must plan as a
    broadcast join — zero sort-merge shuffles of the fact table."""
    p = _plan(spark, "tpch_q5")
    assert p.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in p
    p2 = _plan(spark, "join_multiway_star")
    assert p2.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p2


def test_flagship_scan_prunes_and_pushes(spark):
    """pricing_summary reads exactly its 7 columns with the shipdate
    predicate pushed into the parquet scan."""
    p = _plan_formatted(spark, "pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1)
    rs = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, cols


def test_aggregates_are_partial_then_final(spark):
    """Hash aggregations plan as partial (map-side combine) + final —
    the shuffle carries combined state, not raw rows."""
    for name in ("llm_dedup_exact", "agg_state_counts", "pricing_summary"):
        p = _plan(spark, name)
        assert p.count("HashAggregate") >= 2, name


def test_global_topk_is_take_ordered(spark):
    """Brute-force similarity top-k must plan as TakeOrderedAndProject
    (per-partition heads + driver merge), never a global sort."""
    p = _plan(spark, "llm_simsearch_topk")
    assert "TakeOrderedAndProject" in p
    assert "Sort [" not in p.split("TakeOrderedAndProject")[0]


def test_small_side_broadcasts_in_contamination(spark):
    """The benchmark shingle set is the broadcast side of the
    contamination join — the corpus side never shuffles for the join."""
    p = _plan(spark, "llm_contamination")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_kmeans_assignment_has_no_join_single_corpus_shuffle(spark):
    """llm_kmeans_step's 100 TB claim: nearest-seed assignment is pure
    codegen (seed literals — no join anywhere), and the only shuffle
    over corpus-derived data is the (centroid, dim) mean aggregation."""
    p = _plan(spark, "llm_kmeans_step")
    assert "Join" not in p  # no join of any kind, broadcast included
    assert "CartesianProduct" not in p
    # exactly one exchange keyed by the mean-group columns
    assert len(re.findall(r"Exchange hashpartitioning\(centroid_id", p)) == 1


def test_checksum_is_partial_then_final_no_sort_before_agg(spark):
    """dq_checksum: map-side partial sums, one hash exchange, and the
    only Sort is the 3-row final ORDER BY above the aggregate."""
    p = _plan(spark, "dq_checksum")
    assert "partial_sum" in p and "partial_count" in p
    assert len(re.findall(r"Exchange hashpartitioning\(l_returnflag", p)) == 1
    agg_pos = p.index("HashAggregate")
    sort_pos = p.index("Sort ")
    assert sort_pos < agg_pos  # Sort sits ABOVE the aggregate (tree prints top-down)


def test_constraints_rowlevel_checks_share_one_scan_shape(spark):
    """dq_constraints: the row-level member is a 1-row aggregate (no
    grouping exchange fan-out), and the referential check plans as a
    LEFT ANTI join on the bare key."""
    p = _plan(spark, "dq_constraints")
    assert "LeftAnti" in p
    # every lineitem scan reads only the columns a member needs — the
    # widest ReadSchema must stay under the full 11-column row
    f = _plan_formatted(spark, "dq_constraints")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", f)
    assert schemas and all(len(s.split(",")) <= 7 for s in schemas), schemas


def test_mmr_pool_is_take_ordered(spark):
    """llm_simsearch_mmr's distributed stage: the relevance pool is
    TakeOrdered (no global sort of the corpus)."""
    from nova_pulsar_spark.operators.similarity import MMR_POOL, QUERY_VEC_ID, cosine
    from nova_pulsar_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    pool = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine("embedding", "qe").alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_POOL)
    )
    p = pool._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p


def test_ivfpq_cell_filter_is_broadcast_and_scoring_is_mapside(spark):
    """IVF-PQ: the probe-cell restriction must be a BroadcastHashJoin
    (semi-join against 2 labels), the ADC scoring must not shuffle the
    corpus (no SortMergeJoin anywhere), and the final top-k must be
    TakeOrdered, not a global sort."""
    p = _plan(spark, "llm_simsearch_ivfpq")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_shingle_joins_key_on_longs_not_strings(spark):
    """The hash-agnostic dedup paths must fold shingles/spans to
    xxhash64 BIGINTs before any exchange — the smaller-shuffle-key
    contract from docs/SCALE.md. The folding happens before the
    materialized candidate checkpoint, so the executed plan shows the
    checkpoint scan carrying a LONG key column (#nL), never a string
    shingle."""
    for name, key in (
        ("llm_setsim_prefix", "tok"),
        ("llm_dedup_substring", "g"),
        ("llm_dedup_substring_scrub", "g"),
    ):
        p = _plan(spark, name)
        assert re.search(rf"Scan ExistingRDD\[[^\]]*{key}#\d+L", p), (
            f"{name} lost its integer shingle keys"
        )


def test_bpe_encode_is_single_codegen_pass(spark):
    """The merge-table encoder is pure map work: no exchange at all in
    the plan, the replaces fused into a codegen stage (`*(n)` spans in
    the operator-tree string)."""
    p = _plan(spark, "llm_bpe_encode")
    assert "Exchange" not in p
    assert "*(" in p  # WholeStageCodegen marker in toString() form


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """The 100 TB skew story has two tiers: explicit salting
    (join_salted_skew / agg_salted_hot_key) and AQE's runtime skew
    join. This pins the second mechanically: a hot-key join under
    skew-tuned thresholds must execute as SortMergeJoin(skew=true)
    with an 'AQEShuffleRead … skewed' read — i.e. Spark really did
    split the oversized partition, we're not just trusting the docs."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 3 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
            F.concat(F.lit("x" * 60), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 100).select(F.col("id").alias("k"), F.lit("r").alias("rv"))
        j = left.join(right, "k")
        assert len(j.collect()) == 300000  # correctness unaffected
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "SortMergeJoin(skew=true)" in p
        assert "skewed" in p  # the AQEShuffleRead split marker
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_round4_scorers_broadcast_their_small_tables(spark):
    """The round-4 selection scorers join corpus-sized streams against
    bounded tables (256-bucket DSIR ratios, per-group winsorize bounds,
    9-digit-per-group Benford totals): every one must plan broadcast,
    never a sort-merge shuffle of the corpus side."""
    for name in ("llm_dsir_weights", "dq_winsorize", "dq_benford"):
        p = _plan(spark, name)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_pca_power_step_is_partial_then_final_dim_groups(spark):
    """v' = X^T(Xv): the per-dimension fixed-point sum must plan as
    partial (map-side) then final HashAggregate — the shuffle carries
    DIM partial-sum groups, not corpus rows."""
    p = _plan(spark, "llm_pca_power_step")
    assert "partial_sum" in p
    assert p.count("HashAggregate") >= 2


def test_pagerank_mass_aggregation_is_map_side_combined(spark):
    """The PageRank step's per-destination mass sum and the degree
    count both plan with partial aggregation (edge-bounded shuffles)."""
    p = _plan(spark, "llm_dedup_pagerank")
    assert "partial_sum" in p and "partial_count" in p


def test_distributed_rank_windows_are_pid_composited(spark):
    """The r5 rank/prefix family must never plan a window partitioned
    by the bare low-cardinality group key over a corpus frame: every
    corpus-sized window partitioning carries __pid in its key, and the
    offset lift is a broadcast join (never a shuffle join)."""
    for name in ("agg_mad_outliers", "ts_drawdown", "llm_pack_sequences",
                 "llm_sample_per_group", "llm_quality_percentile"):
        p = _plan(spark, name)
        assert "hashpartitioning(__pid" in p, name
        # the only event_type/source/lang hash partitionings allowed are
        # __pid-composited ones (or tiny aggregate frames downstream of
        # the broadcast, which plan as BroadcastHashJoin, not SMJ)
        assert "SortMergeJoin" not in p, name
        assert "BroadcastHashJoin" in p, name


def test_rank_stage_consumers_read_the_store(spark):
    """median/quantiles/winsorize ride the MATERIALIZED ranked-events
    stage (VERDICT r5 #1): their plans scan the index store's parquet
    (lineage = one scan, never the rank rebuild) and still plan no
    corpus shuffle join."""
    for name in ("median_exact", "quantiles_exact", "dq_winsorize"):
        p = _plan(spark, name)
        assert "ranked_events" in p, name
        assert "SortMergeJoin" not in p, name
        assert "hashpartitioning(__pid" not in p, name  # no inline rebuild


def test_ranked_events_stage_build_is_pid_composited(spark):
    """The stage BUILD itself (what the first consumer pays once per
    corpus fingerprint) keeps the distributed-rank shape: window keys
    carry __pid, offsets lift via broadcast."""
    from pyspark.sql import functions as F

    from nova_pulsar_spark.operators.ranks import grouped_rank
    from nova_pulsar_spark.sources.tables import load_table

    e = load_table(spark, SF, "events").select("event_type", "value", "event_id")
    df = grouped_rank(
        e, ["event_type"], [F.col("value").asc_nulls_last(), F.col("event_id")], 8
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__pid" in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_grouped_head_first_stage_is_pid_local(spark):
    """topk_per_group's first rank stage runs per (input partition,
    group): the survivors frame — not the corpus — reaches the final
    per-group rank."""
    p = _plan(spark, "topk_per_group")
    assert "hashpartitioning(__pid" in p


def test_ingest_rekey_broadcasts_claim_owners(spark):
    """llm_ingest_rekey joins stored buckets against the claim-rung
    owner table, which is bounded by bands x 2^EMB_STREAM_BITS rows —
    it must plan broadcast with partial (map-side) aggregation on both
    groupBys, never a corpus-side shuffle join."""
    p = _plan(spark, "llm_ingest_rekey")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "partial_min" in p


def test_recall_ledger_truth_stage_broadcasts_bounded_anchors(spark):
    """llm_dedup_embedding_recall's exact-truth stage joins the corpus
    against the budgeted anchor sample (~ANCHOR_BUDGET rows at any
    corpus size, ADVICE r6): the anchor side must BROADCAST with the
    derived modulus filter pushed into its parquet scan, and the raw
    embedding vectors must never enter an Exchange — the corpus is
    scanned once against a constant-size broadcast. (The final
    truth-vs-candidates probe may sort-merge: both inputs are derived
    bounded pair sets, not the corpus.)"""
    p = _plan(spark, "llm_dedup_embedding_recall")
    assert "BroadcastNestedLoopJoin" in p
    # anchor modulus filter reaches the anchor-side scan (pushdown)
    assert any(
        "FileScan" in ln and "vec_id" in ln and "%" in ln for ln in p.splitlines()
    ), "anchor mod filter not pushed to scan"
    # corpus vectors never shuffle: no Exchange carries the embedding col
    assert not any(
        "Exchange" in ln and "embedding" in ln for ln in p.splitlines()
    ), "embedding column entered a shuffle"
