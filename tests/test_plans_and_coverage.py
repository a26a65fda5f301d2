"""Plan-shape regressions (the 100 TB contract), SURVEY §2 key
coverage audit, and source round-trips."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

# Query keys SURVEY.md §2 promises (column "Query key" across §2.1-§2.10).
SURVEY_KEYS = [
    # §2.1 scans
    "scan_queue", "scan_active", "scan_status", "plan_metadata_extract",
    "board_upsert", "pulse_aggregate",
    # §2.2 filters/projections
    "filter_dep_satisfied", "gate_single_active", "guard_completed",
    "filter_marker_claim", "filter_queue_kind", "filter_fresh",
    "project_derived", "project_priority", "project_model_route",
    # §2.3 joins
    "join_marker_status", "join_pid_lookup", "join_plan_board",
    "join_dep_overlap", "join_phase_conflict", "join_namespace",
    # §2.4 aggregations
    "agg_queue_count", "agg_state_counts", "agg_pulse", "agg_progress",
    "agg_exec_log", "agg_tool_count", "agg_eta",
    "agg_distinct", "agg_grouping_sets", "agg_cube", "agg_rollup",
    "agg_distinct_two_phase",
    # §2.5 sort/topk
    "topk_best_plan", "topk_latest",
    # §2.6 windows
    "window_stall", "window_hung", "window_rank_wait",
    "window_rank", "window_running_sum", "window_frame",
    # §2.7 set ops
    "setop_union_migrate", "setop_except",
    # §2.8 functions
    "fn_json_extract", "fn_json_build", "fn_json_update",
    "fn_regex_extract", "fn_regex_replace", "fn_split", "fn_path",
    "fn_ts_format", "fn_ts_diff", "fn_id_gen", "fn_cond_null",
    "fn_math", "fn_array", "fn_map", "fn_string",
    # §2.9 streaming/state
    "state_lifecycle", "state_phase", "sched_rounds", "state_claim",
    "state_incident", "stream_tumbling", "stream_sliding",
    "stream_session", "stream_dedup",
    # §2.10 north star
    "llm_dedup_exact", "llm_dedup_near", "llm_simsearch_topk",
    "llm_text_stats",
]


def test_every_survey_key_is_registered():
    q = entrymod.queries()
    missing = [k for k in SURVEY_KEYS if k not in q]
    assert not missing, f"SURVEY §2 keys missing from queries(): {missing}"


def test_star_join_broadcasts_all_dims(spark):
    from nova_pulsar_spark.operators.joins import join_multiway_star

    plan = join_multiway_star(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # dims must never trigger a sort-merge shuffle of the fact table
    assert "SortMergeJoin" not in plan


def test_scan_pushdown_prunes_columns(spark):
    from nova_pulsar_spark.operators.relational import scan_project_filter

    import re

    qe = scan_project_filter(spark, "/root/testdata/sf0.001")._jdf.queryExecution().toString()
    assert "PushedFilters: [" in qe
    assert "LessThan(l_shipdate" in qe
    # projection reaches the reader: FileScan lists only the 4 needed columns
    m = re.search(r"FileScan parquet \[([^\]]*)\]", qe)
    assert m and len(m.group(1).split(",")) == 4


def test_global_topk_uses_take_ordered(spark):
    from nova_pulsar_spark.operators.topk import topk_global

    plan = topk_global(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full global sort


def test_asof_join_semantics(spark):
    from nova_pulsar_spark.operators.advanced import join_asof

    rows = join_asof(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        if r.checkpoint_ts is not None:
            assert r.checkpoint_ts <= r.ts
    # events before the first checkpoint have no match
    early = [r for r in rows if r.ts < datetime(2024, 1, 5)]
    assert early and all(r.checkpoint is None for r in early)


def test_csv_json_source_round_trip(spark, tmp_path):
    from nova_pulsar_spark.sources.tables import load_table

    n = load_table(spark, "/root/testdata/sf0.001", "nation")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    n.write.mode("overwrite").option("header", True).csv(csv_dir)
    n.write.mode("overwrite").json(json_dir)
    back_csv = spark.read.schema(n.schema).option("header", True).csv(csv_dir)
    back_json = spark.read.schema(n.schema).json(json_dir)
    want = {tuple(r) for r in n.collect()}
    assert {tuple(r) for r in back_csv.collect()} == want
    assert {tuple(r) for r in back_json.collect()} == want


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the exchange —
    the 100 TB co-located-join strategy from docs/SCALE.md."""
    from nova_pulsar_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, "/root/testdata/sf0.001", "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, "/root/testdata/sf0.001", "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """Hive-partitioned layout by a filter column turns a lang filter
    into directory pruning — the 100 TB corpus-layout rule (partition
    by coarse selective keys: lang, source, date)."""
    from nova_pulsar_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_by_lang")
    d.write.mode("overwrite").partitionBy("lang").parquet(out)
    lang = d.select("lang").first().lang
    pruned = spark.read.parquet(out).filter(F.col("lang") == lang)
    qe = pruned._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in qe.splitlines() if "PartitionFilters" in ln]
    assert m and "lang" in m[0]  # the filter became partition pruning
    assert pruned.count() == d.filter(F.col("lang") == lang).count()


def test_corrupt_json_records_are_quarantined_not_fatal(spark, tmp_path):
    """Ingest robustness: PERMISSIVE mode routes malformed lines to
    _corrupt_record so one bad file can't kill a 100 TB backfill, and
    DROPMALFORMED yields only the clean rows."""
    from pyspark.sql import types as T

    src = str(tmp_path / "dirty")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "part-0.json"), "w") as f:
        f.write('{"id": 1, "v": "ok"}\n')
        f.write("{this is not json at all\n")
        f.write('{"id": 3, "v": "fine"}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    rows = spark.read.schema(schema).option("mode", "PERMISSIVE").json(src).cache()
    good = rows.filter(F.col("_corrupt_record").isNull())
    bad = rows.filter(F.col("_corrupt_record").isNotNull())
    assert {r.id for r in good.collect()} == {1, 3}
    assert bad.count() == 1
    rows.unpersist()
    clean_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    dropped = spark.read.schema(clean_schema).option("mode", "DROPMALFORMED").json(src)
    assert {r.id for r in dropped.collect()} == {1, 3}


def test_sorted_layout_gives_disjoint_row_group_stats(spark, tmp_path):
    """Data-layout scale rule: sorting within partitions before writing
    gives near-disjoint parquet row-group min/max ranges on the sort
    key, so selective scans skip whole row groups; unsorted layout
    leaves every range overlapping (nothing skippable)."""
    import pyarrow.parquet as pq

    from nova_pulsar_spark.sources.tables import load_table

    l = load_table(spark, "/root/testdata/sf0.01", "lineitem")

    def ranges(path):
        out = []
        import os

        for fname in os.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            f = pq.ParquetFile(os.path.join(path, fname))
            idx = f.schema_arrow.names.index("l_orderkey")
            for g in range(f.num_row_groups):
                st = f.metadata.row_group(g).column(idx).statistics
                out.append((st.min, st.max))
        return sorted(out)

    sorted_dir = str(tmp_path / "sorted")
    unsorted_dir = str(tmp_path / "unsorted")
    (
        l.repartition(1)
        .sortWithinPartitions("l_orderkey")
        .write.option("parquet.block.size", 256 * 1024)
        .mode("overwrite")
        .parquet(sorted_dir)
    )
    l.repartition(1).write.option("parquet.block.size", 256 * 1024).mode("overwrite").parquet(
        unsorted_dir
    )
    rs, ru = ranges(sorted_dir), ranges(unsorted_dir)
    assert len(rs) >= 4, "need multiple row groups for the comparison"

    def overlap_pairs(rr):
        return sum(1 for (a, b), (c, d) in zip(rr, rr[1:]) if b > c)

    # sorted: consecutive row-group ranges are (near-)disjoint;
    # unsorted: essentially every consecutive pair overlaps
    assert overlap_pairs(rs) <= len(rs) // 4
    assert overlap_pairs(ru) >= max(1, len(ru) - 1 - len(ru) // 4)


def test_cov_matrix_matches_numpy_population_cov(spark):
    import numpy as np

    from nova_pulsar_spark.operators.aggregates import agg_cov_matrix
    from nova_pulsar_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    got = {(r["var_x"], r["var_y"]): r["cov"] for r in agg_cov_matrix(spark, SF_SMOKE).collect()}
    pdf = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .toPandas()
    )
    cols = {
        "quantity": pdf["l_quantity"].to_numpy(),
        "price": pdf["l_extendedprice"].to_numpy(),
        "discount": pdf["l_discount"].to_numpy(),
        "tax": pdf["l_tax"].to_numpy(),
    }
    for (x, y), cov in got.items():
        want = float(np.mean(cols[x] * cols[y]) - np.mean(cols[x]) * np.mean(cols[y]))
        # numpy sums plain doubles; the operator's decimal-exact sums can
        # only be MORE accurate — compare at numpy's own error scale
        assert abs(cov - want) <= 1e-9 * max(1.0, abs(want)), (x, y)
    # variance diagonal is non-negative and symmetric pairs are single-counted
    assert all(got[(v, v)] >= 0 for v in cols)
    assert len(got) == 10


def test_edgecase_fuzz_fixture_stays_oracle_green(spark, tmp_path):
    """Adversarial-input regression net: the queries that the edge-case
    fuzz round found divergent (ANSI 0-div raises, OOB subscripts,
    max_by tie nondeterminism, DuckDB json/sqrt raises, codepoint-vs-
    byte decode) must stay oracle-equal on the adversarial fixture —
    empty/1-word/unicode docs, zero vectors, tied prices, constant and
    negative event values, malformed JSON."""
    import duckdb

    from nova_pulsar_spark.registry import all_queries
    from tools.check_oracle import compare
    from tools.make_edgecase_sf import main as gen

    d = str(tmp_path / "edge_sf")
    gen(d)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    keys = [
        "agg_minmax_by", "agg_stats_exact", "agg_corr_exact",
        "fn_json_extract", "fn_math", "fn_props_parse", "fn_regex_extract",
        "llm_ngram_counts", "llm_perplexity_proxy", "llm_quality_repetition",
        "llm_simsearch_topk", "llm_simsearch_batch", "llm_simsearch_mmr",
        "llm_text_fingerprint", "llm_text_quality", "llm_dedup_embedding_lsh",
        "multimodal_decode", "multimodal_resize", "multimodal_phash_dedup",
        "llm_dedup_near", "llm_dedup_verify", "llm_setsim_prefix",
        "llm_dedup_substring_scrub", "llm_winnowing", "llm_simsearch_rrf",
        "llm_dedup_winnow", "llm_bpe_encode", "llm_dedup_incremental", "llm_judge_quality",
        "llm_mix_apply", "llm_simsearch_prefiltered", "llm_simsearch_ivfpq",
        "llm_quality_gate", "llm_dedup_lsh_recall", "llm_dedup_report",
        "llm_dedup_lsh_cap_loss", "fn_duration_format", "llm_quality_zscore",
        "ts_gapfill", "ts_rolling_active",
        "llm_pca_power_step", "llm_bitext_margin", "llm_dsir_weights", "llm_dedup_pagerank", "llm_contamination_rate", "llm_dedup_embedding_incremental",
        "llm_dedup_embedding_cap_loss", "llm_semdedup_cap_loss", "dq_winsorize", "agg_skew_kurtosis", "dq_benford", "ts_acf",
        "ts_holt", "llm_token_coverage", "graph_triangles", "dq_referential", "ts_forecast_backtest",
        "graph_components", "graph_jaccard_edges", "graph_degree_hist", "topk_skyline",
        "llm_simsearch_ivf_recall", "llm_simsearch_pq_distortion", "ts_holt_winters",
        "agg_ab_ttest", "agg_chi_square", "llm_collocations", "ts_xcorr", "agg_mannwhitney", "agg_bootstrap_ci", "ts_lttb", "ts_drawdown", "dq_drift", "llm_mix_budget",
        # round-5: distributed rank/prefix/head rewrites + new keys with
        # NULL-ordering / NULL-group / sampling-coin edge paths
        "llm_quality_percentile", "graph_triangles_sampled", "llm_sample_per_group",
        "llm_pack_sequences", "median_exact", "quantiles_exact", "agg_mad_outliers",
        "agg_histogram_equidepth", "topk_per_group", "window_distribution",
        "window_ntile_first_last", "dq_k_anonymity", "llm_minhash_jaccard_est",
        "llm_split_leakage_safe", "llm_split_leakage_rate", "llm_ngram_novelty",
        "llm_postings_stats",
    ]
    regs = all_queries()
    problems = {}
    for k in keys:
        rq = regs[k]
        spark_pdf = rq.fn(spark, d).toPandas()
        oracle_pdf = con.execute(rq.sql).df()
        p = compare(spark_pdf, oracle_pdf)
        if p:
            problems[k] = p
    assert not problems, problems
