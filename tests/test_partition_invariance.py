"""Partition-count invariance: the engine's exact-arithmetic idioms
(decimal-exact sums, sequential folds, explicit tie-breaks) promise
BIT-IDENTICAL results under any partitioning — the property that makes
results reproducible when a 100 TB job reruns with different
parallelism, AQE coalescing, or after executor loss. Pin it by running
float-sensitive queries under 32 vs 3 shuffle partitions and comparing
collected rows exactly."""

from nova_pulsar_spark.registry import all_queries

# Queries chosen for partition-order sensitivity if the arithmetic were
# naive: float aggregations (pricing_summary, corr, cov, zscore), a
# windowed LOCF over a shuffled spine (ts_gapfill), per-group argmax
# tie-breaks (topk_per_group), and exact quantiles.
KEYS = [
    "pricing_summary",
    "agg_corr_exact",
    "agg_cov_matrix",
    "llm_quality_zscore",
    "ts_gapfill",
    "topk_per_group",
    "quantiles_exact",
    # round-4 fixed-point accumulators: cross-row float sums quantized
    # to DECIMAL — exactly the class partitioning would break if naive
    "llm_pca_power_step",
    "llm_dsir_weights",
    "llm_dedup_pagerank",
    "llm_bitext_margin",
    "ts_acf",
    # round-4 continuation: fixed-point moments / folds / hash weights
    "agg_chi_square",
    "ts_xcorr",
    "ts_holt_winters",
    "agg_mannwhitney",
    "agg_bootstrap_ci",
    "llm_simsearch_pq_distortion",
    # round-5 distributed ranks (operators/ranks.py): rank = local rank
    # + range-partition offset must not depend on any layout choice
    "median_exact",
    "agg_mad_outliers",
    "dq_winsorize",
    "agg_histogram_equidepth",
]


def _rows(spark, key, sf):
    df = all_queries()[key].fn(spark, sf)
    return sorted(tuple(r) for r in df.collect())


def test_results_bit_identical_across_shuffle_partitions(spark, sf_dir):
    regs = all_queries()
    assert all(k in regs for k in KEYS)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = {k: _rows(spark, k, sf_dir) for k in KEYS}
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for k in KEYS:
            assert _rows(spark, k, sf_dir) == base[k], f"{k} diverged under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_grouped_rank_invariant_to_range_width(spark, sf_dir):
    """The distributed rank's one tunable — how many range partitions
    the corpus is split into — must never reach the values: offset +
    local rank is the global rank for ANY contiguous split."""
    from nova_pulsar_spark.operators.ranks import grouped_rank
    from nova_pulsar_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    out = []
    for width in (1, 3, 17):
        r = grouped_rank(e, ["event_type"], ["value", "event_id"], width)
        out.append(sorted(tuple(x) for x in r.collect()))
    assert out[0] == out[1] == out[2]


def test_grouped_prefix_matches_window_reference(spark):
    """grouped_prefix (distributed running sum/max) must agree with
    the single-task window formulation it replaces, including NULL
    group keys (PARTITION BY treats NULL as a group; the offset join
    is null-safe) and NULL values (ignored by sum/max)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from nova_pulsar_spark.operators.ranks import grouped_prefix

    rows = [
        ("a", 1, 10), ("a", 2, None), ("a", 3, 5), ("b", 1, 7),
        (None, 1, 3), (None, 2, 9), ("b", 2, 2), ("a", 4, 8),
    ]
    df = spark.createDataFrame(rows, "g string, i int, v int")
    got = grouped_prefix(df, ["g"], ["i"], 3, sums={"rs": "v"}, maxes={"rm": "v"})
    w = W.partitionBy("g").orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    ref = df.select("g", "i", "v", F.sum("v").over(w).alias("rs"), F.max("v").over(w).alias("rm"))
    key = lambda r: (r["g"] or "", r["i"])
    got_rows = sorted(((r["g"], r["i"], r["rs"], r["rm"]) for r in got.collect()), key=lambda t: (t[0] or "", t[1]))
    ref_rows = sorted(((r["g"], r["i"], r["rs"], r["rm"]) for r in ref.collect()), key=lambda t: (t[0] or "", t[1]))
    assert got_rows == ref_rows
