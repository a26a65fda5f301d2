"""Distributed exact ranks: global (or per-group) row ranks under a
total order WITHOUT concentrating any group — let alone the corpus —
in a single task.

The naive exact-rank plan, ``row_number() OVER (PARTITION BY group
ORDER BY ...)``, hash-shuffles each group to ONE task: fine while
groups fit an executor, quadratic-failure territory when the group
key is low-cardinality (events has a handful of event_types, so at
100 TB each group is tens of TB). The unpartitioned variant is worse
— WindowExec warns "Moving all data to a single partition".

``grouped_rank`` is the scalable-exact formulation (the round-5
rewrite behind agg_histogram_equidepth, median_exact,
quantiles_exact, agg_mad_outliers, dq_winsorize):

1. ``repartitionByRange(width, *group, *order)`` lays rows out in
   contiguous key ranges with ascending partition ids — a group
   SPANS partitions instead of owning one task;
2. a window partitioned by ``(spark_partition_id, *group)`` computes
   LOCAL ranks — width x |groups| independent window groups;
3. per-(pid, group) counts — a width x |groups|-row frame — are
   cumulated per group and broadcast back: global rank = local rank
   + the count of same-group rows in earlier partitions.

The result is INVARIANT to where RangePartitioner's sampled
boundaries fall: offset + local rank equals the global rank for any
contiguous split, and a total order (callers must include a unique
tie-break column) means equal keys cannot straddle partitions — so
the sampling never leaks into values, and DuckDB ``ROW_NUMBER``
twins stay bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    width: int,
    rank_col: str = "rn",
    count_col: str = "n",
) -> DataFrame:
    """``df`` + ``rank_col`` (1-based rank of the row within its group
    under ``order_cols``) + ``count_col`` (group row count), computed
    distributed-exact. ``order_cols`` must make the per-group order
    total (include a unique id). ``group_cols`` may be empty for a
    corpus-global rank. Reserved intermediate names: __pid/__lrn/
    __c/__off."""
    # EAGER localCheckpoint, load-bearing twice over: (1) the frame
    # fans out into the local-rank window AND the offset counts, and
    # Catalyst does not reuse the range exchange across the two
    # branches (measured: 2x rangepartitioning + 2x scan without it);
    # (2) RangePartitioner SAMPLES its boundaries per job, so two
    # independent executions could disagree on pid assignment — the
    # offsets would then be computed against a different layout than
    # the local ranks. Materializing once freezes both. This is the
    # sorted-run materialization every external sort does anyway.
    # Lazy (not eager) because the two consumers run strictly in
    # sequence — AQE materializes the broadcast offsets stage before
    # the probe stage — so the first one to run writes the checkpoint
    # and the second reads it: exactly-once materialization without
    # eager's extra standalone job per call.
    pidded = (
        df.repartitionByRange(width, *group_cols, *order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
        .localCheckpoint(eager=False)
    )
    local = pidded.withColumn(
        "__lrn",
        F.row_number().over(W.partitionBy("__pid", *group_cols).orderBy(*order_cols)),
    )
    wg = (W.partitionBy(*group_cols) if group_cols else W.partitionBy()).orderBy("__pid")
    offs = (
        pidded.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__pid",
            *group_cols,
            F.coalesce(
                F.sum("__c").over(wg.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
            ).alias("__off"),
            F.sum("__c")
            .over(wg.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .alias(count_col),
        )
    )
    return (
        local.join(F.broadcast(offs), ["__pid", *group_cols])
        .withColumn(rank_col, (F.col("__lrn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )
