"""Data-layout maintenance: partitioned writes and small-file compaction.

The write-side complement to the scan layer (tables.py) and the
Z-order key (fn_zorder): how a 100 TB table should land on storage so
the read side can prune. Pytest-pinned (tests/test_layout.py) rather
than oracle-registered — these operators WRITE; the driver contract
only reads.

Scale notes:
- **Partition pruning is the cheapest query optimization that
  exists**: a `day=`-partitioned fact table turns a one-day query
  from a 100 TB scan into a ~300 GB scan before a single task runs.
  The partition column must be low-cardinality and appear in
  predicates verbatim (no expressions over it, or pruning dies).
- **Small files are the silent killer**: a streaming sink emitting
  one file per trigger per partition yields millions of KB-sized
  files; scan task setup then dominates I/O. Compaction rewrites a
  directory to ~target-sized files and swaps atomically — the
  OPTIMIZE of Delta/Iceberg over plain parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], sort_cols: list[str] | None = None
) -> None:
    """Hive-style partitioned parquet write with optional within-file
    ordering.

    ``repartition(partition_cols)`` first: without it every input task
    writes a file into every output partition (tasks × partitions
    small files); with it each partition's rows converge to one task →
    one file. ``sortWithinPartitions`` then gives monotone column
    ranges inside each file, so parquet row-group min/max stats are
    disjoint and predicate pushdown skips whole row groups (the
    fn_zorder data-layout pin, applied at write time).
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def read_pruned(spark: SparkSession, path: str, **partition_values) -> DataFrame:
    """Read a partitioned table with equality predicates on partition
    columns — expressed so Catalyst prunes directories at planning
    time (visible as ``PartitionFilters`` in the scan node)."""
    df = spark.read.parquet(path)
    for col, val in partition_values.items():
        df = df.filter(F.col(col) == val)
    return df


def compact_dir(spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite a parquet directory to ~target-sized files; returns the
    new file count.

    File count = ceil(total_bytes / target): the input size is read
    from the filesystem (no data scan), the rewrite is one coalesce
    pass, and the swap is rename-based so concurrent readers of the
    old listing never see a half-written directory. At cluster scale
    this is the nightly OPTIMIZE job fronting a streaming sink; on
    object stores the rename becomes a manifest/pointer swap exactly
    like streaming/sinks.py does with `_LATEST`.
    """
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_file_bytes))
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    return n_files
