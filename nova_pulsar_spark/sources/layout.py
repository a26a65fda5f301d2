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


# --- Training-shard export with integrity manifest -------------------------

import json


def _shard_checksum_agg(key_col: str):
    """Order-independent per-shard stats: row count + SUM of 60-bit md5
    prefixes of the key (the dq_checksum idiom, exact in DECIMAL(38,0))."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.expr(
                f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 8), 16, 10) AS BIGINT) * 268435456L"
                f" + CAST(conv(substring(md5(CAST({key_col} AS STRING)), 9, 7), 16, 10) AS BIGINT)"
            ).cast("decimal(38,0)")
        ).cast("string").alias("checksum"),
    ]


def _hadoop_path(spark: SparkSession, directory: str, name: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(directory, name)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, p


def _fs_write_text_atomic(spark: SparkSession, directory: str, name: str, content: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so the
    export works on any scheme Spark can write to (hdfs://, s3a://,
    file://), not just the driver's local disk. Tmp + rename: atomic on
    HDFS/local; on object stores the rename is copy+delete but the tmp
    name still keeps readers from ever opening a partial manifest."""
    fs, dest = _hadoop_path(spark, directory, name)
    _, tmp = _hadoop_path(spark, directory, name + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(dest):
        fs.delete(dest, False)
    fs.rename(tmp, dest)


def _fs_read_text(spark: SparkSession, directory: str, name: str) -> str:
    fs, p = _hadoop_path(spark, directory, name)
    stream = fs.open(p)
    try:
        # IOUtils returns byte[] BY VALUE through py4j (a read-into-buffer
        # call would mutate a Java-side copy and leave the Python bytearray
        # empty); commons-io ships on Spark's classpath.
        jvm = spark.sparkContext._jvm
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def write_training_shards(
    df: DataFrame, path: str, key_col: str, n_shards: int
) -> dict:
    """Export a curated corpus as deterministic training shards with a
    per-shard integrity manifest — the artifact a training job reads.

    - Shard assignment is ``crc32(key) % n_shards``: a pure function of
      the example key, so re-exports and backfills land examples in the
      same shard (the same stability argument as the hash train/test
      split), and shards are balanced in expectation.
    - One file per shard via ``repartition(n_shards, shard)``.
    - ``_manifest.json`` (underscore: invisible to Spark readers, like _SUCCESS) records per shard: row count and an
      order-independent checksum (SUM of 60-bit md5 prefixes of the
      key, the dq_checksum idiom, exact in Python ints) — written
      tmp+rename so readers never see a partial manifest.

    At 100 TB this is the final pipeline stage after dedup/curation/
    packing; the manifest is what lets the trainer (or a later copy
    job) verify every shard without re-reading the pipeline.
    """
    shard = F.expr(f"crc32(CAST({key_col} AS STRING)) % {n_shards}").cast("int")
    out = df.withColumn("shard", shard).repartition(n_shards, F.col("shard"))
    out.write.partitionBy("shard").mode("overwrite").parquet(path)
    # Manifest stats come from a READ-BACK of the written files, not the
    # input lineage — the manifest pins what is actually on disk, so a
    # lost task / partial write is caught at export time, not training time.
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(*_shard_checksum_agg(key_col))
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "shards": {
            str(r["shard"]): {"n_rows": r["n_rows"], "checksum": r["checksum"]}
            for r in stats
        },
    }
    _fs_write_text_atomic(spark, path, "_manifest.json", json.dumps(manifest, sort_keys=True))
    return manifest


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Recompute every shard's count/checksum and diff against the
    manifest. Returns {shard: problem} — empty means intact. The scan
    reads only the key column (column pruning), so verification I/O is
    a fraction of the data."""
    manifest = json.loads(_fs_read_text(spark, path, "_manifest.json"))
    key_col = manifest["key_col"]
    actual = {
        str(r["shard"]): (r["n_rows"], r["checksum"])
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(*_shard_checksum_agg(key_col))
        .collect()
    }
    problems: dict = {}
    for sid, want in manifest["shards"].items():
        got = actual.get(sid)
        if got is None:
            problems[sid] = "missing shard"
        elif got != (want["n_rows"], want["checksum"]):
            problems[sid] = f"mismatch: manifest={want} actual={got}"
    for sid in actual:
        if sid not in manifest["shards"]:
            problems[sid] = "unexpected shard"
    return problems
