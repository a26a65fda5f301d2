"""Data-layout maintenance: partitioned write → pruned read, and
small-file compaction with an atomic swap."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nova_pulsar_spark.sources.layout import compact_dir, read_pruned, write_partitioned
from nova_pulsar_spark.sources.tables import load_table


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_partitioned(e, path, ["event_type"], sort_cols=["ts"])

    # hive layout on disk: one directory per partition value
    parts = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(parts) >= 3

    pruned = read_pruned(spark, path, event_type="purchase")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the partition filter reached the scan: pruning happens at planning
    # time, not as a post-scan filter
    assert "PartitionFilters: [isnotnull(event_type" in plan
    got = pruned.count()
    want = e.filter(F.col("event_type") == "purchase").count()
    assert got == want > 0

    # each partition collapsed to one file (repartition-before-write):
    # no tasks x partitions small-file explosion
    for d in parts:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1


def test_compact_dir_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fragmented")
    e = load_table(spark, sf_dir, "events")
    # simulate a streaming sink's fragmentation: 32 tiny files
    e.repartition(32).write.parquet(path)
    before_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before_files >= 16
    before_rows = spark.read.parquet(path).count()
    before_sum = spark.read.parquet(path).agg(F.sum("event_id")).collect()[0][0]

    n_files = compact_dir(spark, path, target_file_bytes=64 * 1024 * 1024)

    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after) == n_files < before_files
    assert spark.read.parquet(path).count() == before_rows
    assert spark.read.parquet(path).agg(F.sum("event_id")).collect()[0][0] == before_sum
    assert not os.path.exists(path + ".compact-tmp")
    assert not os.path.exists(path + ".compact-old")
