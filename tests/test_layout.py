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


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Bucketing is the write-time contract that deletes the join
    shuffle: two tables bucketed by the same key into the same bucket
    count join with ZERO Exchange in the plan — at 100 TB that is the
    difference between a network-bound and a scan-bound join."""
    # warehouse dir is a static conf; the session default (cwd/spark-
    # warehouse) is used and the database dropped with CASCADE below
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    try:
        e = load_table(spark, sf_dir, "events")
        users = e.groupBy("user_id").count().withColumnRenamed("count", "n_events")
        (
            e.select("event_id", "user_id", "value")
            .write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .mode("overwrite")
            .saveAsTable("bkt.events_b")
        )
        users.write.bucketBy(8, "user_id").mode("overwrite").saveAsTable("bkt.users_b")

        # hint away the broadcast (the small side would otherwise be
        # broadcast and hide the bucketing): merge join reads bucket
        # layout directly
        joined = (
            spark.table("bkt.events_b")
            .hint("merge")
            .join(spark.table("bkt.users_b").hint("merge"), "user_id")
        )
        # execute FIRST so AQE finalizes, then assert on the final plan
        # (a pre-execution AdaptiveSparkPlan string can hide exchanges)
        got = joined.count()
        want = e.count()
        assert got == want
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucket co-location held
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_training_shards_roundtrip_and_tamper_detection(spark, tmp_path):
    """Shard export: deterministic assignment, manifest checksums
    verify clean, a lost shard file is detected."""
    import glob
    import os

    from nova_pulsar_spark.sources.layout import verify_shards, write_training_shards
    from nova_pulsar_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    m1 = write_training_shards(d, out, "doc_id", n_shards=4)
    assert sum(v["n_rows"] for v in m1["shards"].values()) == d.count()
    assert verify_shards(spark, out) == {}
    # determinism: re-export yields identical manifest
    out2 = str(tmp_path / "shards2")
    m2 = write_training_shards(d, out2, "doc_id", n_shards=4)
    assert m1["shards"] == m2["shards"]
    # tamper: drop one shard's data file -> verification flags it
    victim = sorted(glob.glob(os.path.join(out, "shard=*/**/*.parquet"), recursive=True))[0]
    os.remove(victim)
    problems = verify_shards(spark, out)
    assert problems, "lost shard file must be detected"


# --- bucketed co-located joins -------------------------------------------


def test_bucketed_join_has_no_exchange_and_matches_plain_join(spark, sf_dir):
    """The whole point of bucketing: the fact-fact join must plan as a
    SortMergeJoin with ZERO shuffle exchanges and ZERO sorts (both
    sides pre-distributed and pre-sorted on disk), and produce exactly
    the plain join's values."""
    from pyspark.sql import functions as F

    from nova_pulsar_spark.sources.bucketed import (
        bucketed_order_lineitem_join,
        build_bucketed_tables,
    )
    from nova_pulsar_spark.sources.tables import load_table

    # at test SF the dims are broadcast-sized, which would (correctly)
    # beat the bucketed SMJ — disable broadcast so the pin exercises
    # the co-located path the layout exists for at fact-fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_order_lineitem_join(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
        assert "Exchange" not in join_part, join_part
        got = {r["o_orderpriority"]: (r["n_items"], r["revenue_cents"]) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue_cents"])
        for r in (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.sum((F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
                .cast("double")
                .alias("revenue_cents"),
            )
            .collect()
        )
    }
    assert got == want

    # idempotence: a second build is a catalog hit, not a rewrite
    t1 = build_bucketed_tables(spark, sf_dir)
    t2 = build_bucketed_tables(spark, sf_dir)
    assert t1 == t2

    # bucket pruning: an equality predicate on the bucket key must scan
    # exactly ONE of the 8 buckets
    some_key = spark.table(t1[0]).select("o_orderkey").first()[0]
    # autoBucketedScan drops bucketing when no exchange is saved; force
    # the bucketed scan so filter-time bucket pruning is observable
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        point = spark.table(t1[0]).filter(F.col("o_orderkey") == some_key)
        pplan = point._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in pplan, pplan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
