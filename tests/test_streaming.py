"""Structured Streaming tests: topics, stateful lifecycle, and
streaming↔batch equivalence of the windowed queries."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from nova_pulsar_spark.plans.fixtures import STATUS_EVENTS
from nova_pulsar_spark.streaming.state import lifecycle_batch, lifecycle_stream
from nova_pulsar_spark.streaming.topics import (
    STATUS_SCHEMA,
    QueueNamespace,
    Topic,
    atomic_write_json,
)


def _write_status_fixture_files(directory: str) -> int:
    cols = [c for c, _ in STATUS_EVENTS.columns]
    for i, row in enumerate(STATUS_EVENTS.rows):
        rec = {c: (v.isoformat() if hasattr(v, "isoformat") else v) for c, v in zip(cols, row)}
        atomic_write_json(directory, f"ev-{i:04d}.json", rec)
    return len(STATUS_EVENTS.rows)


def test_topic_produce_consume_available_now(spark, tmp_path):
    d = str(tmp_path / "status_topic")
    n = _write_status_fixture_files(d)
    topic = Topic(base_dir=d, schema=STATUS_SCHEMA)
    q = (
        topic.reader(spark)
        .writeStream.format("memory")
        .queryName("topic_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM topic_out")
    assert out.count() == n
    # values survive the JSON round-trip
    got = {(r.plan_id, r.phase, r.status, r.tool_count) for r in out.collect()}
    want = {(r[2], r[3], r[5], r[6]) for r in STATUS_EVENTS.rows}
    assert got == want


def test_lifecycle_stream_matches_batch(spark, tmp_path):
    d = str(tmp_path / "status_topic2")
    _write_status_fixture_files(d)
    topic = Topic(base_dir=d, schema=STATUS_SCHEMA)
    q = (
        lifecycle_stream(topic.reader(spark))
        .writeStream.format("memory")
        .queryName("lifecycle_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(180)
    stream_rows = {
        (r.plan_id, r.phase, r.kind, r.from_status, r.to_status)
        for r in spark.sql("SELECT * FROM lifecycle_out").collect()
        if r.kind != "stalled" or r.to_status == "retrying"
    }
    batch_rows = {
        (r.plan_id, r.phase, r.kind, r.from_status, r.to_status)
        for r in lifecycle_batch(STATUS_EVENTS.spark_df(spark)).collect()
    }
    assert stream_rows == batch_rows


def test_lifecycle_semantics(spark):
    out = lifecycle_batch(STATUS_EVENTS.spark_df(spark)).collect()
    kinds = {(r.plan_id, r.phase, r.kind) for r in out}
    # P3: the stray running-after-completed on phase 1 is suppressed
    assert ("plan-20260227-1100", 1, "suppressed_regression") in kinds
    # W1/Q7: phase 2's 25-min silent gap produces a stall incident
    assert ("plan-20260227-1100", 2, "stalled") in kinds
    # normal transitions exist
    assert ("plan-20260227-1100", 1, "transition") in kinds


def test_claim_cas_rejects_competing_thread(spark):
    from nova_pulsar_spark.streaming.stream_queries import state_claim

    out = state_claim(spark, "unused").collect()
    rejected = [r for r in out if r.kind == "claim_rejected"]
    assert len(rejected) == 1  # exactly the th-B event
    # th-A's full lifecycle went through
    assert {r.to_status for r in out if r.kind == "transition"} == {"starting", "running", "completed"}


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    from nova_pulsar_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_parquet")
    e.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type, r.n)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r.window_start, r.event_type, r.n)
        for r in e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    assert got == want


def test_processing_time_timeout_stall_then_kill(spark, tmp_path):
    """The REAL silence path: no events → ProcessingTimeTimeout fires,
    emits stall incidents up to the retry cap, then kills and drops
    state (orbiter.md:183-196 / pulsar.md:383)."""
    import time

    d = str(tmp_path / "silent_topic")
    base = {
        "task_id": "phase-1-p1", "project": "alpha", "plan_id": "p1", "phase": 1,
        "thread_id": "th", "last_tool": "Edit", "last_file": "x.py",
        "started_at": "2026-03-01T09:00:00", "completed_at": None,
    }
    atomic_write_json(d, "e1.json", {**base, "status": "running", "tool_count": 1, "updated_at": "2026-03-01T09:00:10"})
    q = (
        lifecycle_stream(
            Topic(base_dir=d, schema=STATUS_SCHEMA).reader(spark), stall_minutes=0.02  # 1.2 s
        )
        .writeStream.format("memory")
        .queryName("lc_timeout")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ckpt_to"))
        .start()
    )
    try:
        deadline = time.time() + 60
        kinds = []
        while time.time() < deadline:
            kinds = [r.kind for r in spark.sql("SELECT kind FROM lc_timeout").collect()]
            if "killed" in kinds:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert kinds.count("stalled") == 2  # retry cap
    assert kinds.count("killed") == 1  # then killed, state dropped
    assert kinds[0] == "transition"


def test_queue_namespace_lifecycle_moves(tmp_path):
    ns = QueueNamespace(root=str(tmp_path / "comms"), project="alpha")
    ns.setup()
    ns.enqueue_plan({"id": "plan-x", "title": "t"})
    assert os.path.exists(os.path.join(ns.dir_for("queued_background"), "plan-x.json"))
    ns.move_plan("plan-x", "queued_background", "active")
    ns.move_plan("plan-x", "active", "completed")
    final = os.path.join(ns.dir_for("completed"), "plan-x.json")
    assert os.path.exists(final)
    assert json.load(open(final))["id"] == "plan-x"


def test_stream_static_guard_join_dispatch(spark, tmp_path):
    """J7 (starry-daemon.sh:175-195): queued-plan STREAM anti-joined
    against static active state — the project with an active plan is
    guarded out; the dispatch decision flows through a real
    writeStream/foreachBatch."""
    import json
    import os

    from nova_pulsar_spark.plans.daemon import dispatch_stream
    from nova_pulsar_spark.streaming.topics import QueueNamespace, atomic_write_json
    from tests.test_daemon import _plan

    root = str(tmp_path / "queues")
    alpha = QueueNamespace(root=root, project="alpha")
    beta = QueueNamespace(root=root, project="beta")
    alpha.setup()
    beta.setup()
    # alpha already has an ACTIVE plan → its queued bug (which would
    # otherwise win on priority) must be suppressed by the guard join
    atomic_write_json(
        alpha.dir_for("active"),
        "plan-alpha-active.json",
        _plan("plan-alpha-active", "alpha", "feature", "2026-02-25T09:00:00", [["core.py"]]),
    )
    alpha.enqueue_plan(_plan("plan-alpha-bug", "alpha", "bug", "2026-02-26T09:00:00", [["a.py"]]))
    beta.enqueue_plan(_plan("plan-beta-chore", "beta", "chore", "2026-02-27T09:00:00", [["b.py"]]))

    dispatched = dispatch_stream(spark, root, str(tmp_path / "ckpt"))

    assert dispatched == [("beta", "plan-beta-chore")]
    decision_files = [f for f in os.listdir(root) if f.startswith("dispatch-")]
    assert len(decision_files) == 1
    rec = json.load(open(os.path.join(root, decision_files[0])))
    assert rec["plan_id"] == "plan-beta-chore" and rec["action"] == "dispatch"


def test_lifecycle_stream_on_rocksdb_state_store(spark, tmp_path):
    """The stateful lifecycle machine runs unchanged on the RocksDB
    provider (the off-heap store large-state deployments need), and the
    query's progress proves RocksDB actually backed the state operator."""
    from nova_pulsar_spark.streaming.statestore import rocksdb_state_store

    d = str(tmp_path / "status_topic_rocks")
    _write_status_fixture_files(d)
    topic = Topic(base_dir=d, schema=STATUS_SCHEMA)
    with rocksdb_state_store(spark):
        q = (
            lifecycle_stream(topic.reader(spark))
            .writeStream.format("memory")
            .queryName("lifecycle_rocks")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .start()
        )
        q.awaitTermination(180)
        progresses = q.recentProgress
    stream_rows = {
        (r.plan_id, r.phase, r.kind, r.from_status, r.to_status)
        for r in spark.sql("SELECT * FROM lifecycle_rocks").collect()
        if r.kind != "stalled" or r.to_status == "retrying"
    }
    batch_rows = {
        (r.plan_id, r.phase, r.kind, r.from_status, r.to_status)
        for r in lifecycle_batch(STATUS_EVENTS.spark_df(spark)).collect()
    }
    assert stream_rows == batch_rows
    # the state operator reports rocksdb custom metrics only when the
    # RocksDB provider is the one actually loaded
    rocks_metrics = [
        k
        for p in progresses
        for op in (p.get("stateOperators") or [])
        for k in (op.get("customMetrics") or {})
        if k.startswith("rocksdb")
    ]
    assert rocks_metrics, "state operator did not run on RocksDB"


def test_max_files_per_trigger_admission_control(spark, tmp_path):
    """maxFilesPerTrigger bounds each micro-batch (the reference's
    admission control / backpressure analog): 6 queued files at cap 2
    must drain in ≥3 batches, never more than 2 files' rows per batch."""
    d = str(tmp_path / "bp_topic")
    topic = Topic(base_dir=d, schema=STATUS_SCHEMA)
    for i in range(6):
        topic.produce(
            f"s-{i}.json",
            {"task_id": f"t{i}", "project": "p", "plan_id": f"pl{i}", "phase": 1,
             "thread_id": "th", "status": "running", "tool_count": i,
             "last_tool": "Bash", "last_file": "x",
             "updated_at": "2026-02-27T11:00:00", "started_at": "2026-02-27T10:00:00",
             "completed_at": None},
        )
    q = (
        topic.reader(spark, max_files_per_trigger=2)
        .writeStream.format("memory")
        .queryName("bp_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "bp_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) c FROM bp_out").first().c == 6  # nothing dropped
    batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 3 and max(batches) <= 2


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Event-time correctness under lateness: an event older than the
    watermark arriving in a later micro-batch must NOT resurrect its
    (already-finalized) window — the append-mode contract large-scale
    streaming aggregation depends on."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def emit(name, *rows):
        with open(os.path.join(src, f".tmp-{name}"), "w") as f:
            for eid, ts, v in rows:
                f.write(json.dumps({"event_id": eid, "ts": ts, "value": v}) + "\n")
        os.replace(os.path.join(src, f".tmp-{name}"), os.path.join(src, name))

    agg = (
        spark.readStream.schema(schema)
        .json(src)
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    emit("b1.json", (1, "2026-01-01T10:00:00", 1.0), (2, "2026-01-01T10:02:00", 1.0))
    q = (
        agg.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # watermark -> 09:57
        emit("b2.json", (3, "2026-01-01T10:20:00", 1.0))
        q.processAllAvailable()  # watermark -> 10:15, closes the 10:00 window
        emit("b3.json", (4, "2026-01-01T10:01:00", 1.0))  # LATE: below watermark
        emit("b4.json", (5, "2026-01-01T10:40:00", 1.0))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.window_start.isoformat(): r.n for r in spark.sql("SELECT * FROM late_out").collect()}
    # the 10:00-10:05 window was finalized with exactly the 2 on-time
    # events; the late event_id=4 was dropped, not appended
    assert got.get("2026-01-01T10:00:00") == 2


def test_transform_with_state_counter_matches_batch(spark, tmp_path):
    """Spark 4 processor API (transformWithStateInPandas) on RocksDB:
    per-plan running counts; the final update per key equals the batch
    groupBy count. The Python state-server protocol needs protobuf;
    where the container lacks it the test degrades to a plan-level
    assertion (the streaming frame analyzes with the right schema and
    unresolved state operator) instead of skipping — the live path
    runs wherever protobuf exists."""
    from nova_pulsar_spark.streaming.processors import event_counter_stream
    from nova_pulsar_spark.streaming.statestore import rocksdb_state_store

    d = str(tmp_path / "tws_topic")
    _write_status_fixture_files(d)
    topic = Topic(base_dir=d, schema=STATUS_SCHEMA)

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        # Plan-only degradation: transformWithStateInPandas builds and
        # analyzes the streaming plan JVM-side (schema + operator) —
        # only query START needs the protobuf state-server protocol.
        out = event_counter_stream(topic.reader(spark))
        assert out.isStreaming
        assert [f.name for f in out.schema.fields] == ["plan_id", "n_events"]
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "TransformWithStateInPySpark" in plan or "transformWithState" in plan.lower()
        return
    with rocksdb_state_store(spark):
        q = (
            event_counter_stream(topic.reader(spark))
            .writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .start()
        )
        q.awaitTermination(180)
    # last emitted count per plan == total events per plan
    want = (
        topic.read_batch(spark)
        .groupBy("plan_id")
        .count()
        .collect()
    )
    got_rows = spark.sql("SELECT * FROM tws_out").collect()
    final = {}
    for r in got_rows:  # update mode: keep the max (monotone counter)
        final[r.plan_id] = max(final.get(r.plan_id, 0), r.n_events)
    assert final == {r.plan_id: r["count"] for r in want}


def test_event_time_timeout_deterministic_stall_then_kill(spark, tmp_path):
    """EventTimeTimeout variant: the stall clock is the WATERMARK, so
    incidents fire at data-determined instants (last_event + k·stall) —
    byte-identical across replays, unlike wall-clock timeouts. Other
    plans' events advance the watermark; the silent plan p1 is stalled
    twice (retry cap) and then killed, at exactly +10/+20/+30 min."""
    import datetime as dt
    import time

    from nova_pulsar_spark.streaming.state import lifecycle_stream_event_time

    d = str(tmp_path / "et_topic")
    base = {
        "task_id": "phase-1", "project": "alpha", "phase": 1,
        "thread_id": "th", "last_tool": "Edit", "last_file": "x.py",
        "started_at": "2026-03-01T09:00:00", "completed_at": None,
        "status": "running",
    }
    atomic_write_json(d, "e1.json", {**base, "plan_id": "p1", "tool_count": 1,
                                     "updated_at": "2026-03-01T09:00:10"})
    stream = (
        Topic(base_dir=d, schema=STATUS_SCHEMA)
        .reader(spark)
        .withWatermark("updated_at", "1 minute")
    )
    q = (
        lifecycle_stream_event_time(stream, stall_minutes=10)
        .writeStream.format("memory")
        .queryName("lc_et")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt_et"))
        .start()
    )

    def p1_rows():
        return sorted(
            (
                (r.kind, r.at)
                for r in spark.sql("SELECT kind, at FROM lc_et WHERE plan_id = 'p1'").collect()
            ),
            key=lambda t: (t[1] is None, t[1]),
        )

    def wait_for(n_rows, feed_name=None, feed_at=None):
        if feed_name:
            atomic_write_json(d, feed_name, {**base, "plan_id": "p2", "tool_count": 1,
                                             "updated_at": feed_at})
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = p1_rows()
            if len(rows) >= n_rows:
                return rows
            time.sleep(0.5)
        return p1_rows()

    try:
        assert wait_for(1)[0][0] == "transition"
        # each later event advances the watermark past p1's armed timeout
        rows = wait_for(2, "e2.json", "2026-03-01T10:00:00")
        rows = wait_for(3, "e3.json", "2026-03-01T11:00:00")
        rows = wait_for(4, "e4.json", "2026-03-01T12:00:00")
    finally:
        q.stop()
    assert [k for k, _ in rows] == ["transition", "stalled", "stalled", "killed"]
    # fire instants are pure functions of the data: last_event + k*stall
    t0 = dt.datetime(2026, 3, 1, 9, 0, 10)
    assert [at for _, at in rows[1:]] == [
        t0 + dt.timedelta(minutes=10),
        t0 + dt.timedelta(minutes=20),
        t0 + dt.timedelta(minutes=30),
    ]


def test_parquet_merge_sink_upserts_across_restarts(spark, tmp_path):
    """foreachBatch MERGE: an update-mode aggregation feeds per-key
    deltas; the sink merges them into a versioned parquet snapshot with
    an atomic pointer swap. A second run on the same checkpoint picks
    up only the new file and upserts — existing keys survive, updated
    keys move — and replaying an applied batch_id is a no-op."""
    from pyspark.sql import functions as F

    from nova_pulsar_spark.streaming.sinks import ParquetMergeSink

    d = str(tmp_path / "merge_topic")
    base = {
        "task_id": "t", "project": "alpha", "phase": 1, "thread_id": "th",
        "status": "running", "last_tool": "Edit", "last_file": "x.py",
        "started_at": "2026-03-01T09:00:00", "completed_at": None,
    }
    atomic_write_json(d, "e1.json", {**base, "plan_id": "p1", "tool_count": 1,
                                     "updated_at": "2026-03-01T09:00:10"})
    atomic_write_json(d, "e2.json", {**base, "plan_id": "p2", "tool_count": 5,
                                     "updated_at": "2026-03-01T09:01:10"})
    sink = ParquetMergeSink(str(tmp_path / "merge_table"), ["plan_id"])
    ckpt = str(tmp_path / "ckpt_merge")

    def run_once():
        agg = (
            Topic(base_dir=d, schema=STATUS_SCHEMA)
            .reader(spark)
            .groupBy("plan_id")
            .agg(F.max("tool_count").alias("max_tools"), F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    snap = {r.plan_id: (r.max_tools, r.n_events) for r in sink.read_snapshot(spark).collect()}
    assert snap == {"p1": (1, 1), "p2": (5, 1)}

    # restart with a new event for p1 only: p2's row must survive the merge
    atomic_write_json(d, "e3.json", {**base, "plan_id": "p1", "tool_count": 7,
                                     "updated_at": "2026-03-01T09:02:10"})
    run_once()
    snap = {r.plan_id: (r.max_tools, r.n_events) for r in sink.read_snapshot(spark).collect()}
    assert snap == {"p1": (7, 2), "p2": (5, 1)}

    # replaying an already-applied batch_id is a no-op
    before = sink.current()
    sink(spark.createDataFrame([("poison", 99, 99)], "plan_id string, max_tools int, n_events long"),
         before["batch_id"])
    assert sink.current() == before
    assert "poison" not in {r.plan_id for r in sink.read_snapshot(spark).collect()}

    # checkpoint recreated while the sink root persists: batch ids
    # restart at 0 — the recorded lineage id must detect the fresh
    # lineage and MERGE instead of silently serving the stale snapshot
    import shutil

    shutil.rmtree(ckpt)
    atomic_write_json(d, "e4.json", {**base, "plan_id": "p3", "tool_count": 9,
                                     "updated_at": "2026-03-01T09:03:10"})
    run_once()
    snap = {r.plan_id: (r.max_tools, r.n_events) for r in sink.read_snapshot(spark).collect()}
    # fresh checkpoint re-reads ALL files (e1..e4): the batch-0 merge
    # applied despite batch_id 0 <= recorded 1 — new p3 is present
    assert snap == {"p1": (7, 2), "p2": (5, 1), "p3": (9, 1)}


def test_event_time_timeout_recovery_is_value_deterministic(spark, tmp_path):
    """Kill the event-time lifecycle query mid-stream and restart it from
    the same checkpoint: recovered state picks up where it left off, and
    because incident times are data-determined (last_event + k·stall),
    any at-least-once replay re-emits VALUE-IDENTICAL rows — the union
    of both runs dedupes to exactly the canonical incident sequence."""
    import datetime as dt
    import time

    from nova_pulsar_spark.streaming.state import lifecycle_stream_event_time

    d = str(tmp_path / "rec_topic")
    ckpt = str(tmp_path / "ckpt_rec")
    base = {
        "task_id": "phase-1", "project": "alpha", "phase": 1,
        "thread_id": "th", "last_tool": "Edit", "last_file": "x.py",
        "started_at": "2026-03-01T09:00:00", "completed_at": None,
        "status": "running",
    }

    def start(sink_rows):
        # foreachBatch (not the memory sink): it is the sink that
        # SUPPORTS checkpoint recovery, which is the point of the test
        def collect(batch_df, batch_id):
            sink_rows.extend(
                (r.kind, r.at) for r in batch_df.collect() if r.plan_id == "p1"
            )

        stream = (
            Topic(base_dir=d, schema=STATUS_SCHEMA)
            .reader(spark)
            .withWatermark("updated_at", "1 minute")
        )
        return (
            lifecycle_stream_event_time(stream, stall_minutes=10)
            .writeStream.foreachBatch(collect)
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .option("checkpointLocation", ckpt)
            .start()
        )

    def wait_until(sink_rows, pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred(set(sink_rows)):
                break
            time.sleep(0.5)
        return set(sink_rows)

    # run 1: transition, then first stall (watermark pushed by p2)
    atomic_write_json(d, "e1.json", {**base, "plan_id": "p1", "tool_count": 1,
                                     "updated_at": "2026-03-01T09:00:10"})
    rows1: list = []
    q1 = start(rows1)
    try:
        wait_until(rows1, lambda rows: any(k == "transition" for k, _ in rows))
        atomic_write_json(d, "e2.json", {**base, "plan_id": "p2", "tool_count": 1,
                                         "updated_at": "2026-03-01T10:00:00"})
        run1 = wait_until(rows1, lambda rows: any(k == "stalled" for k, _ in rows))
    finally:
        q1.stop()

    # run 2: SAME checkpoint, more watermark-advancing data → the
    # recovered state continues to the second stall and the kill
    # (staggered feeds: each timeout re-arms just above the current
    # watermark, so it needs the NEXT watermark advance to fire)
    atomic_write_json(d, "e3.json", {**base, "plan_id": "p2", "tool_count": 2,
                                     "updated_at": "2026-03-01T11:00:00"})
    rows2: list = []
    q2 = start(rows2)
    try:
        wait_until(rows2, lambda rows: any(k == "stalled" for k, _ in rows))
        atomic_write_json(d, "e4.json", {**base, "plan_id": "p2", "tool_count": 3,
                                         "updated_at": "2026-03-01T12:00:00"})
        run2 = wait_until(rows2, lambda rows: any(k == "killed" for k, _ in rows))
    finally:
        q2.stop()

    t0 = dt.datetime(2026, 3, 1, 9, 0, 10)
    canonical = {
        ("transition", None),
        ("stalled", t0 + dt.timedelta(minutes=10)),
        ("stalled", t0 + dt.timedelta(minutes=20)),
        ("killed", t0 + dt.timedelta(minutes=30)),
    }
    got = {(k, at if k != "transition" else None) for k, at in (run1 | run2)}
    # at-least-once across the restart, but value-identical rows: the
    # union dedupes to exactly the canonical sequence
    assert got == canonical
    # and the restarted run did NOT re-emit the already-committed
    # transition (state recovery, not reprocessing from scratch)
    assert all(k != "transition" for k, _ in run2)


def test_stream_dedup_within_watermark_drops_in_window_dups(spark, tmp_path):
    """Live ingest-time dedup: dropDuplicatesWithinWatermark over a
    document stream keyed by content hash. In-window duplicate texts
    are dropped regardless of arrival batch; distinct texts and
    duplicates arriving AFTER state expiry pass through — the
    streaming rendition of llm_dedup_exact for continuous ingest."""
    from pyspark.sql import types as T

    d = str(tmp_path / "doc_topic")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ingested_at", T.TimestampType()),
        ]
    )

    def emit(name, doc_id, text, ts):
        atomic_write_json(d, name, {"doc_id": doc_id, "text": text, "ingested_at": ts})

    emit("b0-a.json", 1, "alpha beta gamma", "2026-03-01T09:00:00")
    emit("b0-b.json", 2, "alpha beta gamma", "2026-03-01T09:00:05")   # dup, same batch
    emit("b0-c.json", 3, "delta epsilon zeta", "2026-03-01T09:00:10")

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.json")
        .json(d)
        .withColumn("text_hash", F.md5(F.col("text").cast("binary")))
        .withWatermark("ingested_at", "10 minutes")
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sdedup_out")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "sdedup_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # later batch: one more dup inside the window + one new text
        emit("b1-a.json", 4, "alpha beta gamma", "2026-03-01T09:02:00")  # dup, cross-batch
        emit("b1-b.json", 5, "eta theta iota", "2026-03-01T09:02:30")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT doc_id, text FROM sdedup_out").collect()
    got_ids = sorted(r.doc_id for r in rows)
    # one survivor per distinct text: exactly one of the same-batch dup
    # pair {1, 2} (intra-batch survivor choice is not order-guaranteed),
    # and the cross-batch in-window dup doc 4 is always dropped
    assert len(rows) == 3 and len({r.text for r in rows}) == 3
    assert len({1, 2} & set(got_ids)) == 1
    assert 3 in got_ids and 5 in got_ids and 4 not in got_ids


def test_stream_stream_interval_join_live(spark, tmp_path):
    """The watermarked two-stream interval join produces exactly the
    batch-rendition matches: in-window clicks join, out-of-window and
    cross-user clicks never appear, state is bounded by watermarks."""
    from pyspark.sql import types as T

    from nova_pulsar_spark.streaming.stream_queries import stream_interval_join

    v_schema = T.StructType(
        [
            T.StructField("imp_id", T.LongType()),
            T.StructField("view_user", T.LongType()),
            T.StructField("view_ts", T.TimestampType()),
        ]
    )
    c_schema = T.StructType(
        [
            T.StructField("click_id", T.LongType()),
            T.StructField("click_user", T.LongType()),
            T.StructField("click_ts", T.TimestampType()),
        ]
    )
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    os.makedirs(vsrc)
    os.makedirs(csrc)

    def emit(src, name, rows):
        with open(os.path.join(src, f".tmp-{name}"), "w") as f:
            for rec in rows:
                f.write(json.dumps(rec) + "\n")
        os.replace(os.path.join(src, f".tmp-{name}"), os.path.join(src, name))

    emit(
        vsrc,
        "v1.json",
        [
            {"imp_id": 1, "view_user": 7, "view_ts": "2026-01-01T10:00:00"},
            {"imp_id": 2, "view_user": 8, "view_ts": "2026-01-01T10:00:00"},
        ],
    )
    emit(
        csrc,
        "c1.json",
        [
            {"click_id": 11, "click_user": 7, "click_ts": "2026-01-01T10:04:00"},  # match imp 1
            {"click_id": 12, "click_user": 7, "click_ts": "2026-01-01T10:30:00"},  # too late
            {"click_id": 13, "click_user": 9, "click_ts": "2026-01-01T10:01:00"},  # no view
        ],
    )
    joined = stream_interval_join(
        spark.readStream.schema(v_schema).json(vsrc),
        spark.readStream.schema(c_schema).json(csrc),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "attrib_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: a click for user 8 inside ITS window still matches
        emit(
            csrc,
            "c2.json",
            [{"click_id": 14, "click_user": 8, "click_ts": "2026-01-01T10:09:59"}],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.imp_id, r.click_id, r.user_id, r.delay_s) for r in spark.sql("SELECT * FROM attrib_out").collect()}
    assert got == {(1, 11, 7, 240), (2, 14, 8, 599)}


def test_delta_agg_sink_accumulates_across_batches(spark, tmp_path):
    """Delta-accumulation MV maintenance: append-mode batches reduce to
    per-key partial sums that the sink adds into a versioned snapshot;
    totals equal the batch-computed aggregate over all input, and a
    replayed batch_id is a no-op (no double counting)."""
    from pyspark.sql import types as T

    from nova_pulsar_spark.streaming.sinks import DeltaAggSink

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("amount", T.LongType()),
        ]
    )
    src = str(tmp_path / "delta_src")
    os.makedirs(src)

    def emit(name, rows):
        with open(os.path.join(src, f".tmp-{name}"), "w") as f:
            for rec in rows:
                f.write(json.dumps(rec) + "\n")
        os.replace(os.path.join(src, f".tmp-{name}"), os.path.join(src, name))

    sink = DeltaAggSink(str(tmp_path / "delta_table"), ["k"], ["n", "amount"])
    ckpt = str(tmp_path / "delta_ckpt")

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .json(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    emit("b1.json", [{"k": "a", "n": 1, "amount": 10}, {"k": "a", "n": 1, "amount": 5},
                     {"k": "b", "n": 1, "amount": 7}])
    run_once()
    emit("b2.json", [{"k": "a", "n": 1, "amount": 100}, {"k": "c", "n": 1, "amount": 1}])
    run_once()

    snap = {r.k: (r.n, r.amount) for r in sink.read_snapshot(spark).collect()}
    assert snap == {"a": (3, 115), "b": (1, 7), "c": (1, 1)}

    # replay: re-applying an old batch df with a stale batch_id is a no-op
    stale = spark.createDataFrame([("a", 1, 999)], schema)
    cur_before = sink.current()
    sink(stale, batch_id=0)
    assert sink.current() == cur_before
    snap2 = {r.k: (r.n, r.amount) for r in sink.read_snapshot(spark).collect()}
    assert snap2 == snap


def test_session_window_merges_across_microbatches(spark, tmp_path):
    """Streaming session windows: events arriving in DIFFERENT micro-
    batches but within the gap must merge into one session (the state-
    store session-merge path batch mode never exercises); sessions
    close and emit only when the watermark passes end+gap."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "sess_src")
    os.makedirs(src)

    def emit(name, rows):
        with open(os.path.join(src, f".tmp-{name}"), "w") as f:
            for uid, ts in rows:
                f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")
        os.replace(os.path.join(src, f".tmp-{name}"), os.path.join(src, name))

    sessions = (
        spark.readStream.schema(schema)
        .json(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n_events")
    )
    emit("b1.json", [(7, "2026-01-01T10:00:00"), (7, "2026-01-01T10:02:00"), (8, "2026-01-01T10:00:00")])
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # lands in batch 2, within 5 min of user 7's open session -> merge
        emit("b2.json", [(7, "2026-01-01T10:04:00")])
        q.processAllAvailable()
        # advance the watermark far enough to close and emit everything
        emit("b3.json", [(9, "2026-01-01T10:40:00")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.s.isoformat(), r.e.isoformat(), r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == {
        (7, "2026-01-01T10:00:00", "2026-01-01T10:09:00", 3),  # merged across batches
        (8, "2026-01-01T10:00:00", "2026-01-01T10:05:00", 1),
    }  # user 9's session is still open: not emitted in append mode


def test_watermark_drops_late_rows_and_reports_metric(spark, tmp_path):
    """Late-data semantics, observable: a row older than the watermark
    is dropped by the stateful dedup's input filter and the drop is
    visible in stateOperators.numRowsDroppedByWatermark — the metric a
    100 TB ingest pipeline alerts on (silent late-drop = data loss).

    Empirical Spark 4.1 subtlety this test pins: the INPUT filter uses
    the watermark with one micro-batch of lag (the value computed two
    commits back), while state EVICTION uses the previous commit's
    value — so a late row needs the advancing batch plus one more
    batch before it is filtered. A windowed aggregation never
    input-filters at all in this version (eviction-only); dedup does.
    """
    import datetime as dt
    import time as _time

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{name}")

    t = lambda m: dt.datetime(2026, 3, 1, 10, 0, 0) + dt.timedelta(minutes=m)
    # batch 0 advances the watermark to 10:49 (max 10:59 - 10m delay)
    write_file("b1", [(t(0), "a", 1.0), (t(59), "a", 1.0)])
    _time.sleep(1.1)  # distinct mtimes => deterministic file order
    # batch 1: fresh row only (lets the 10:49 watermark reach the filter)
    write_file("b2", [(t(60), "a", 1.0)])
    _time.sleep(1.1)
    # batch 2: one row at 10:05 (< watermark) + one fresh
    write_file("b3", [(t(5), "b", 1.0), (t(65), "a", 1.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_type", "ts"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in (p["stateOperators"] or [])
    )
    assert dropped == 1
    got = sorted(r["ts"] for r in spark.sql("SELECT ts FROM late_out").collect())
    assert t(5) not in got          # the late row was filtered, not emitted
    assert got == [t(0), t(59), t(60), t(65)]


def test_streaming_curation_pipeline_scrub_quality_gate(spark, tmp_path):
    """The curation ops are plain narrow transforms, so the SAME code
    runs on a readStream frame: ingest JSONL docs -> PII scrub ->
    quality gate -> sink. Pins that the batch-oracle-checked curation
    surface composes with Structured Streaming unchanged (map-only
    plan: no watermark needed, nothing stateful)."""
    import json as _json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from nova_pulsar_spark.operators.pipeline import _EMAIL_RE, _LONGNUM_RE, _PHONE_RE

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    docs = [
        {"doc_id": 1, "text": "reach me at bob@example.com for the spark table query plan"},
        {"doc_id": 2, "text": "short"},
        {"doc_id": 3, "text": " ".join(["w%d" % i for i in range(30)]) + " acct 123456789"},
    ]
    with open(os.path.join(src, "batch-0.json"), "w") as f:
        for r in docs:
            f.write(_json.dumps(r) + "\n")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(src)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _LONGNUM_RE,
        "<ID>",
    )
    curated = (
        stream.select("doc_id", clean.alias("clean_text"))
        .withColumn("n_words", F.size(F.split("clean_text", " ")))
        .filter(F.col("n_words") >= 10)  # quality gate
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("curated_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = {r.doc_id: r for r in spark.sql("SELECT * FROM curated_out").collect()}
    assert set(out) == {1, 3}  # doc 2 fails the gate
    assert "<EMAIL>" in out[1].clean_text and "@" not in out[1].clean_text
    assert "<ID>" in out[3].clean_text and "123456789" not in out[3].clean_text


def test_streaming_near_dup_index_across_microbatches(spark, tmp_path):
    """The band-signature state store is a live dedup index: batch 1
    indexes a doc; after a restart-with-checkpoint, a near-identical
    doc arriving in batch 2 collides with it (is_new=false, first_doc
    = the original), while an unrelated doc claims fresh buckets.
    Batch parity: colliding buckets match the row-local band
    signatures computed in batch mode."""
    import json as _json
    import os

    from pyspark.sql import types as T

    from nova_pulsar_spark.streaming.ingest_dedup import band_signatures, near_dup_stream

    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )

    def write_doc(name, doc_id, text):
        with open(os.path.join(src, name), "w") as f:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def run_available_now():
        got: list = []
        stream = spark.readStream.schema(schema).json(src)
        q = (
            near_dup_stream(stream)
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return got

    write_doc("b1.json", 1, base)
    first = run_available_now()
    assert first and all(r.is_new and r.first_doc == 1 for r in first)

    # batch 2: same text under a new doc_id (deterministic collision on
    # every band — WHICH bands a one-word edit preserves depends on
    # which shingle wins each min, the batch suite's concern) + an
    # unrelated doc claiming fresh buckets
    write_doc("b2.json", 2, base)
    write_doc("b3.json", 3, "totally different words with nothing shared here at all")
    out = run_available_now()
    hits2 = [r for r in out if r.doc_id == 2 and not r.is_new]
    assert hits2 and all(r.first_doc == 1 for r in hits2)  # collided with the index
    assert all(r.is_new for r in out if r.doc_id == 3)  # fresh buckets

    # stream/batch bucket parity
    bdocs = spark.createDataFrame([(1, base)], "doc_id long, text string")
    batch_sigs = {(r.band, r.sig) for r in band_signatures(bdocs).collect()}
    assert {(r.band, r.sig) for r in hits2} <= batch_sigs


def test_streaming_embedding_near_dup_index_across_microbatches(spark, tmp_path):
    """ANN mirror of the text ingest-dedup index: batch 1 indexes a
    vector's sign-LSH buckets; after restart-with-checkpoint an
    identical-direction vector arriving in batch 2 collides on EVERY
    band (is_new=false, first_vec = the original), and stream buckets
    match the batch-side signature family."""
    import json as _json
    import os

    from pyspark.sql import types as T

    from nova_pulsar_spark.operators.similarity import DIM, N_BANDS as EMB_BANDS
    from nova_pulsar_spark.streaming.ingest_dedup import (
        embedding_band_signatures,
        embedding_near_dup_stream,
    )

    src = str(tmp_path / "vecs_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    base = [(1.0 if i % 3 == 0 else -0.5) for i in range(DIM)]
    other = [(-1.0 if i % 2 == 0 else 0.25) for i in range(DIM)]

    def write_vec(name, vec_id, emb):
        with open(os.path.join(src, name), "w") as f:
            f.write(_json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")

    def run_available_now():
        got: list = []
        stream = spark.readStream.schema(schema).json(src)
        q = (
            embedding_near_dup_stream(stream)
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return got

    write_vec("b1.json", 1, base)
    first = run_available_now()
    assert len(first) == EMB_BANDS and all(r.is_new and r.first_vec == 1 for r in first)

    write_vec("b2.json", 2, base)  # identical direction -> same sigs everywhere
    write_vec("b3.json", 3, other)
    second = run_available_now()
    hits = [r for r in second if r.vec_id == 2]
    assert len(hits) == EMB_BANDS and all(
        not r.is_new and r.first_vec == 1 for r in hits
    )  # collided with the checkpointed index on every band
    assert any(r.vec_id == 3 and r.is_new for r in second)  # fresh claims

    # stream/batch signature parity at the claim rung
    batch_sigs = {
        (r.band, r.sig)
        for r in embedding_band_signatures(
            spark.createDataFrame([(1, base)], schema)
        ).collect()
    }
    assert {(r.band, r.sig) for r in first} == batch_sigs


def _partition_of(universe, edges):
    """Connected components (frozenset of frozensets) of `universe`
    under the undirected `edges` — the dup-membership partition."""
    parent = {d: d for d in universe}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    clusters: dict = {}
    for d in universe:
        clusters.setdefault(find(d), set()).add(d)
    return frozenset(frozenset(c) for c in clusters.values())


def test_stream_claim_and_batch_recover_agree_on_partition(spark, tmp_path):
    """VERDICT r9 #5: the streaming ingest path links every colliding
    doc to the bucket's FIRST owner (arrival order,
    ingest_dedup._claim_bucket), the batch cap-recover links to the
    bucket's MIN doc_id (dedup.lsh_cap_recover_pairs). On a corpus
    replayed so arrival order ≠ id order the chosen REPRESENTATIVES
    disagree — by design — but the invariant that matters for corpus
    ownership must hold: both produce the SAME dup-membership
    partition (identical doc→cluster sets), because each path emits a
    star over the same bucket member sets and stars with different
    centers span the same component."""
    import json as _json
    import os

    from pyspark.sql import types as T

    from nova_pulsar_spark.operators.dedup import lsh_cap_recover_pairs
    from nova_pulsar_spark.streaming.ingest_dedup import near_dup_stream

    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    clique_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clique_b = "one two three four five six seven eight nine ten eleven"
    lone = "nothing here resembles anything else in this corpus at all"
    corpus = [(10, clique_a), (11, clique_a), (12, clique_a), (20, clique_b), (21, clique_b), (30, lone)]

    def write_doc(name, doc_id, text):
        with open(os.path.join(src, name), "w") as f:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def run_available_now(sink: list):
        q = (
            near_dup_stream(spark.readStream.schema(schema).json(src))
            .writeStream.foreachBatch(lambda df, bid: sink.extend(df.collect()))
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    # replay with arrival order OPPOSITE to id order: the HIGHEST ids
    # land in micro-batch 1 and claim the buckets, so the stream's
    # representatives (12, 21) differ from the batch MIN-id reps (10, 20)
    rows: list = []
    write_doc("b1a.json", 12, clique_a)
    write_doc("b1b.json", 21, clique_b)
    run_available_now(rows)
    for name, (doc_id, text) in zip(
        ("b2a.json", "b2b.json", "b2c.json", "b2d.json"),
        [(10, clique_a), (11, clique_a), (20, clique_b), (30, lone)],
    ):
        write_doc(name, doc_id, text)
    run_available_now(rows)

    stream_edges = {(int(r.doc_id), int(r.first_doc)) for r in rows if not r.is_new}
    stream_reps = {int(r.first_doc) for r in rows if not r.is_new}
    assert stream_reps == {12, 21}  # first-arrival ownership, not min-id

    bdocs = spark.createDataFrame(corpus, schema)
    # cap=1: every bucket of >=2 members emits (rep=MIN doc_id, member)
    # pairs — the same bucket universe the uncapped stream claims over
    batch_pairs = lsh_cap_recover_pairs(bdocs, max_bucket=1).collect()
    batch_edges = {(int(r.doc_a), int(r.doc_b)) for r in batch_pairs}
    batch_reps = {int(r.doc_a) for r in batch_pairs}
    assert batch_reps == {10, 20}  # MIN-doc_id ownership

    universe = [d for d, _ in corpus]
    stream_partition = _partition_of(universe, stream_edges)
    batch_partition = _partition_of(universe, batch_edges)
    assert stream_partition == batch_partition == frozenset(
        {frozenset({10, 11, 12}), frozenset({20, 21}), frozenset({30})}
    )
