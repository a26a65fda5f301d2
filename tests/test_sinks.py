"""Exactly-once sink contract (Q9): idempotent foreachBatch replays."""

from __future__ import annotations

import json
import os

from nova_pulsar_spark.streaming.sinks import AppendLogSink, JsonDirSink


def test_json_dir_sink_idempotent_replay(spark, tmp_path):
    d = str(tmp_path / "out")
    sink = JsonDirSink(d, key_cols=["plan_id", "phase"])
    batch = spark.createDataFrame(
        [("p1", 1, "running"), ("p1", 2, "completed")], "plan_id string, phase int, status string"
    )
    sink(batch, batch_id=0)
    files = {f for f in os.listdir(d) if f.endswith(".json")}
    assert files == {"p1-1.json", "p1-2.json"}
    before = {f: open(os.path.join(d, f)).read() for f in files}
    # checkpoint replay: same batch_id → no-op even with different data
    changed = spark.createDataFrame([("p1", 1, "failed")], "plan_id string, phase int, status string")
    sink(changed, batch_id=0)
    after = {f: open(os.path.join(d, f)).read() for f in files}
    assert before == after
    # a NEW batch does apply
    sink(changed, batch_id=1)
    assert json.load(open(os.path.join(d, "p1-1.json")))["status"] == "failed"


def test_json_dir_sink_streaming_end_to_end(spark, tmp_path):
    from nova_pulsar_spark.streaming.topics import STATUS_SCHEMA, Topic, atomic_write_json
    from nova_pulsar_spark.plans.fixtures import STATUS_EVENTS

    src = str(tmp_path / "src")
    cols = [c for c, _ in STATUS_EVENTS.columns]
    for i, row in enumerate(STATUS_EVENTS.rows[:6]):
        rec = {c: (v.isoformat() if hasattr(v, "isoformat") else v) for c, v in zip(cols, row)}
        atomic_write_json(src, f"ev-{i}.json", rec)
    out_dir = str(tmp_path / "sinkout")
    sink = JsonDirSink(out_dir, key_cols=["plan_id", "phase"])
    q = (
        Topic(base_dir=src, schema=STATUS_SCHEMA)
        .reader(spark)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    written = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    assert written  # one file per (plan, phase) key observed


def test_append_log_sink(spark, tmp_path):
    p = str(tmp_path / "logs" / "daemon.log")
    sink = AppendLogSink(p)
    batch = spark.createDataFrame([("dispatch", "p1")], "action string, plan_id string")
    sink(batch, 0)
    sink(batch, 1)
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 2 and json.loads(lines[0])["action"] == "dispatch"


def test_append_log_sink_replay_is_noop(spark, tmp_path):
    """Replaying the SAME batch_id (checkpoint recovery) must not
    duplicate the batch's lines."""
    p = str(tmp_path / "log2" / "daemon.log")
    sink = AppendLogSink(p)
    batch = spark.createDataFrame([("dispatch", "p1")], "action string, plan_id string")
    sink(batch, 0)
    sink(batch, 0)  # replay
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 1
