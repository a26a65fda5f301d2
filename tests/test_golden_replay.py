"""Golden end-to-end replay of the reference's daemon story
(VERDICT r5 task #3) — ONE synthetic timeline driven through the full
queue layer, with the complete observable output byte-pinned to a
committed artifact (`tests/golden/daemon_replay.json`).

The timeline replays `scripts/starry-daemon.sh:171-226` +
`agents/orbiter.md:151-293` end to end:

  queue 2 plans → at-most-one-active gate → Orbiter top-1 dispatch
  (file move + board upsert) → phase status stream → claim CAS
  rejection → stall at EXACTLY the 10-minute boundary (10:00 silence
  is NOT a stall, 10:01 is) → retry cap 2 → kill → post-terminal
  suppression → watcher pulse with incidents → plan completion →
  watcher auto-exit.

Every clock is injected, every event timestamp synthetic, so the
replay is a pure function of this file — any semantic drift in the
queue layer (dispatch ordering, state machine, pulse shape, board
protocol) shows up as a byte diff against the golden artifact. The
golden file is the living spec of the queue layer; regenerate
deliberately with REGEN_GOLDEN=1 and review the diff like code.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nova_pulsar_spark.plans.daemon import (
    _update_board,
    dispatch_once,
    monitor_once,
    watcher_should_exit,
)
from nova_pulsar_spark.streaming.state import lifecycle_batch
from nova_pulsar_spark.streaming.topics import QueueNamespace, atomic_write_json

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "daemon_replay.json")

T0 = datetime(2026, 3, 1, 12, 0, 0)


def _plan(pid, project, ptype, created, phases):
    return {
        "id": pid,
        "title": pid,
        "project": project,
        "type": ptype,
        "execution_mode": "background",
        "created_at": created,
        "n_phases": len(phases),
        "phases": [
            {"phase": i + 1, "title": f"ph{i+1}", "files": files, "complexity": "Low"}
            for i, files in enumerate(phases)
        ],
    }


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("plan_id", T.StringType()),
        T.StructField("phase", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("thread_id", T.StringType()),
        T.StructField("tool_count", T.IntegerType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

PLAN_ID = "plan-20260226-0900"

# (phase, status, thread, tool_count, updated_at) — the synthetic
# status-event history of the dispatched plan. Phase 1 exercises the
# stall/retry/kill ladder; phase 2 completes cleanly.
TIMELINE = [
    # phase 1, owner thread th-1
    (1, "running", "th-1", 3, "2026-03-01 12:01:00"),
    # EXACTLY 10:00 of silence — the boundary is `> stall`, so NOT a stall
    (1, "running", "th-1", 5, "2026-03-01 12:11:00"),
    # claim CAS: a second thread touches the phase → rejected
    (1, "running", "th-2", 99, "2026-03-01 12:12:00"),
    # 11:01 silence → stalled (retry 1)
    (1, "running", "th-1", 7, "2026-03-01 12:22:01"),
    # 11:01 silence → stalled (retry 2 = cap)
    (1, "running", "th-1", 8, "2026-03-01 12:33:02"),
    # 11:01 silence, retries at cap → KILLED
    (1, "running", "th-1", 9, "2026-03-01 12:44:03"),
    # event after the kill → suppressed (terminal states are sticky)
    (1, "running", "th-1", 10, "2026-03-01 12:45:00"),
    # phase 2, owner thread th-1: clean run → completed → late echo
    (2, "running", "th-1", 2, "2026-03-01 12:02:00"),
    (2, "completed", "th-1", 6, "2026-03-01 12:08:00"),
    (2, "running", "th-1", 7, "2026-03-01 12:09:00"),
]


def _replay(spark, tmp_path) -> dict:
    root = str(tmp_path / "golden_comms")
    for proj in ("alpha", "beta"):
        QueueNamespace(root=root, project=proj).setup()
    alpha = QueueNamespace(root=root, project="alpha")
    beta = QueueNamespace(root=root, project="beta")
    # beta's bug plan is oldest-queued → O1 priority top-1
    beta.enqueue_plan(_plan(PLAN_ID, "beta", "bug", "2026-02-26T09:00:00", [["b.py"], ["c.py"]]))
    alpha.enqueue_plan(
        _plan("plan-20260228-1000", "alpha", "feature", "2026-02-28T10:00:00", [["a.py"]])
    )

    # 1. daemon cycle: Orbiter top-1, file move, board upsert
    d1 = dispatch_once(spark, root, T0)
    # 2. second cycle while active → the at-most-one-active gate
    d2 = dispatch_once(spark, root, T0)

    # 3. the status-event history through the lifecycle state machine
    events = spark.createDataFrame(
        [
            (PLAN_ID, ph, st, th, tc, datetime.fromisoformat(at))
            for ph, st, th, tc, at in TIMELINE
        ],
        EVENT_SCHEMA,
    )
    transitions = [
        {
            "plan_id": r["plan_id"],
            "phase": r["phase"],
            "kind": r["kind"],
            "from_status": r["from_status"],
            "to_status": r["to_status"],
            "tool_count": r["tool_count"],
            "at": r["at"].isoformat(),
        }
        for r in sorted(
            lifecycle_batch(events).collect(),
            key=lambda r: (r["phase"], r["at"], r["kind"]),
        )
    ]

    # 4. watcher cycle mid-timeline: status snapshots as the phase
    #    executors publish them; phase 1 is 15 min silent at 12:20
    status_dir = beta.dir_for("status")
    base = {
        "project": "beta",
        "plan_id": PLAN_ID,
        "thread_id": "th-1",
        "last_file": "b.py",
        "started_at": "2026-03-01T12:01:00",
        "completed_at": None,
    }
    atomic_write_json(
        status_dir,
        f"{PLAN_ID}-1.json",
        {**base, "task_id": f"phase-1-{PLAN_ID}", "phase": 1, "status": "running",
         "tool_count": 5, "last_tool": "Edit", "updated_at": "2026-03-01T12:05:00"},
    )
    atomic_write_json(
        status_dir,
        f"{PLAN_ID}-2.json",
        {**base, "task_id": f"phase-2-{PLAN_ID}", "phase": 2, "status": "completed",
         "tool_count": 6, "last_tool": "Bash", "completed_at": "2026-03-01T12:08:00",
         "updated_at": "2026-03-01T12:08:00"},
    )
    pulse = monitor_once(spark, root, datetime(2026, 3, 1, 12, 20, 0))

    # 5. completion: active → completed move + board update, then the
    #    watcher sees nothing active and exits
    beta.move_plan(PLAN_ID, "active", "completed")
    _update_board(root, "beta", PLAN_ID, "completed", datetime(2026, 3, 1, 12, 50, 0))
    exits = watcher_should_exit(spark, root)

    board = json.load(open(os.path.join(root, "board.json")))
    log_actions = [
        json.loads(line.split(" - ", 1)[1])["action"]
        for line in open(os.path.join(root, "daemon.log"))
    ]
    return {
        "dispatch": {k: d1[k] for k in ("action", "project", "plan_id", "n_queued", "n_active")},
        "gate_second_cycle": {k: d2[k] for k in ("action", "n_queued", "n_active")},
        "transitions": transitions,
        "pulse": pulse,
        "board": board,
        "daemon_log_actions": log_actions,
        "watcher_exits_after_completion": exits,
        "files": {
            "queued_remains": sorted(
                os.listdir(os.path.join(root, "alpha", "queued", "background"))
            ),
            "beta_completed": sorted(os.listdir(os.path.join(root, "beta", "completed"))),
            "beta_active": sorted(os.listdir(os.path.join(root, "beta", "active"))),
        },
    }


def test_golden_daemon_replay(spark, tmp_path):
    replay = _replay(spark, tmp_path)
    actual = json.dumps(replay, sort_keys=True, indent=1, default=str) + "\n"
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(actual)
    with open(GOLDEN) as f:
        expected = f.read()
    assert actual == expected, (
        "daemon replay diverged from the golden artifact; if the change is "
        "intentional, regenerate with REGEN_GOLDEN=1 and review the diff"
    )


def test_golden_timeline_semantics():
    """Pin the INTENT of the golden transitions independently of the
    byte comparison, so a wrong regeneration cannot silently bless a
    semantic regression."""
    with open(GOLDEN) as f:
        g = json.load(f)
    kinds = [(t["phase"], t["kind"]) for t in g["transitions"]]
    # phase 1: exactly-10-min silence is NOT a stall; two stalls; kill;
    # post-kill suppression; one claim rejection
    assert kinds.count((1, "stalled")) == 2
    assert kinds.count((1, "killed")) == 1
    assert kinds.count((1, "claim_rejected")) == 1
    assert kinds.count((1, "suppressed_regression")) == 1
    # phase 2: clean completion, then the late echo suppressed
    p2 = [k for ph, k in kinds if ph == 2]
    assert p2 == ["transition", "transition", "suppressed_regression"]
    # the kill is attributed to the event that breached the cap
    kill = next(t for t in g["transitions"] if t["kind"] == "killed")
    assert kill["at"] == "2026-03-01T12:44:03"
    # watcher saw the stall as an incident at 12:20 (15 min silent)
    assert g["pulse"]["incidents"][0]["stalled_for_minutes"] == 15
    assert g["board"]["entries"][0]["status"] == "completed"
    assert g["watcher_exits_after_completion"] is True
