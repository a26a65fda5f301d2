"""Golden end-to-end replay of the daemon→pulsar HANDOFF seam
(VERDICT r7 task #5) — the one reference path the two existing golden
replays stop short of: `starry-daemon.sh:203` calling
`pulsar-auto.sh:16-85`, which locates the STILL-QUEUED plan file,
extracts the project path from the plan's own metadata, records the
log + PID file, and spawns the interactive consumer — whose `/pulsar
<plan-id>` then resolves the SAME file, activates it, and runs the
schedule/gates/finalize story.

One synthetic timeline drives ONE plan through both halves:

  Orbiter selects gamma's oldest bug plan → handoff (plan file NOT
  moved; prompt composed; pid + log written) → a second cycle before
  activation WAITS on the pid-file in-flight gate (no duplicate
  consumer) → the same cycle with the pid probed dead RE-dispatches
  (crashed-consumer recovery, `starry-daemon.sh:77-85`) →
  pulsar-auto's three error exits pinned (interactive-queue refusal,
  unknown plan, missing namespace) → project-path fallback pinned on
  a second plan → consumer resolve (finds it in queued/background) →
  activation move + board → re-derived rounds + model routing on the
  dispatched plan's phases → per-round quality-gate pairs → gate
  status poll → stall-kill + retry INSIDE the handoff world (a phase
  goes silent past the threshold, monitor_once raises the
  stalled_kill incident, a fresh status heartbeat clears it — Q5/Q7
  exercised on this seam, VERDICT r8 #6) → finalize (which also
  removes the handoff pid file, ADVICE r8) → completed.

Every clock and pid is injected and tmp paths are normalized to
placeholders, so the replay is a pure function of this file; the
daemon cycles inject presence-equals-alive `pid_alive` because 4242
is a synthetic pid (the production default is the real
`pid_alive_probe`, pinned separately in test_daemon.py); regenerate
deliberately with REGEN_GOLDEN=1 and review the diff like code (same
discipline as the daemon and pulsar goldens).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest

from nova_pulsar_spark.plans.daemon import _update_board, dispatch_once
from nova_pulsar_spark.plans.pulsar import (
    execution_schedule,
    finalize_plan,
    pulsar_auto,
    quality_gate_tasks,
    resolve_plan,
)
from nova_pulsar_spark.streaming.topics import QueueNamespace, atomic_write_json

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "handoff_replay.json")

T0 = datetime(2026, 3, 3, 8, 0, 0)
T1 = datetime(2026, 3, 3, 8, 1, 0)
T2 = datetime(2026, 3, 3, 9, 30, 0)
H1, H2, D1 = "plan-20260225-0800", "plan-20260226-1400", "plan-20260301-1200"

# H1: the dispatched plan — ph2 shares core.py with ph1 (round 2);
# ph3 independent with the missing-complexity default routing.
H1_PHASES = [
    (1, "Fix race in core", ["core.py"], "High (Architectural)"),
    (2, "Harden call sites", ["core.py", "util.py"], "Medium"),
    (3, "Changelog", ["docs.md"], None),
]


def _plan(pid, ptype, created, phases, project_path=None):
    plan = {
        "id": pid,
        "title": pid,
        "project": "gamma",
        "type": ptype,
        "execution_mode": "background",
        "created_at": created,
        "n_phases": len(phases),
        "phases": [
            {"phase": p, "title": t, "files": files, "complexity": cx}
            for p, t, files, cx in phases
        ],
    }
    if project_path is not None:
        plan["project_path"] = project_path
    return plan


def _norm(obj, repl):
    """Replace run-specific path prefixes with stable placeholders so
    the golden artifact is byte-reproducible."""
    if isinstance(obj, str):
        for real, ph in repl.items():
            obj = obj.replace(real, ph)
        return obj
    if isinstance(obj, dict):
        return {k: _norm(v, repl) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_norm(v, repl) for v in obj]
    return obj


def _replay(spark, tmp_path) -> dict:
    root = str(tmp_path / "handoff_comms")
    repo = str(tmp_path / "repo")
    os.makedirs(repo)
    gamma = QueueNamespace(root=root, project="gamma")
    delta = QueueNamespace(root=root, project="delta")
    gamma.setup()
    delta.setup()
    gamma.enqueue_plan(_plan(H1, "bug", "2026-02-25T08:00:00", H1_PHASES, project_path=repo))
    gamma.enqueue_plan(_plan(H2, "feature", "2026-02-26T14:00:00", [(1, "ph1", ["x.py"], "Low")]))
    delta.enqueue_plan(
        {**_plan(D1, "feature", "2026-03-01T12:00:00", []), "project": "delta"},
        interactive=True,
    )

    # 1. pulsar-auto's error exits (pulsar-auto.sh:33-47)
    errors = {}
    with pytest.raises(ValueError) as e:
        pulsar_auto(root, "nope", H1, now=T0, pid=1)
    errors["missing_namespace"] = str(e.value)
    with pytest.raises(ValueError) as e:
        pulsar_auto(root, "gamma", "plan-unknown", now=T0, pid=1)
    errors["not_found"] = str(e.value)
    with pytest.raises(ValueError) as e:
        pulsar_auto(root, "delta", D1, now=T0, pid=1)
    errors["interactive_refused"] = str(e.value)

    # 2. daemon cycle in the REFERENCE order: Orbiter top-1 → handoff;
    #    the plan file stays in queued/background
    plan_file = os.path.join(root, "gamma", "queued/background", f"{H1}.json")
    bytes_at_enqueue = open(plan_file, "rb").read()
    d1 = dispatch_once(
        spark,
        root,
        T0,
        handoff=lambda r, p, pl: pulsar_auto(r, p, pl, now=T0, pid=4242, home="<home>"),
        pid_alive=lambda pid: True,
    )
    after_dispatch = {
        "queued_background": sorted(
            os.listdir(os.path.join(root, "gamma", "queued", "background"))
        ),
        "active": sorted(os.listdir(os.path.join(root, "gamma", "active"))),
        "plan_file_unchanged": open(plan_file, "rb").read() == bytes_at_enqueue,
    }

    # 2b. a second cycle fires BEFORE the consumer activates: the pid
    #     file written by the handoff marks H1 in flight — sequential
    #     mode waits instead of respawning a duplicate consumer
    d2 = dispatch_once(
        spark,
        root,
        T0,
        handoff=lambda r, p, pl: pulsar_auto(r, p, pl, now=T0, pid=4242, home="<home>"),
        pid_alive=lambda pid: True,
    )

    # 2c. crashed-consumer recovery (starry-daemon.sh:77-85 `ps -p`):
    #     the same cycle with the pid probed DEAD re-dispatches —
    #     a fresh handoff, new pid, second log record
    d3 = dispatch_once(
        spark,
        root,
        T0,
        handoff=lambda r, p, pl: pulsar_auto(r, p, pl, now=T0, pid=4244, home="<home>"),
        pid_alive=lambda pid: False,
    )

    # 3. project-path fallback (pulsar-auto.sh:60-63) on the plan that
    #    carries none — still queued, legal to probe
    fallback = pulsar_auto(root, "gamma", H2, now=T0, pid=4243, home="<home>")

    # 4. the spawned consumer: /pulsar H1 resolves the SAME file ...
    resolution = resolve_plan(spark, root, "gamma", H1)
    # ... and activates it (pulsar.md:159-165)
    gamma.move_plan(H1, "queued_background", "active")
    _update_board(root, "gamma", H1, "active", T1)

    # 5. schedule + gates on the DISPATCHED plan file, read back from
    #    the active dir (not the fixture) — the seam's whole point
    from pyspark.sql import functions as F

    from nova_pulsar_spark.plans.daemon import PLAN_SCHEMA

    active = spark.read.schema(PLAN_SCHEMA).json(os.path.join(root, "gamma", "active"))
    phases = active.select(
        F.col("id").alias("plan_id"), F.explode("phases").alias("ph")
    ).select(
        "plan_id",
        F.col("ph.phase").alias("phase"),
        F.col("ph.title").alias("title"),
        F.col("ph.files").alias("files"),
        F.col("ph.complexity").alias("complexity"),
    )
    schedule = [
        dict(r.asDict())
        for r in execution_schedule(phases).orderBy("round", "phase").collect()
    ]
    gates = [dict(r.asDict()) for r in quality_gate_tasks(execution_schedule(phases)).collect()]

    # 6. gates publish status; poll with the reference's jq projection
    status_dir = gamma.dir_for("status")
    for g in gates:
        atomic_write_json(
            status_dir,
            f"{g['task_id']}.json",
            {
                "task_id": g["task_id"],
                "project": "gamma",
                "plan_id": H1,
                "status": "completed",
                "tool_count": 3 + g["round"],
                "last_tool": "Bash",
                "updated_at": f"2026-03-03T08:{30 + 10 * g['round']:02d}:00",
            },
        )
    polled = [
        {"task": r["task_id"], "status": r["status"], "tools": r["tool_count"]}
        for r in spark.read.json(status_dir)
        .select("task_id", "status", "tool_count")
        .orderBy("task_id")
        .collect()
    ]

    # 6b. stall-kill + retry on the HANDED-OFF plan (Q5/Q7 on this
    #     seam): phase 2's executor goes silent at 08:50; the watcher
    #     cycle at T2 (09:30, 40 min of silence > the 10-min threshold)
    #     raises the stalled_kill incident — then the retried executor
    #     heartbeats at 09:29 and the next cycle clears it.
    from nova_pulsar_spark.plans.daemon import monitor_once

    def _phase2_status(updated_at: str, tool_count: int) -> None:
        atomic_write_json(
            status_dir,
            f"{H1}-ph-2.json",
            {
                "task_id": f"{H1}-ph-2",
                "project": "gamma",
                "plan_id": H1,
                "phase": 2,
                "status": "running",
                "tool_count": tool_count,
                "last_tool": "Edit",
                "updated_at": updated_at,
            },
        )

    _phase2_status("2026-03-03T08:50:00", 11)
    stalled_pulse = monitor_once(spark, root, T2)
    _phase2_status("2026-03-03T09:29:00", 12)  # the retried executor
    recovered_pulse = monitor_once(spark, root, T2)
    stall_kill = {
        "incidents": stalled_pulse["incidents"],
        "incidents_after_retry": recovered_pulse["incidents"],
        "phase2_after_retry": [
            p
            for g in recovered_pulse["rounds"]
            if g["plan_id"] == H1
            for p in g["phases"]
            if p.get("phase") == 2  # qg statuses carry no phase (null-dropped)
        ],
    }

    # 7. finalize — reads the pid file FIRST: finalize_plan removes it
    #    (ADVICE r8; the gate never needs a finalized plan's pid)
    pid_file = open(os.path.join(root, "gamma", "logs", f"{H1}.pid")).read()
    final = finalize_plan(root, "gamma", H1, T2)
    pid_file_removed = not os.path.exists(
        os.path.join(root, "gamma", "logs", f"{H1}.pid")
    )
    board = json.load(open(os.path.join(root, "board.json")))
    log_actions = [
        json.loads(line.split(" - ", 1)[1])["action"]
        for line in open(os.path.join(root, "daemon.log"))
    ]
    handoff_log = [
        json.loads(line)
        for line in open(os.path.join(root, "gamma", "logs", f"{H1}.log"))
    ]

    out = {
        "errors": errors,
        "dispatch": d1,
        "gate_in_flight": d2,
        "redispatch_stale_pid": {k: d3[k] for k in ("action", "plan_id")},
        "after_dispatch": after_dispatch,
        "fallback": {k: fallback[k] for k in ("plan_id", "project_path", "path_fallback")},
        "resolution": resolution,
        "schedule": schedule,
        "quality_gates": gates,
        "gate_status_poll": polled,
        "stall_kill": stall_kill,
        "finalize": final,
        "pid_file_removed": pid_file_removed,
        "board": board,
        "daemon_log_actions": log_actions,
        "handoff_log": handoff_log,
        "pid_file": pid_file,
        "files": {
            "queued_remains": sorted(
                os.listdir(os.path.join(root, "gamma", "queued", "background"))
            ),
            "completed": sorted(os.listdir(os.path.join(root, "gamma", "completed"))),
            "active": sorted(os.listdir(os.path.join(root, "gamma", "active"))),
            "logs": sorted(os.listdir(os.path.join(root, "gamma", "logs"))),
        },
    }
    return _norm(out, {root: "<root>", repo: "<repo>"})


def test_golden_handoff_replay(spark, tmp_path):
    replay = _replay(spark, tmp_path)
    actual = json.dumps(replay, sort_keys=True, indent=1, default=str) + "\n"
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(actual)
    with open(GOLDEN) as f:
        expected = f.read()
    assert actual == expected, (
        "handoff replay diverged from the golden artifact; if the change is "
        "intentional, regenerate with REGEN_GOLDEN=1 and review the diff"
    )


def test_golden_handoff_semantics():
    """Pin the INTENT independently of the byte comparison."""
    with open(GOLDEN) as f:
        g = json.load(f)
    # the daemon triggered the consumer but did NOT move the file
    assert g["dispatch"]["action"] == "dispatch"
    assert g["dispatch"]["handoff"]["prompt"].count(f"/pulsar {H1}") == 1
    assert g["dispatch"]["handoff"]["plan_file"].endswith(f"queued/background/{H1}.json")
    assert f"{H1}.json" in g["after_dispatch"]["queued_background"]
    assert g["after_dispatch"]["active"] == []
    assert g["after_dispatch"]["plan_file_unchanged"] is True
    # project path came from the plan's own metadata; H2 fell back
    assert g["dispatch"]["handoff"]["project_path"] == "<repo>"
    assert g["dispatch"]["handoff"]["path_fallback"] is False
    assert g["fallback"] == {"plan_id": H2, "project_path": "<home>", "path_fallback": True}
    # the three pulsar-auto error exits
    assert "interactive queue, not background" in g["errors"]["interactive_refused"]
    assert "not found in queued/background" in g["errors"]["not_found"]
    assert "namespace" in g["errors"]["missing_namespace"]
    # the consumer resolved the SAME plan in the background queue
    assert g["resolution"] == {"action": "load", "plan_id": H1, "queue": "background"}
    # schedule re-derived from the dispatched file: ph2 conflicts on
    # core.py → round 2; missing complexity → sonnet
    rounds = {s["phase"]: s["round"] for s in g["schedule"]}
    assert rounds == {1: 1, 3: 1, 2: 2}
    models = {s["phase"]: s["model"] for s in g["schedule"]}
    assert models == {1: "opus", 2: "opus", 3: "sonnet"}
    # the in-flight gate: second cycle waits on the pid file instead of
    # respawning; a DEAD pid re-dispatches (crashed-consumer recovery)
    assert g["gate_in_flight"]["action"] == "wait_in_flight"
    assert g["gate_in_flight"]["in_flight"] == [H1]
    assert g["redispatch_stale_pid"] == {"action": "dispatch", "plan_id": H1}
    # both gate kinds per round; pid file carries the RESPAWNED pid
    assert len(g["quality_gates"]) == 4
    assert g["pid_file"] == "4244\n"
    assert [r["pid"] for r in g["handoff_log"]] == [4242, 4244]
    # stall-kill + retry on the handed-off plan: 40 silent minutes
    # raise the incident; the fresh heartbeat clears it (Q5/Q7)
    assert len(g["stall_kill"]["incidents"]) == 1
    inc = g["stall_kill"]["incidents"][0]
    assert inc["type"] == "stalled_kill"
    assert inc["plan_id"] == H1 and inc["phase"] == 2
    assert inc["stalled_for_minutes"] == 40
    assert g["stall_kill"]["incidents_after_retry"] == []
    assert g["stall_kill"]["phase2_after_retry"][0]["stalled"] is False
    assert g["stall_kill"]["phase2_after_retry"][0]["tool_count"] == 12
    # end state: completed + board, H2 still queued; finalize removed
    # H1's pid file (ADVICE r8) — H2 was handed off but never
    # finalized, so its pid file legitimately remains in flight
    assert g["pid_file_removed"] is True
    assert g["board"]["entries"][0]["status"] == "completed"
    assert g["files"]["completed"] == [f"{H1}.json"]
    assert g["files"]["queued_remains"] == [f"{H2}.json"]
    assert sorted(g["files"]["logs"]) == [
        f"{H1}.log", f"{H2}.log", f"{H2}.pid",
    ]
