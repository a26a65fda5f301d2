"""Golden end-to-end replay of the reference's INTERACTIVE consumer
story (VERDICT r6 task #5) — the `/pulsar` path, byte-pinned to
`tests/golden/pulsar_replay.json` the same way the daemon story is
pinned by `tests/test_golden_replay.py`.

The timeline replays `commands/pulsar.md:91-102` (queue resolution),
`104-157` (re-derived rounds + complexity→model routing), `540-607`
(per-round quality gates), and `612-616` (finalize):

  three queued plans (2 interactive + 1 background) → no-id
  resolution asks the user between the two interactive candidates →
  explicit-id resolution finds plans in either queue → empty project
  says "run /nova first" → the chosen plan activates → the 5-phase
  schedule re-derives rounds from ACTUAL file conflicts (the plan's
  own groups are advisory) with per-phase model routing (High*/Medium
  → opus, Low → sonnet, MISSING → sonnet backward-compat) → each
  round gets a parallel test-agent + dead-code-agent gate pair with
  `qg-{kind}-round-{N}` task ids → gate status files are polled back
  exactly as the reference's jq projection does → active → completed
  move + board upsert.

Every clock is injected and every input synthetic, so the replay is a
pure function of this file; regenerate deliberately with
REGEN_GOLDEN=1 and review the diff like code.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from nova_pulsar_spark.plans.pulsar import (
    execution_schedule,
    finalize_plan,
    quality_gate_tasks,
    resolve_plan,
)
from nova_pulsar_spark.streaming.topics import QueueNamespace, atomic_write_json

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pulsar_replay.json")

NOW = datetime(2026, 3, 2, 9, 0, 0)
I1, I2 = "plan-20260301-0900", "plan-20260301-1030"
B1 = "plan-20260227-1500"

# The pulsar.md:148-157 worked example, complexity-annotated: ph3
# shares models/user.py with ph1 (the "needs User model" logical dep
# realized as a file conflict); ph4/ph5 are independent. ph5 has NO
# complexity field — the backward-compat default.
PHASES = [
    (I1, 1, "Create User model", ["models/user.py"], "High (Architectural)"),
    (I1, 2, "Create Auth service", ["services/auth.py"], "High (Implementation)"),
    (I1, 3, "Create API endpoints", ["api/endpoints.py", "models/user.py"], "Medium"),
    (I1, 4, "Add tests", ["tests/test_api.py"], "Low"),
    (I1, 5, "Update docs", ["README.md"], None),
]


def _plan(pid, created, phases):
    return {
        "id": pid,
        "title": pid,
        "project": "webapp",
        "type": "feature",
        "execution_mode": "interactive",
        "created_at": created,
        "n_phases": len(phases),
        "phases": [
            {"phase": p, "title": t, "files": files, "complexity": cx}
            for _pid, p, t, files, cx in phases
        ],
    }


def _replay(spark, tmp_path) -> dict:
    root = str(tmp_path / "pulsar_comms")
    ns = QueueNamespace(root=root, project="webapp")
    ns.setup()
    QueueNamespace(root=root, project="emptyproj").setup()
    ns.enqueue_plan(_plan(I1, "2026-03-01T09:00:00", PHASES), interactive=True)
    ns.enqueue_plan(_plan(I2, "2026-03-01T10:30:00", []), interactive=True)
    ns.enqueue_plan(_plan(B1, "2026-02-27T15:00:00", []))

    # 1. Step-1 queue resolution, all four outcomes
    resolution = {
        "no_id_two_interactive": resolve_plan(spark, root, "webapp"),
        "explicit_interactive": resolve_plan(spark, root, "webapp", I1),
        "explicit_background": resolve_plan(spark, root, "webapp", B1),
        "explicit_unknown": resolve_plan(spark, root, "webapp", "plan-nope"),
        "empty_project": resolve_plan(spark, root, "emptyproj"),
    }

    # 2. the user picks I1 → activation
    ns.move_plan(I1, "queued_interactive", "active")
    from nova_pulsar_spark.plans.daemon import _update_board

    _update_board(root, "webapp", I1, "active", NOW)

    # 3. Step-2 schedule: re-derived rounds + model routing
    phases = spark.createDataFrame(
        PHASES,
        "plan_id string, phase int, title string, files array<string>, complexity string",
    )
    schedule = [
        dict(r.asDict())
        for r in execution_schedule(phases)
        .orderBy("round", "phase")
        .collect()
    ]

    # 4. Step-6 per-round quality gates
    gates = [dict(r.asDict()) for r in quality_gate_tasks(execution_schedule(phases)).collect()]

    # 5. the gates publish status; poll them back with the reference's
    #    jq projection (pulsar.md:581-594)
    status_dir = ns.dir_for("status")
    for g in gates:
        atomic_write_json(
            status_dir,
            f"{g['task_id']}.json",
            {
                "task_id": g["task_id"],
                "project": "webapp",
                "plan_id": I1,
                "status": "completed",
                "tool_count": 4 + g["round"],
                "last_tool": "Bash",
                "updated_at": f"2026-03-02T09:{10 + 5 * g['round']:02d}:00",
            },
        )
    polled = [
        {"task": r["task_id"], "status": r["status"], "tools": r["tool_count"], "last": r["last_tool"]}
        for r in spark.read.json(status_dir)
        .select("task_id", "status", "tool_count", "last_tool")
        .orderBy("task_id")
        .collect()
    ]

    # 6. Step-7 finalize
    final = finalize_plan(root, "webapp", I1, NOW)
    board = json.load(open(os.path.join(root, "board.json")))

    return {
        "resolution": resolution,
        "schedule": schedule,
        "quality_gates": gates,
        "gate_status_poll": polled,
        "finalize": final,
        "board": board,
        "files": {
            "interactive_remains": sorted(
                os.listdir(os.path.join(root, "webapp", "queued", "interactive"))
            ),
            "background_remains": sorted(
                os.listdir(os.path.join(root, "webapp", "queued", "background"))
            ),
            "completed": sorted(os.listdir(os.path.join(root, "webapp", "completed"))),
            "active": sorted(os.listdir(os.path.join(root, "webapp", "active"))),
        },
    }


def test_golden_pulsar_replay(spark, tmp_path):
    replay = _replay(spark, tmp_path)
    actual = json.dumps(replay, sort_keys=True, indent=1, default=str) + "\n"
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(actual)
    with open(GOLDEN) as f:
        expected = f.read()
    assert actual == expected, (
        "pulsar replay diverged from the golden artifact; if the change is "
        "intentional, regenerate with REGEN_GOLDEN=1 and review the diff"
    )


def test_golden_pulsar_semantics():
    """Pin the INTENT independently of the byte comparison, so a wrong
    regeneration cannot silently bless a semantic regression."""
    with open(GOLDEN) as f:
        g = json.load(f)
    r = g["resolution"]
    # interactive queue is consulted first; two candidates ask the user
    assert r["no_id_two_interactive"]["action"] == "ask_user"
    assert r["no_id_two_interactive"]["candidates"] == [I1, I2]
    # explicit ids resolve in EITHER queue; empty project → /nova
    assert r["explicit_interactive"]["queue"] == "interactive"
    assert r["explicit_background"]["queue"] == "background"
    assert r["explicit_unknown"]["action"] == "not_found"
    assert r["empty_project"]["action"] == "run_nova_first"
    # rounds re-derived from file conflicts: only ph3 (shares
    # models/user.py with ph1) is barriered into round 2
    rounds = {s["phase"]: s["round"] for s in g["schedule"]}
    assert rounds == {1: 1, 2: 1, 4: 1, 5: 1, 3: 2}
    # model routing incl. the missing-complexity backward-compat default
    models = {s["phase"]: s["model"] for s in g["schedule"]}
    assert models == {1: "opus", 2: "opus", 3: "opus", 4: "sonnet", 5: "sonnet"}
    # every round gets BOTH gates, all sonnet, all background
    gates = {(q["round"], q["agent"]): q for q in g["quality_gates"]}
    assert set(gates) == {
        (1, "test-agent"),
        (1, "dead-code-agent"),
        (2, "test-agent"),
        (2, "dead-code-agent"),
    }
    assert all(q["model"] == "sonnet" and q["run_in_background"] for q in g["quality_gates"])
    assert gates[(2, "test-agent")]["task_id"] == "qg-test-round-2"
    # finalize lands on the board and in the completed dir
    assert g["board"]["entries"][0]["status"] == "completed"
    assert g["files"]["completed"] == [f"{I1}.json"]
    assert g["files"]["interactive_remains"] == [f"{I2}.json"]
