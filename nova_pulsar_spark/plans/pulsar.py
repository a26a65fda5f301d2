"""Interactive consumer (/pulsar) composition — the other half of the
reference's §3 story, as batch jobs over real queue directories.

`resolve_plan` ≡ Step 1 plan loading (`commands/pulsar.md:91-102`):
with a plan-id, search BOTH queued/background and queued/interactive
of the current project; without one, the interactive queue is
consulted first — one candidate loads, several ask the user, none
says "run /nova first". `execution_schedule` ≡ Step 2
(`commands/pulsar.md:104-157`): re-derive the rounds from actual file
conflicts (never trust the plan's own parallel groups) and route each
phase's model from its Complexity field (High*/Medium → opus, Low →
sonnet, missing → sonnet for backward compat).
`quality_gate_tasks` ≡ Step 6 (`commands/pulsar.md:540-607`): after
EVERY round, a test agent and a dead-code agent launch in parallel
(both sonnet, background), with status published under
`qg-{kind}-round-{N}` task ids. `finalize_plan` ≡ Step 7
(`commands/pulsar.md:612-616`): active → completed move + board
update.

Like daemon.py, every function takes an injected clock/paths so the
golden replay (`tests/test_golden_pulsar.py`) is a pure function of
its fixture; the schedule/gate derivations are plain DataFrame
transforms reusable over any conforming plans/phases tables.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.plans import scheduler as S
from nova_pulsar_spark.plans.daemon import PLAN_SCHEMA, _update_board


def _read_queue(spark: SparkSession, root: str, project: str, state: str):
    """One project's queue dir as a DataFrame (None when empty).

    Only the missing-directory case maps to None (= empty queue, the
    reference's "run /nova first" path). Corrupt files, schema
    mismatches, and permission errors PROPAGATE — an unreadable queue
    must not masquerade as an empty one.
    """
    path = os.path.join(root, project, state)
    if not os.path.isdir(path):
        return None
    # FAILFAST, not the default PERMISSIVE: a corrupt or truncated plan
    # file must raise at read time, not arrive as an all-null row that
    # resolve_plan would happily "load" as plan None. The missing-dir
    # check above is the ONLY empty-queue path.
    df = (
        spark.read.schema(PLAN_SCHEMA)
        .option("pathGlobFilter", "*.json")
        .option("mode", "FAILFAST")
        .json(path)
    )
    if not df.take(1):
        return None
    return df


def resolve_plan(
    spark: SparkSession, root: str, project: str, plan_id: str | None = None
) -> dict:
    """Step-1 queue resolution (`commands/pulsar.md:91-102`).

    Returns a decision record:
    - ``{"action": "load", "plan_id", "queue"}`` — one plan to run,
      with the queue kind it was found in;
    - ``{"action": "ask_user", "candidates": [...]}`` — several
      interactive plans queued and no id given;
    - ``{"action": "run_nova_first"}`` — nothing queued interactively;
    - ``{"action": "not_found", "plan_id"}`` — an explicit id that is
      in neither queue.
    """
    if plan_id is not None:
        # explicit id: background first, then interactive (both are
        # legal homes for a named plan)
        for queue, state in (
            ("background", "queued/background"),
            ("interactive", "queued/interactive"),
        ):
            df = _read_queue(spark, root, project, state)
            if df is not None and df.filter(F.col("id") == plan_id).take(1):
                return {"action": "load", "plan_id": plan_id, "queue": queue}
        return {"action": "not_found", "plan_id": plan_id}
    df = _read_queue(spark, root, project, "queued/interactive")
    if df is None:
        return {"action": "run_nova_first"}
    ids = [r["id"] for r in df.select("id").orderBy("id").collect()]
    if len(ids) == 1:
        return {"action": "load", "plan_id": ids[0], "queue": "interactive"}
    return {"action": "ask_user", "candidates": ids}


def execution_schedule(phases: DataFrame) -> DataFrame:
    """Step-2 schedule (`commands/pulsar.md:104-157`): per phase, the
    re-derived round (longest file-conflict chain depth — the plan's
    own parallel groups are advisory) and the routed model.

    Input: (plan_id, phase, title, files, complexity); output adds
    (round, model). Round derivation is `scheduler.phase_rounds` (the
    registered Q4 `sched_rounds` semantics); routing is
    `scheduler.route_model` (P10). One distributed join — the phase
    table is plan metadata, tiny relative to the data the plan
    processes, but nothing here breaks if the queue itself is huge.
    """
    rounds = S.phase_rounds(phases)
    return (
        phases.join(rounds, ["plan_id", "phase"])
        .select(
            "plan_id",
            "phase",
            "title",
            "round",
            "complexity",
            S.route_model(F.col("complexity")).alias("model"),
        )
    )


def quality_gate_tasks(schedule: DataFrame) -> DataFrame:
    """Step-6 gates (`commands/pulsar.md:540-607`): after EVERY round
    — not just at the end — a test agent and a dead-code agent run in
    parallel, both sonnet, both background. One row per (plan, round,
    agent) with the reference's `qg-{kind}-round-{N}` status task id.
    """
    rounds = schedule.select("plan_id", "round").distinct()
    agents = F.array(
        F.struct(F.lit("test-agent").alias("agent"), F.lit("qg-test").alias("prefix")),
        F.struct(F.lit("dead-code-agent").alias("agent"), F.lit("qg-deadcode").alias("prefix")),
    )
    return (
        rounds.select("plan_id", "round", F.explode(agents).alias("g"))
        .select(
            "plan_id",
            "round",
            F.col("g.agent").alias("agent"),
            F.concat(F.col("g.prefix"), F.lit("-round-"), F.col("round")).alias("task_id"),
            F.lit("sonnet").alias("model"),
            F.lit(True).alias("run_in_background"),
        )
        .orderBy("plan_id", "round", "agent")
    )


def pulsar_auto(
    root: str,
    project: str,
    plan_id: str,
    now: datetime,
    pid: int,
    home: str = "/home/user",
) -> dict:
    """The daemon→consumer HANDOFF (`scripts/pulsar-auto.sh:16-85`) —
    the seam between the two golden stories: the daemon's Orbiter
    selection triggers this script, which locates the plan file
    (still in queued/background — activation belongs to the consumer
    it spawns), extracts the project path from the plan's own
    metadata, records the log + PID file, and composes the consumer
    invocation ("Execute plan X using /pulsar X ...",
    `pulsar-auto.sh:78-81`).

    Faithful error surface (each an `exit 1` in the script): missing
    project namespace (:33-36); plan queued INTERACTIVE — the
    background executor refuses it (:42-44); plan in neither queue
    (:45-47). Project-path fallback to ``home`` with a warning when
    the plan carries none or a dangling one (:60-63).

    Pure driver-side file protocol (like the script). Returns the
    invocation record; the spawned consumer then runs `resolve_plan`
    on the SAME file and does the activation move."""
    ns_dir = os.path.join(root, project)
    if not os.path.isdir(ns_dir):
        raise ValueError(f"project namespace '{project}' not found at {ns_dir}")
    plan_file = os.path.join(ns_dir, "queued/background", f"{plan_id}.json")
    if not os.path.isfile(plan_file):
        if os.path.isfile(os.path.join(ns_dir, "queued/interactive", f"{plan_id}.json")):
            raise ValueError(f"plan {plan_id} is in interactive queue, not background")
        raise ValueError(f"plan {plan_id} not found in queued/background")
    with open(plan_file) as f:
        plan = json.load(f)
    project_path = plan.get("project_path")
    path_fallback = not (project_path and os.path.isdir(project_path))
    if path_fallback:
        project_path = home
    logs_dir = os.path.join(ns_dir, "logs")
    os.makedirs(logs_dir, exist_ok=True)
    prompt = (
        f"Execute plan {plan_id} using /pulsar {plan_id}. The plan is "
        f"located at {plan_file}. Execute all phases, run tests, and "
        f"mark as completed when done."
    )
    record = {
        "action": "handoff",
        "at": now.isoformat(),
        "project": project,
        "plan_id": plan_id,
        "plan_file": plan_file,
        "project_path": project_path,
        "path_fallback": path_fallback,
        "prompt": prompt,
        "pid": pid,
    }
    with open(os.path.join(logs_dir, f"{plan_id}.log"), "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")
    with open(os.path.join(logs_dir, f"{plan_id}.pid"), "w") as f:
        f.write(f"{pid}\n")
    return record


def finalize_plan(root: str, project: str, plan_id: str, now: datetime) -> dict:
    """Step-7 finalization (`commands/pulsar.md:612-616`): atomic
    active → completed move plus the board upsert, mirroring the
    daemon's completion protocol.

    Also removes the handoff's `logs/{plan_id}.pid` file (ADVICE r8,
    documented choice between the two offered fixes): the daemon's
    in-flight gate only consults pid files of still-QUEUED plans, so
    after finalization a lingering file is pure garbage — left in
    place, files accumulate forever and a recycled OS pid could make
    a long-finished plan look alive to any `ps -p`-style audit. The
    alternative (gate on ANY live pid regardless of queue state) was
    rejected because it re-opens the recycled-pid false-positive the
    reference itself suffers: with cleanup, a pid file existing at all
    means a consumer was spawned and has not finalized. The log file
    stays — it is the audit trail."""
    src = os.path.join(root, project, "active", f"{plan_id}.json")
    dst_dir = os.path.join(root, project, "completed")
    os.makedirs(dst_dir, exist_ok=True)
    os.replace(src, os.path.join(dst_dir, f"{plan_id}.json"))
    pid_file = os.path.join(root, project, "logs", f"{plan_id}.pid")
    if os.path.exists(pid_file):
        os.remove(pid_file)
    _update_board(root, project, plan_id, "completed", now)
    return {"action": "finalize", "plan_id": plan_id, "status": "completed"}
