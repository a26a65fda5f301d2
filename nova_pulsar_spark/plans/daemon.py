"""Dispatcher/monitor composition — the reference's daemon and watcher
as batch jobs over real queue directories (SURVEY.md §3.3).

`dispatch_once` ≡ one `check_and_execute` cycle
(`scripts/starry-daemon.sh:171-206`): count queued → at-most-one-
active gate → Orbiter selection (deterministic O1 pipeline — the
reference's own fallback algorithm) → activate (file move + board
upsert). `monitor_once` ≡ one watcher cycle
(`agents/orbiter.md:151-293`): aggregate statuses → pulse.json →
stall incidents.

Wall-clock decoupling: both take `now` so tests inject a clock
(SURVEY.md §7.3 point 3). Side effects (file moves, board/pulse
writes) use the atomic tmp+rename publish — idempotent redo-safe, the
batch rendition of the streaming `foreachBatch` sink contract.

In production the same functions run on the reference cadences via
Structured Streaming triggers (topics.DAEMON_TRIGGER/WATCHER_TRIGGER)
or an external scheduler; `--once` ≡ calling them directly.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nova_pulsar_spark.plans import scheduler as S
from nova_pulsar_spark.streaming.topics import atomic_write_json

PLAN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("project", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("execution_mode", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("n_phases", T.IntegerType()),
        T.StructField(
            "phases",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("phase", T.IntegerType()),
                        T.StructField("title", T.StringType()),
                        T.StructField("files", T.ArrayType(T.StringType())),
                        T.StructField("complexity", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _read_plans(spark: SparkSession, root: str, state_glob: str, status: str):
    """Read every project's `{state}` dir as one DataFrame with the
    plan's queue state derived from its path (S1/P8)."""
    path = os.path.join(root, "*", state_glob)
    try:
        df = spark.read.schema(PLAN_SCHEMA).option("pathGlobFilter", "*.json").json(path)
        if df.rdd.isEmpty():
            return None
        return df.withColumn("status", F.lit(status))
    except Exception:
        return None  # no files yet for this state


def scan_namespaces(spark: SparkSession, root: str):
    parts = [
        _read_plans(spark, root, "queued/background/*.json", "queued"),
        _read_plans(spark, root, "active/*.json", "active"),
        _read_plans(spark, root, "completed/*.json", "completed"),
    ]
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dispatch_once(spark: SparkSession, root: str, now: datetime | None = None) -> dict:
    """One daemon cycle. Returns a decision record (also appended to
    the root log, reference `log()` S9)."""
    now = now or datetime.utcnow()
    plans = scan_namespaces(spark, root)
    decision: dict = {"at": now.isoformat(), "action": "idle"}
    if plans is None:
        _log(root, decision)
        return decision
    plans = plans.cache()
    n_queued = plans.filter(F.col("status") == "queued").count()
    n_active = plans.filter(F.col("status") == "active").count()
    decision.update({"n_queued": n_queued, "n_active": n_active})
    if n_queued == 0:
        decision["action"] = "idle"  # starry-daemon.sh:178 "No queued plans"
    elif n_active > 0:
        decision["action"] = "wait"  # at-most-one-active gate (P2)
    else:
        # Orbiter pipeline on the scanned metadata (flatten phases)
        plan_meta = plans.select(
            "id", "title", "project", "type", "status", "execution_mode", "created_at", "n_phases"
        )
        phases = plans.select(F.col("id").alias("plan_id"), F.explode("phases").alias("ph")).select(
            "plan_id", F.col("ph.phase").alias("phase"), F.col("ph.files").alias("files")
        )
        best = S.best_plan(plan_meta, phases).collect()
        if not best:
            decision["action"] = "blocked"  # queued but all dependency-blocked
        else:
            chosen = best[0]
            project, plan_id = chosen.project, chosen.id
            # Q2 activation: atomic file move queued → active
            src = os.path.join(root, project, "queued/background", f"{plan_id}.json")
            dst_dir = os.path.join(root, project, "active")
            os.makedirs(dst_dir, exist_ok=True)
            os.replace(src, os.path.join(dst_dir, f"{plan_id}.json"))
            _update_board(root, project, plan_id, "active", now)
            decision.update({"action": "dispatch", "project": project, "plan_id": plan_id})
    plans.unpersist()
    _log(root, decision)
    return decision


def monitor_once(
    spark: SparkSession, root: str, now: datetime, stall_minutes: int = 10
) -> dict:
    """One watcher cycle: status scan → pulse.json + incidents."""
    from nova_pulsar_spark.streaming.topics import STATUS_SCHEMA

    status_glob = os.path.join(root, "*", "status", "*.json")
    try:
        se = spark.read.schema(STATUS_SCHEMA).json(status_glob)
        empty = se.rdd.isEmpty()
    except Exception:
        empty = True
    if empty:
        pulse = {"updated_at": now.isoformat(), "rounds": [], "incidents": []}
        atomic_write_json(root, "pulse.json", pulse)
        return pulse
    latest = S.latest_status(se)
    flagged = S.stalled(latest, F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S"))), stall_minutes)
    rows = flagged.select(
        "project", "plan_id", "phase", "status", "tool_count", "last_tool", "updated_at", "stalled"
    ).collect()
    rounds: dict[str, dict] = {}
    incidents = []
    for r in rows:
        g = rounds.setdefault(r.plan_id, {"plan_id": r.plan_id, "project": r.project, "phases": []})
        g["phases"].append(
            {
                "phase": r.phase,
                "status": r.status,
                "tool_count": r.tool_count,
                "last_tool": r.last_tool,
                "updated_at": r.updated_at.isoformat(),
                "stalled": bool(r.stalled),
            }
        )
        if r.stalled:
            stalled_min = int((now - r.updated_at).total_seconds() // 60)
            incidents.append(
                {
                    "type": "stalled_kill",
                    "project": r.project,
                    "plan_id": r.plan_id,
                    "phase": r.phase,
                    "killed_at": now.isoformat(),
                    "stalled_for_minutes": stalled_min,
                }
            )
    for g in rounds.values():
        g["phases"].sort(key=lambda p: p["phase"])
    pulse = {
        "updated_at": now.isoformat(),
        "rounds": sorted(rounds.values(), key=lambda g: g["plan_id"]),
        "incidents": incidents,
    }
    atomic_write_json(root, "pulse.json", pulse)
    return pulse


def watcher_should_exit(spark: SparkSession, root: str) -> bool:
    """Q8 watcher auto-exit (`agents/orbiter.md:282-293`): stop the
    monitor loop when no plan is active anywhere."""
    plans = scan_namespaces(spark, root)
    if plans is None:
        return True
    return plans.filter(F.col("status") == "active").limit(1).count() == 0


def _update_board(root: str, project: str, plan_id: str, status: str, now: datetime) -> None:
    """Board upsert (S6/J3): read-modify-write with atomic publish."""
    board_path = os.path.join(root, "board.json")
    entries = []
    if os.path.exists(board_path):
        entries = json.load(open(board_path)).get("entries", [])
    found = False
    for entry in entries:
        if entry.get("id") == plan_id:
            entry["status"] = status
            entry["updatedAt"] = now.isoformat()
            found = True
    if not found:
        entries.append({"id": plan_id, "project": project, "status": status, "updatedAt": now.isoformat()})
    atomic_write_json(root, "board.json", {"entries": entries})


def _log(root: str, record: dict) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "daemon.log"), "a") as f:
        f.write(f"{record['at']} - {json.dumps(record, default=str)}\n")
