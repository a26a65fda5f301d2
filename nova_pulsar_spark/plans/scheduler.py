"""Queue-domain engine primitives: dependency graph, priority scoring,
eligibility, best-plan selection, round partitioning.

These are the Spark renditions of the reference's Orbiter scheduler
(`agents/orbiter.md:37-89`: scan queue → dependency detection →
priority scoring → sort → top-1) and the Pulsar round planner
(`commands/pulsar.md:104-157`). They are engine API — reusable
DataFrame transforms over any conforming plans/phases/status tables
(fixture-fed in tests, file/stream-fed in production).

Scale notes: plan/phase metadata is small relative to the data a plan
processes, but the same transforms hold if the queue itself is huge —
dependency detection is an equi-join on exploded file keys (shuffle
on file, skew-salted if one path is hot), never an O(n²) cross join;
priority selection is an aggregate, not a global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Reference type→priority table (agents/orbiter.md:68-77).
TYPE_PRIORITY = {"security": 1, "bug": 2, "feature": 3, "refactor": 4, "chore": 5, "docs": 5}

# "Plan touches critical files (auth, security, payments) → -1"
# (agents/orbiter.md:82). Substring patterns over the plan's file set.
CRITICAL_FILE_RE = "auth|security|pay"

# Reference complexity→model routing (commands/pulsar.md:114-137):
# High*/Medium → opus, Low → sonnet, missing → sonnet (backward compat).
def route_model(complexity_col):
    return (
        F.when(complexity_col.startswith("High"), "opus")
        .when(complexity_col == "Medium", "opus")
        .when(complexity_col == "Low", "sonnet")
        .otherwise("sonnet")
    )


def plan_files(phases: DataFrame) -> DataFrame:
    """Distinct (plan_id, file) pairs — a plan's touched-file set."""
    return phases.select("plan_id", F.explode("files").alias("file")).distinct()


def dep_edges(plans: DataFrame, phases: DataFrame) -> DataFrame:
    """Inter-plan dependency edges (J4, `agents/orbiter.md:57-62`):
    B depends on A iff their file sets overlap and A was created first.

    Equi-join on the exploded file key — at scale this shuffles on
    `file`, not all-pairs.
    """
    pf = plan_files(phases)
    a = pf.alias("a").join(plans.select(F.col("id").alias("a_id"), F.col("created_at").alias("a_created")), F.col("a.plan_id") == F.col("a_id"))
    b = pf.alias("b").join(plans.select(F.col("id").alias("b_id"), F.col("created_at").alias("b_created")), F.col("b.plan_id") == F.col("b_id"))
    return (
        a.join(b, (F.col("a.file") == F.col("b.file")) & (F.col("a_id") != F.col("b_id")))
        .filter(F.col("a_created") < F.col("b_created"))
        .select(F.col("a_id").alias("dep_id"), F.col("b_id").alias("plan_id"))
        .distinct()
    )


def dep_satisfied(plans: DataFrame, phases: DataFrame) -> DataFrame:
    """Queued plans whose every dependency is completed (P1).

    eligible = queued ANTI-JOIN (edges whose dep is not completed).
    """
    edges = dep_edges(plans, phases)
    blocking = edges.join(
        plans.filter(F.col("status") != "completed").select(F.col("id").alias("dep_id")),
        "dep_id",
    ).select("plan_id").distinct()
    return plans.filter(F.col("status") == "queued").join(
        blocking, plans.id == blocking.plan_id, "left_anti"
    )


def priority_scores(plans: DataFrame, phases: DataFrame) -> DataFrame:
    """Priority projection (P9, `agents/orbiter.md:68-83`).

    base(type) − 1 if the plan unblocks others − 1 if it waited
    longest among queued − 1 if it touches critical files
    (auth/security/payments, orbiter.md:82) + 1 if large (≥4 phases).
    """
    base = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in TYPE_PRIORITY.items() for x in kv]),
            F.col("type"),
        ),
        F.lit(5),
    )
    edges = dep_edges(plans, phases)
    unblocks = edges.select(F.col("dep_id").alias("id")).distinct().withColumn("unblocks", F.lit(1))
    critical = (
        plan_files(phases)
        .filter(F.col("file").rlike(CRITICAL_FILE_RE))
        .select(F.col("plan_id").alias("id"))
        .distinct()
        .withColumn("critical", F.lit(1))
    )
    queued = plans.filter(F.col("status") == "queued")
    waited = queued.select(F.min("created_at").alias("oldest_created"))
    return (
        queued.join(unblocks, "id", "left")
        .join(critical, "id", "left")
        .crossJoin(waited)
        .select(
            "id",
            "project",
            "type",
            "created_at",
            (
                base
                - F.coalesce(F.col("unblocks"), F.lit(0))
                - F.when(F.col("created_at") == F.col("oldest_created"), 1).otherwise(0)
                - F.coalesce(F.col("critical"), F.lit(0))
                + F.when(F.col("n_phases") >= 4, 1).otherwise(0)
            ).cast("int").alias("priority"),
        )
    )


def best_plan(plans: DataFrame, phases: DataFrame) -> DataFrame:
    """Top-1 dispatch choice (O1, `agents/orbiter.md:85-89`): among
    dependency-satisfied queued plans, lowest priority then oldest."""
    eligible = dep_satisfied(plans, phases).select("id")
    scored = priority_scores(plans, phases).join(eligible, "id")
    return scored.orderBy("priority", "created_at", "id").limit(1)


# --- S11/L1: the external-LLM scorer seam --------------------------------
# The reference's signature operator delegates the dispatch choice to an
# external LLM process (`scripts/starry-daemon.sh:136-151`: `claude -p
# ... --model haiku --max-turns 5`), validates the reply against a
# `project:plan_id` pattern, checks the named plan actually exists in
# the queue, and falls back to the deterministic priority ordering when
# anything is off (`agents/orbiter.md:25-33`). `select_plan` reproduces
# that contract with the scorer injectable (any callable — subprocess,
# HTTP, in-process model); no external binary is assumed.
#
# Round 10: the seam is demonstrated LIVE against a real `claude` CLI
# on this host (tools/live_llm_probe.py → S11_LIVE_r10.json): a
# reference-policy probe whose validated reply agreed with O1, and an
# override-policy probe whose validated reply provably OVERRODE the
# deterministic pick — both through the full dispatch_once path in the
# reference's `claude -p … --model haiku --max-turns 5` shape, with
# candidates on stdin instead of embedded in the prompt (ADVICE r10:
# the reference daemon inlines the queue listing in the prompt, adds
# `--allowedTools`/`--output-format text`, and greps `project:plan_id`
# anywhere in the output; the probe takes the first stdout line — same
# CLI contract, simplified transport).

DISPATCH_RE = re.compile(r"^([A-Za-z0-9_.\-]+):([A-Za-z0-9_.\-]+)$")

# Candidates shown to the scorer: the top-N by the deterministic
# ordering. Bounds the prompt/driver footprint no matter the queue size
# (the distributed ordering does the heavy lifting; the scorer picks
# among finalists, same shape as the reference's truncated queue list).
SCORER_CANDIDATES = 16


def select_plan(plans: DataFrame, phases: DataFrame, scorer=None) -> DataFrame:
    """Dispatch selection with the external-scorer seam (S11/L1).

    ``scorer``: ``Callable[[list[dict]], str] | None`` — receives the
    top-``SCORER_CANDIDATES`` eligible plans (as dicts with id/project/
    type/priority/created_at) and returns ``"project:plan_id"``. The
    reply is validated exactly as the reference daemon validates the
    LLM's: pattern match, then membership in the eligible candidate
    set; a scorer exception, malformed reply, or unknown plan falls
    back to the deterministic O1 top-1 (the md-spec's own algorithm).
    With ``scorer=None`` this IS ``best_plan``.
    """
    if scorer is None:
        return best_plan(plans, phases)
    eligible = dep_satisfied(plans, phases).select("id")
    scored = priority_scores(plans, phases).join(eligible, "id")
    finalists = scored.orderBy("priority", "created_at", "id").limit(SCORER_CANDIDATES)
    candidates = [
        {k: (v.isoformat() if hasattr(v, "isoformat") else v) for k, v in r.asDict().items()}
        for r in finalists.collect()
    ]
    if not candidates:
        return best_plan(plans, phases)
    try:
        reply = scorer(candidates)
    except Exception:
        return best_plan(plans, phases)  # scorer crash → deterministic
    m = DISPATCH_RE.match((reply or "").strip())
    if m is None:
        return best_plan(plans, phases)  # malformed reply → deterministic
    project, plan_id = m.group(1), m.group(2)
    if not any(c["project"] == project and c["id"] == plan_id for c in candidates):
        return best_plan(plans, phases)  # nonexistent plan → deterministic
    return scored.filter((F.col("project") == project) & (F.col("id") == plan_id)).limit(1)


def subprocess_scorer(argv: list[str], timeout: float = 30.0):
    """Adapter running the scorer as an external process — the exact
    shape of the reference's `claude -p` invocation: candidates are
    written to stdin as JSON lines, the first stdout line is the
    reply. Returns a callable for ``select_plan(..., scorer=...)``."""
    import json as _json
    import subprocess as _subprocess

    def _score(candidates: list[dict]) -> str:
        out = _subprocess.run(
            argv,
            input=_json.dumps(candidates),
            capture_output=True,
            text=True,
            timeout=timeout,
            check=True,
        )
        return out.stdout.strip().splitlines()[0] if out.stdout.strip() else ""

    return _score


def phase_conflicts(phases: DataFrame) -> DataFrame:
    """Within-plan phase pairs sharing files (J5,
    `commands/pulsar.md:106-112`): (plan_id, earlier, later)."""
    pf = phases.select("plan_id", "phase", F.explode("files").alias("file"))
    a, b = pf.alias("a"), pf.alias("b")
    return (
        a.join(
            b,
            (F.col("a.plan_id") == F.col("b.plan_id"))
            & (F.col("a.file") == F.col("b.file"))
            & (F.col("a.phase") < F.col("b.phase")),
        )
        .select(F.col("a.plan_id").alias("plan_id"), F.col("a.phase").alias("earlier"), F.col("b.phase").alias("later"))
        .distinct()
    )


def phase_rounds(phases: DataFrame, max_iters: int = 16) -> DataFrame:
    """Round/barrier partitioning (Q4, `commands/pulsar.md:230-268`):
    round(phase) = longest conflict-chain depth; phases in the same
    round run fully parallel, rounds are barriers.

    Iterative frontier relaxation over the conflict DAG — the plan-level
    analog of Spark's own stage scheduling. The loop is driver-side but
    each step is a distributed join; depth ≤ max phase count bounds it.
    """
    # The conflict edge set is loop-invariant: checkpoint it ONCE so the
    # explode + self-join behind phase_conflicts runs one time, not once
    # per depth level inside every iteration's join plan.
    conflicts = phase_conflicts(phases).localCheckpoint(eager=False)
    # localCheckpoint truncates lineage each step — without it every
    # iteration re-plans (and the fixpoint probe re-executes) the whole
    # join chain so far, and the plan grows superlinearly with depth.
    # Lazy checkpoints throughout the loop: the fixpoint probe right
    # after each checkpoint materializes it in the same job (one action
    # per iteration instead of checkpoint-job + probe-job).
    rounds = (
        phases.select("plan_id", "phase")
        .withColumn("round", F.lit(1))
        .localCheckpoint(eager=False)
    )
    prev_max = 1
    converged = False
    for _ in range(max_iters):
        bumped = (
            conflicts.alias("c")
            .join(
                rounds.alias("r"),
                (F.col("c.plan_id") == F.col("r.plan_id")) & (F.col("c.earlier") == F.col("r.phase")),
            )
            .select(
                F.col("c.plan_id").alias("plan_id"),
                F.col("c.later").alias("phase"),
                (F.col("r.round") + 1).alias("round"),
            )
        )
        rounds = (
            rounds.unionByName(bumped)
            .groupBy("plan_id", "phase")
            .agg(F.max("round").alias("round"))
            .localCheckpoint(eager=False)
        )
        # Fixpoint when the frontier stopped deepening (ONE scalar probe
        # per step; the previous depth is remembered driver-side).
        new_max = rounds.agg(F.max("round")).first()[0]
        if new_max == prev_max:
            converged = True
            break
        prev_max = new_max
    if not converged:
        # The DuckDB twin (_ROUNDS_SQL, an unbounded recursive CTE) has
        # no such cap — a chain deeper than max_iters must error loudly
        # here rather than silently diverge between the two engines.
        raise ValueError(
            f"phase_rounds did not reach a fixpoint within max_iters={max_iters}; "
            f"conflict chain is deeper — raise max_iters (depth so far: {prev_max})"
        )
    return rounds


def latest_status(status_events: DataFrame) -> DataFrame:
    """Effective latest status per (project, plan_id, phase) with the
    completed-guard (P3, `hooks/status-tracker.sh:129-138`): terminal
    states are sticky — a stray `running` update arriving after
    `completed` must not regress the phase.

    Implemented as a rank over (terminal DESC, updated_at DESC,
    tool_count DESC): one shuffle on the phase key.
    """
    terminal = F.when(F.col("status").isin("completed", "failed"), 1).otherwise(0)
    w = W.partitionBy("project", "plan_id", "phase").orderBy(
        terminal.desc(), F.col("updated_at").desc(), F.col("tool_count").desc()
    )
    return (
        status_events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def stalled(latest: DataFrame, now_col, threshold_minutes: int = 10) -> DataFrame:
    """Stall detection (W1, `agents/orbiter.md:176-181`): running and
    silent longer than the threshold. ``now_col`` is injected — the
    reference couples to wall clock; tests inject a fixed NOW."""
    age_s = F.unix_timestamp(now_col) - F.unix_timestamp(F.col("updated_at"))
    return latest.withColumn(
        "stalled",
        (F.col("status") == "running") & (age_s > threshold_minutes * 60),
    )
