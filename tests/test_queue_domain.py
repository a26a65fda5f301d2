"""Behavioral assertions for the queue-domain semantics (SURVEY.md §2.9,
FIXTURES.md §B scenarios) — beyond oracle equality, these pin the
*expected* reference behaviors to concrete fixture outcomes."""

from __future__ import annotations

from pyspark.sql import functions as F

from nova_pulsar_spark.plans import scheduler as S
from nova_pulsar_spark.plans.fixtures import NOW, PHASES, PLANS, STATUS_EVENTS


def test_dep_satisfied_blocks_on_active_and_failed_deps(spark):
    eligible = {r.id for r in S.dep_satisfied(PLANS.spark_df(spark), PHASES.spark_df(spark)).collect()}
    # search overlaps the ACTIVE payments plan; gamma-1300 overlaps the FAILED ingest plan
    assert "plan-20260228-1000" not in eligible
    assert "plan-20260228-1300" not in eligible
    # refactor's deps are both completed
    assert "plan-20260228-0900" in eligible


def test_best_plan_is_oldest_waiting_bug(spark):
    best = S.best_plan(PLANS.spark_df(spark), PHASES.spark_df(spark)).collect()
    assert len(best) == 1
    # bug (base 2) with waited-longest boost (−1) beats security (1) on created tie-break
    assert best[0].id == "plan-20260226-0900"
    assert best[0].priority == 1


def test_completed_guard_suppresses_regression(spark):
    latest = S.latest_status(STATUS_EVENTS.spark_df(spark))
    row = latest.filter(
        (F.col("plan_id") == "plan-20260227-1100") & (F.col("phase") == 1)
    ).collect()[0]
    # a stray `running` update 1 min after `completed` must not regress
    assert row.status == "completed"


def test_stall_detection_10min_boundary(spark):
    latest = S.latest_status(STATUS_EVENTS.spark_df(spark))
    now = F.to_timestamp(F.lit(NOW.strftime("%Y-%m-%d %H:%M:%S")))
    flags = {
        (r.plan_id, r.phase): r.stalled
        for r in S.stalled(latest, now).filter(F.col("plan_id") == "plan-20260227-1100").collect()
    }
    assert flags[("plan-20260227-1100", 2)] is True  # silent 15 min
    assert flags[("plan-20260227-1100", 3)] is False  # 30 s old
    assert flags[("plan-20260227-1100", 4)] is False  # 1 min old
    assert flags[("plan-20260227-1100", 1)] is False  # completed, never stalled


def test_phase_rounds_serialize_conflicts(spark):
    rounds = {
        (r.plan_id, r.phase): r.round
        for r in S.phase_rounds(PHASES.spark_df(spark)).collect()
    }
    # gamma dashboard: phase 4 shares ui/state.ts with phase 3 → round 2
    assert rounds[("plan-20260228-1200", 3)] == 1
    assert rounds[("plan-20260228-1200", 4)] == 2
    # independent phases all round 1
    assert rounds[("plan-20260228-0900", 1)] == 1
    assert rounds[("plan-20260228-0900", 2)] == 1


def test_phase_rounds_raises_on_uncapped_depth(spark):
    """A conflict chain deeper than max_iters must raise, not silently
    truncate: the DuckDB twin (_ROUNDS_SQL) is an unbounded recursive
    CTE, so a silent cap would be a cross-engine divergence (ADVICE r7)."""
    import pytest

    chain = spark.createDataFrame(
        [("p", i, f"phase {i}", [f"f{i}.py", f"f{i+1}.py"], "Low", "a") for i in range(1, 6)],
        "plan_id string, phase int, title string, files array<string>, complexity string, agent string",
    )
    with pytest.raises(ValueError, match="fixpoint"):
        S.phase_rounds(chain, max_iters=2)
    # generous cap converges fine on the same input
    depths = {r.phase: r.round for r in S.phase_rounds(chain, max_iters=16).collect()}
    assert depths == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


def test_model_routing_backward_compat_default(spark):
    routed = {
        (r.plan_id, r.phase): r.model
        for r in PHASES.spark_df(spark)
        .select("plan_id", "phase", S.route_model(F.col("complexity")).alias("model"))
        .collect()
    }
    assert routed[("plan-20260227-1100", 1)] == "opus"  # High (Architectural)
    assert routed[("plan-20260227-1100", 4)] == "sonnet"  # Low
    assert routed[("plan-20260228-0900", 2)] == "sonnet"  # missing complexity → default


def test_critical_files_adjustment_flips_chore_rank(spark):
    """orbiter.md:82 — 'Plan touches critical files (auth, security,
    payments) → -1'. The security-keys chore (created LAST) must rank
    ahead of the earlier-created plain chore purely because of the
    critical-files adjustment."""
    scores = {
        r.id: r.priority
        for r in S.priority_scores(PLANS.spark_df(spark), PHASES.spark_df(spark)).collect()
    }
    assert scores["plan-20260228-1400"] == 4  # chore 5 − critical 1
    assert scores["plan-20260228-1100"] == 5  # chore, no critical files
    assert scores["plan-20260228-1400"] < scores["plan-20260228-1100"]
    # auth-refactor gets the same −1 (base 4 → 3)
    assert scores["plan-20260228-0900"] == 3


def test_stale_heartbeat_active_plan_is_not_live(spark):
    """S10 (starry-daemon.sh:77-85): an active plan file whose agent
    stopped heartbeating days ago is stale state — not activity."""
    from nova_pulsar_spark.plans.queue_queries import scan_active_live

    rows = {r.plan_id: r.live for r in scan_active_live(spark, "unused").collect()}
    assert rows["plan-20260227-1100"] is True  # heartbeat 30 s before NOW
    assert rows["plan-20260224-0850"] is False  # heartbeat days old


def test_resolve_plan_corrupt_queue_file_raises(spark, tmp_path):
    """ADVICE r7 follow-through, closed properly in r8: a corrupt plan
    file must RAISE out of resolve_plan, not be PERMISSIVE-parsed into
    an all-null row that resolves as `load plan None`. The read is
    FAILFAST; only a missing queue DIRECTORY means 'empty queue'."""
    import os

    import pytest

    from nova_pulsar_spark.plans.pulsar import resolve_plan
    from nova_pulsar_spark.streaming.topics import QueueNamespace

    root = str(tmp_path / "comms")
    ns = QueueNamespace(root=root, project="p")
    ns.setup()
    with open(os.path.join(ns.dir_for("queued_interactive"), "bad.json"), "w") as f:
        f.write('{"id": "plan-x", "created_at": TRUNCATED')
    with pytest.raises(Exception, match="(?i)malformed|failfast|parse"):
        resolve_plan(spark, root, "p")
    # explicit-id lookup scans the same dir and must also raise
    with pytest.raises(Exception, match="(?i)malformed|failfast|parse"):
        resolve_plan(spark, root, "p", "plan-x")


def test_dispatch_corrupt_plan_file_raises(spark, tmp_path):
    """The daemon scan is FAILFAST too — an unreadable plan must not
    silently become an all-null Orbiter candidate (r8, same class)."""
    import json
    import os

    import pytest

    from nova_pulsar_spark.plans.daemon import dispatch_once
    from nova_pulsar_spark.streaming.topics import QueueNamespace

    root = str(tmp_path / "comms")
    ns = QueueNamespace(root=root, project="p")
    ns.setup()
    with open(os.path.join(ns.dir_for("queued_background"), "bad.json"), "w") as f:
        f.write("not json at all")
    with pytest.raises(Exception, match="(?i)malformed|failfast|parse"):
        dispatch_once(spark, root)
