"""Deterministic queue-domain fixture tables (FIXTURES.md §B).

The reference's data model is plan/status/marker/board JSON records
in queue directories (SURVEY.md §1.1). The driver's DuckDB oracle
only pre-registers the analytic parquet views, so queue-domain
operators embed their inputs as deterministic inline fixtures
rendered BOTH ways from one definition:

- :func:`spark_df` → ``spark.createDataFrame`` with an explicit
  ``StructType`` (the engine's declared-schema improvement over the
  reference's convention-based JSON, SURVEY.md §1.3);
- :func:`values_cte` → a DuckDB ``VALUES`` relation with typed
  literals, usable as a CTE in oracle SQL.

Scenario coverage (timestamps around NOW = 2026-03-01 12:00:00 UTC):
independent/chained/overlapping plans, an active plan with a stalled
phase (>10 min silent — `agents/orbiter.md:176-181`), a hung phase
(unchanged tool_count — `commands/pulsar.md:347-352`), an
out-of-order update after `completed` (`hooks/status-tracker.sh:129-138`),
claimed/unclaimed markers (`commands/pulsar.md:192-201`), legacy
review/archived board rows for the U1 migration (`scripts/setup.sh:60-113`),
plans missing `Complexity` (backward-compat → sonnet,
`commands/pulsar.md:135-137`), and a renamed project namespace
(`scripts/resolve-namespace.sh:33-65`).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NOW = datetime(2026, 3, 1, 12, 0, 0)
NOW_SQL = "TIMESTAMP '2026-03-01 12:00:00'"


def _ts(day: int, hour: int, minute: int, second: int = 0) -> datetime:
    return datetime(2026, 2, day, hour, minute, second) if day < 29 else datetime(2026, 3, day - 28, hour, minute, second)


_SPARK_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "array<string>": T.ArrayType(T.StringType()),
}

_DUCK_TYPES = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "long": "BIGINT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "array<string>": "VARCHAR[]",
}


@dataclass(frozen=True)
class Fixture:
    name: str
    columns: tuple[tuple[str, str], ...]  # (col_name, type_name)
    rows: tuple[tuple, ...]

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c, _SPARK_TYPES[t], True) for c, t in self.columns]
        )

    def spark_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(list(self.rows), schema=self.spark_schema())

    def _literal(self, v, type_name: str) -> str:
        if v is None:
            return f"CAST(NULL AS {_DUCK_TYPES[type_name]})"
        if type_name == "string":
            return "'" + str(v).replace("'", "''") + "'"
        if type_name == "timestamp":
            return "TIMESTAMP '" + v.strftime("%Y-%m-%d %H:%M:%S") + "'"
        if type_name == "array<string>":
            inner = ", ".join("'" + s.replace("'", "''") + "'" for s in v)
            return f"[{inner}]"
        if type_name == "boolean":
            return "TRUE" if v else "FALSE"
        if type_name == "int":
            return f"CAST({v} AS INTEGER)"
        return str(v)

    def values_cte(self) -> str:
        """`name AS (SELECT * FROM (VALUES ...) AS t(cols))` CTE body."""
        col_names = ", ".join(c for c, _ in self.columns)
        value_rows = ",\n    ".join(
            "(" + ", ".join(self._literal(v, t) for v, (_, t) in zip(row, self.columns)) + ")"
            for row in self.rows
        )
        return f"{self.name} AS (SELECT * FROM (VALUES\n    {value_rows}\n  ) AS t({col_names}))"


def with_fixtures(sql: str, *fixtures: Fixture) -> str:
    """Prepend fixture CTEs to an oracle SQL body."""
    ctes = ",\n  ".join(f.values_cte() for f in fixtures)
    return f"WITH\n  {ctes}\n{sql}"


# ---------------------------------------------------------------------------
# plans — one row per plan (reference metadata block, commands/nova.md:292-373)
# ---------------------------------------------------------------------------
PLANS = Fixture(
    name="plans",
    columns=(
        ("id", "string"),
        ("title", "string"),
        ("project", "string"),
        ("project_path", "string"),
        ("thread_id", "string"),
        ("type", "string"),
        ("status", "string"),
        ("execution_mode", "string"),
        ("created_at", "timestamp"),
        ("n_phases", "int"),
        ("parallel_groups", "int"),
    ),
    rows=(
        ("plan-20260225-0900", "Add auth module", "alpha", "/w/alpha", "th-01", "feature", "completed", "background", _ts(25, 9, 0), 3, 2),
        ("plan-20260226-1000", "Fix login bug", "alpha", "/w/alpha", None, "bug", "completed", "background", _ts(26, 10, 0), 2, 1),
        ("plan-20260227-1100", "Payments v2", "alpha", "/w/alpha", "th-02", "feature", "active", "background", _ts(27, 11, 0), 4, 3),
        ("plan-20260228-0900", "Refactor auth", "alpha", "/w/alpha", None, "refactor", "queued", "background", _ts(28, 9, 0), 2, 2),
        ("plan-20260228-1000", "Search feature", "alpha", "/w/alpha", "th-03", "feature", "queued", "background", _ts(28, 10, 0), 4, 2),
        ("plan-20260228-1100", "Cleanup deps", "alpha", "/w/alpha", None, "chore", "queued", "background", _ts(28, 11, 0), 1, 1),
        ("plan-20260226-0900", "Crash on save", "beta", "/w/beta", "th-04", "bug", "queued", "background", _ts(26, 9, 0), 2, 1),
        ("plan-20260227-0800", "Patch CVE", "beta", "/w/beta", None, "security", "queued", "background", _ts(27, 8, 0), 1, 1),
        ("plan-20260225-1200", "Update docs", "beta", "/w/beta", None, "docs", "completed", "background", _ts(25, 12, 0), 1, 1),
        ("plan-20260228-1200", "Gamma dashboard", "gamma", "/w/gamma", "th-05", "feature", "queued", "interactive", _ts(28, 12, 0), 5, 3),
        ("plan-20260224-0800", "Gamma ingest", "gamma", "/w/gamma", None, "feature", "failed", "background", _ts(24, 8, 0), 3, 2),
        # active plan whose agent died days ago: the plan FILE is present
        # but the heartbeat is stale — S10 liveness must call it dead
        ("plan-20260224-0850", "Gamma migration", "gamma", "/w/gamma", "th-06", "refactor", "active", "background", _ts(24, 8, 50), 1, 1),
        ("plan-20260228-1300", "Gamma fix nulls", "gamma", "/w/gamma", None, "bug", "queued", "background", _ts(28, 13, 0), 2, 1),
        # critical-files plan (orbiter.md:82): chore touching src/security/
        # → priority 4, ranking ABOVE the earlier-created "Cleanup deps"
        # chore (5) — the rank flip only the critical-files −1 can cause.
        ("plan-20260228-1400", "Rotate signing keys", "beta", "/w/beta", None, "chore", "queued", "background", _ts(28, 14, 0), 1, 1),
    ),
)

# ---------------------------------------------------------------------------
# phases — exploded phase list (commands/nova.md:314-338); complexity NULL on
# some rows exercises the backward-compat default (pulsar.md:135-137)
# ---------------------------------------------------------------------------
PHASES = Fixture(
    name="phases",
    columns=(
        ("plan_id", "string"),
        ("phase", "int"),
        ("title", "string"),
        ("files", "array<string>"),
        ("complexity", "string"),
        ("agent", "string"),
    ),
    rows=(
        ("plan-20260225-0900", 1, "Schema", ["src/auth/model.py"], "High (Architectural)", "opus"),
        ("plan-20260225-0900", 2, "Endpoints", ["src/auth/api.py"], "Medium", "opus"),
        ("plan-20260225-0900", 3, "Tests", ["tests/test_auth.py"], "Low", "sonnet"),
        ("plan-20260226-1000", 1, "Repro", ["tests/test_login.py"], "Low", "sonnet"),
        ("plan-20260226-1000", 2, "Fix", ["src/auth/api.py"], "Medium", "opus"),
        ("plan-20260227-1100", 1, "Data model", ["src/pay/model.py"], "High (Architectural)", "opus"),
        ("plan-20260227-1100", 2, "Gateway", ["src/pay/gateway.py"], "High (Implementation)", "opus"),
        ("plan-20260227-1100", 3, "Webhooks", ["src/pay/hooks.py"], "Medium", "opus"),
        ("plan-20260227-1100", 4, "Tests", ["tests/test_pay.py"], "Low", "sonnet"),
        ("plan-20260228-0900", 1, "Extract service", ["src/auth/model.py", "src/auth/service.py"], "High (Implementation)", "opus"),
        ("plan-20260228-0900", 2, "Migrate callers", ["src/auth/api.py"], None, None),
        ("plan-20260228-1000", 1, "Index builder", ["src/search/index.py"], "High (Architectural)", "opus"),
        ("plan-20260228-1000", 2, "Query parser", ["src/search/parse.py"], "Medium", "opus"),
        ("plan-20260228-1000", 3, "API", ["src/search/api.py", "src/pay/gateway.py"], "Medium", "opus"),
        ("plan-20260228-1000", 4, "Tests", ["tests/test_search.py"], "Low", "sonnet"),
        ("plan-20260228-1100", 1, "Prune deps", ["pyproject.toml"], None, None),
        ("plan-20260226-0900", 1, "Repro crash", ["tests/test_save.py"], "Low", "sonnet"),
        ("plan-20260226-0900", 2, "Fix writer", ["src/io/writer.py"], "Medium", "opus"),
        ("plan-20260227-0800", 1, "Bump lib", ["requirements.txt"], "Low", "sonnet"),
        ("plan-20260225-1200", 1, "Rewrite README", ["README.md"], "Low", "sonnet"),
        ("plan-20260228-1200", 1, "Layout", ["ui/layout.tsx"], "Medium", "opus"),
        ("plan-20260228-1200", 2, "Charts", ["ui/charts.tsx"], "Medium", "opus"),
        ("plan-20260228-1200", 3, "State", ["ui/state.ts"], "High (Implementation)", "opus"),
        ("plan-20260228-1200", 4, "Wire API", ["ui/api.ts", "ui/state.ts"], "Medium", "opus"),
        ("plan-20260228-1200", 5, "Tests", ["ui/tests/dash.test.ts"], "Low", "sonnet"),
        ("plan-20260224-0850", 1, "Migrate schema", ["ops/migrate.sql"], "Medium", "opus"),
        ("plan-20260224-0800", 1, "Schema", ["etl/schema.sql"], "Medium", "opus"),
        ("plan-20260224-0800", 2, "Loader", ["etl/load.py"], "High (Implementation)", "opus"),
        ("plan-20260224-0800", 3, "Backfill", ["etl/backfill.py"], "Medium", "opus"),
        ("plan-20260228-1300", 1, "Null guard", ["etl/load.py"], "Low", "sonnet"),
        ("plan-20260228-1300", 2, "Tests", ["etl/tests/test_load.py"], "Low", "sonnet"),
        ("plan-20260228-1400", 1, "Rotate keys", ["src/security/keys.py"], "Low", "sonnet"),
    ),
)

# ---------------------------------------------------------------------------
# status_events — append-only per-tool-use stream
# (hooks/status-tracker.sh:158-182; one row per atomic status rewrite)
# ---------------------------------------------------------------------------
STATUS_EVENTS = Fixture(
    name="status_events",
    columns=(
        ("task_id", "string"),
        ("project", "string"),
        ("plan_id", "string"),
        ("phase", "int"),
        ("thread_id", "string"),
        ("status", "string"),
        ("tool_count", "int"),
        ("last_tool", "string"),
        ("last_file", "string"),
        ("updated_at", "timestamp"),
        ("started_at", "timestamp"),
        ("completed_at", "timestamp"),
    ),
    rows=(
        # plan-20260227-1100 phase 1: normal completed progression
        ("phase-1-plan-20260227-1100", "alpha", "plan-20260227-1100", 1, "th-02", "starting", 0, None, None, _ts(29, 10, 0), _ts(29, 10, 0), None),
        ("phase-1-plan-20260227-1100", "alpha", "plan-20260227-1100", 1, "th-02", "running", 5, "Edit", "src/pay/model.py", _ts(29, 10, 10), _ts(29, 10, 0), None),
        ("phase-1-plan-20260227-1100", "alpha", "plan-20260227-1100", 1, "th-02", "running", 12, "Bash", "src/pay/model.py", _ts(29, 10, 25), _ts(29, 10, 0), None),
        ("phase-1-plan-20260227-1100", "alpha", "plan-20260227-1100", 1, "th-02", "completed", 14, "Bash", "src/pay/model.py", _ts(29, 10, 40), _ts(29, 10, 0), _ts(29, 10, 40)),
        # out-of-order update AFTER completed — the P3 guard must ignore it
        ("phase-1-plan-20260227-1100", "alpha", "plan-20260227-1100", 1, "th-02", "running", 15, "Read", "src/pay/model.py", _ts(29, 10, 41), _ts(29, 10, 0), None),
        # phase 2: stalled (silent since 11:45, NOW 12:00 → 15 min > 10 min)
        ("phase-2-plan-20260227-1100", "alpha", "plan-20260227-1100", 2, "th-02", "starting", 0, None, None, _ts(29, 11, 0), _ts(29, 11, 0), None),
        ("phase-2-plan-20260227-1100", "alpha", "plan-20260227-1100", 2, "th-02", "running", 3, "Edit", "src/pay/gateway.py", _ts(29, 11, 20), _ts(29, 11, 0), None),
        ("phase-2-plan-20260227-1100", "alpha", "plan-20260227-1100", 2, "th-02", "running", 9, "Bash", "src/pay/gateway.py", _ts(29, 11, 45), _ts(29, 11, 0), None),
        # phase 3: hung (tool_count unchanged 11:58→11:59:30 > 60 s) but fresh
        ("phase-3-plan-20260227-1100", "alpha", "plan-20260227-1100", 3, "th-02", "running", 7, "Read", "src/pay/hooks.py", _ts(29, 11, 58), _ts(29, 11, 30), None),
        ("phase-3-plan-20260227-1100", "alpha", "plan-20260227-1100", 3, "th-02", "running", 7, "Read", "src/pay/hooks.py", _ts(29, 11, 59, 30), _ts(29, 11, 30), None),
        # phase 4: fresh running, progressing
        ("phase-4-plan-20260227-1100", "alpha", "plan-20260227-1100", 4, "th-02", "running", 2, "Write", "tests/test_pay.py", _ts(29, 11, 59), _ts(29, 11, 50), None),
        # completed plan-20260225-0900 (history for ETA/exec-log aggregates)
        ("phase-1-plan-20260225-0900", "alpha", "plan-20260225-0900", 1, "th-01", "completed", 20, "Bash", "src/auth/model.py", _ts(25, 10, 0), _ts(25, 9, 30), _ts(25, 10, 0)),
        ("phase-2-plan-20260225-0900", "alpha", "plan-20260225-0900", 2, "th-01", "completed", 31, "Edit", "src/auth/api.py", _ts(25, 10, 50), _ts(25, 10, 10), _ts(25, 10, 50)),
        ("phase-3-plan-20260225-0900", "alpha", "plan-20260225-0900", 3, "th-01", "completed", 9, "Bash", "tests/test_auth.py", _ts(25, 11, 10), _ts(25, 10, 55), _ts(25, 11, 10)),
        ("phase-1-plan-20260226-1000", "alpha", "plan-20260226-1000", 1, None, "completed", 6, "Bash", "tests/test_login.py", _ts(26, 10, 30), _ts(26, 10, 10), _ts(26, 10, 30)),
        ("phase-2-plan-20260226-1000", "alpha", "plan-20260226-1000", 2, None, "completed", 11, "Edit", "src/auth/api.py", _ts(26, 11, 5), _ts(26, 10, 35), _ts(26, 11, 5)),
        # stale active plan: last heartbeat days before NOW (S10 liveness)
        ("phase-1-plan-20260224-0850", "gamma", "plan-20260224-0850", 1, "th-06", "running", 4, "Bash", "ops/migrate.sql", _ts(24, 9, 0), _ts(24, 8, 55), None),
        # failed plan-20260224-0800 phase 2
        ("phase-1-plan-20260224-0800", "gamma", "plan-20260224-0800", 1, None, "completed", 8, "Bash", "etl/schema.sql", _ts(24, 8, 40), _ts(24, 8, 10), _ts(24, 8, 40)),
        ("phase-2-plan-20260224-0800", "gamma", "plan-20260224-0800", 2, None, "failed", 17, "Bash", "etl/load.py", _ts(24, 9, 30), _ts(24, 8, 45), _ts(24, 9, 30)),
    ),
)

# ---------------------------------------------------------------------------
# markers — claim records (commands/pulsar.md:192-201); pid NULL until claimed
# ---------------------------------------------------------------------------
MARKERS = Fixture(
    name="markers",
    columns=(
        ("session_id", "string"),
        ("project", "string"),
        ("plan_id", "string"),
        ("phase", "int"),
        ("thread_id", "string"),
        ("pid", "string"),
        ("created_by", "string"),
        ("created_at", "timestamp"),
    ),
    rows=(
        ("sess-a1", "alpha", "plan-20260227-1100", 1, "th-02", "40001", "orchestrator", _ts(29, 9, 58)),
        ("sess-a2", "alpha", "plan-20260227-1100", 2, "th-02", "40002", "orchestrator", _ts(29, 10, 58)),
        ("sess-a3", "alpha", "plan-20260227-1100", 3, "th-02", "40003", "orchestrator", _ts(29, 11, 28)),
        ("sess-a4", "alpha", "plan-20260227-1100", 4, "th-02", None, "orchestrator", _ts(29, 11, 48)),
        ("sess-g1", "gamma", "plan-20260228-1200", 1, "th-05", None, "orchestrator", _ts(29, 11, 55)),
    ),
)

# ---------------------------------------------------------------------------
# board — index entries (commands/nova.md:475-491); includes legacy
# review/archived rows + stale paths for the U1 migration
# ---------------------------------------------------------------------------
BOARD = Fixture(
    name="board",
    columns=(
        ("id", "string"),
        ("title", "string"),
        ("project", "string"),
        ("status", "string"),
        ("path", "string"),
        ("created_at", "timestamp"),
        ("n_phases", "int"),
        ("parallel_groups", "int"),
    ),
    rows=(
        ("plan-20260225-0900", "Add auth module", "alpha", "completed", "/comms/plans/alpha/completed/plan-20260225-0900.md", _ts(25, 9, 0), 3, 2),
        ("plan-20260226-1000", "Fix login bug", "alpha", "completed", "/comms/plans/alpha/completed/plan-20260226-1000.md", _ts(26, 10, 0), 2, 1),
        ("plan-20260227-1100", "Payments v2", "alpha", "active", "/comms/plans/alpha/active/plan-20260227-1100.md", _ts(27, 11, 0), 4, 3),
        ("plan-20260228-0900", "Refactor auth", "alpha", "queued", "/comms/plans/alpha/queued/background/plan-20260228-0900.md", _ts(28, 9, 0), 2, 2),
        ("plan-20260228-1000", "Search feature", "alpha", "queued", "/comms/plans/alpha/queued/background/plan-20260228-1000.md", _ts(28, 10, 0), 4, 2),
        # legacy rows to migrate (review/ and archived/ → completed/)
        ("plan-20251201-0900", "Old spike", "alpha", "review", "/comms/plans/alpha/review/plan-20251201-0900.md", datetime(2025, 12, 1, 9, 0, 0), 2, 1),
        ("plan-20251115-1400", "Ancient refactor", "beta", "archived", "/comms/plans/beta/archived/plan-20251115-1400.md", datetime(2025, 11, 15, 14, 0, 0), 3, 2),
        ("plan-20260226-0900", "Crash on save", "beta", "queued", "/comms/plans/beta/queued/background/plan-20260226-0900.md", _ts(26, 9, 0), 2, 1),
    ),
)

# ---------------------------------------------------------------------------
# configs — namespace descriptors (scripts/setup.sh:136-142); gamma-old is a
# renamed project (same path as gamma → rename resolution J6)
# ---------------------------------------------------------------------------
CONFIGS = Fixture(
    name="configs",
    columns=(
        ("project", "string"),
        ("project_path", "string"),
        ("created_at", "timestamp"),
    ),
    rows=(
        ("alpha", "/w/alpha", _ts(24, 7, 0)),
        ("beta", "/w/beta", _ts(24, 7, 30)),
        ("gamma-old", "/w/gamma", _ts(24, 7, 45)),
    ),
)

# ---------------------------------------------------------------------------
# plan_docs — raw plan markdown (S5 semi-structured metadata extraction,
# scripts/pulsar-auto.sh:50-62)
# ---------------------------------------------------------------------------
PLAN_DOCS = Fixture(
    name="plan_docs",
    columns=(("plan_id", "string"), ("md_text", "string")),
    rows=(
        (
            "plan-20260228-0900",
            "# Plan: Refactor auth\n**ID**: plan-20260228-0900\n**Project**: alpha\n**Project Path**: /w/alpha\n**Thread ID**: null\n**Type**: refactor\n**Status**: queued",
        ),
        (
            "plan-20260228-1000",
            "# Plan: Search feature\n**ID**: plan-20260228-1000\n**Project**: alpha\n**Project Path**: /w/alpha\n**Thread ID**: th-03\n**Type**: feature\n**Status**: queued",
        ),
        (
            "plan-20260228-1200",
            "# Plan: Gamma dashboard\n**ID**: plan-20260228-1200\n**Project**: gamma\n**Project Path**: /w/gamma\n**Thread ID**: th-05\n**Type**: feature\n**Status**: queued",
        ),
    ),
)

ALL_FIXTURES = (PLANS, PHASES, STATUS_EVENTS, MARKERS, BOARD, CONFIGS, PLAN_DOCS)
