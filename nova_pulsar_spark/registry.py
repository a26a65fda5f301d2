"""Central query registry — the bridge to ``__spark_entry__.py``.

Every operator module registers its judge-checkable queries here with
an optional DuckDB oracle SQL string. The driver contract then simply
re-exports :func:`queries` and :func:`oracle_sql`.

Registration contract (mirrors the driver's correctness gate):
- the Spark callable takes ``(spark, sf_dir)`` and returns a
  DataFrame;
- the oracle SQL must be runnable by DuckDB against the same parquet
  tables (pre-registered views ``region nation customer supplier part
  orders lineitem events documents embeddings``);
- column names must match exactly between the two (the driver sorts
  columns by name before value-hashing), so both sides alias every
  computed column;
- ops that are genuinely non-SQL-expressible register with
  ``sql=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle SQL; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, sql: str | None = None, doc: str = ""):
    """Decorator: register ``fn`` as the Spark side of query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every operator module for its registration side effects."""
    # Imports are deferred so `import nova_pulsar_spark` stays cheap.
    from nova_pulsar_spark.operators import (  # noqa: F401
        advanced,
        cdc,
        dataquality,
        extras,
        aggregates,
        graphs,
        dedup,
        joins,
        multimodal,
        pipeline,
        relational,
        setops,
        similarity,
        textstats,
        timeseries,
        tpch_shapes,
        tpch_suite,
        topk,
        windows,
    )
    from nova_pulsar_spark.functions import extract, scalar  # noqa: F401
    from nova_pulsar_spark.plans import queue_queries  # noqa: F401
    from nova_pulsar_spark.streaming import stream_queries  # noqa: F401


# SURVEY.md §2 promises these exact query keys; where the registered
# name differs, expose the promised key as an alias of the same query.
ALIASES = {
    "pulse_aggregate": "agg_pulse",  # S8 — same rollup as A3
    "window_frame": "window_frame_moving",
    "fn_split": "fn_split_part",
    "fn_path": "fn_path_ops",
    "fn_array": "fn_array_ops",
    "fn_map": "fn_map_lookup",
    "fn_string": "fn_string_ops",
    "state_phase": "state_lifecycle",  # Q3 — phase status stream transitions
    # TPC-H namespace completeness: Q1/Q2/Q13/Q17 predate the tpch_q*
    # suite under these names; alias them so tpch_q1..q22 all resolve.
    "tpch_q1": "pricing_summary",
    "tpch_q2": "q_min_cost_supplier",
    "tpch_q13": "q_cust_order_histogram",
    "tpch_q17": "q_avg_quantity_outliers",
}


def all_queries() -> dict[str, RegisteredQuery]:
    _load_all_modules()
    out = dict(_REGISTRY)
    for alias, target in ALIASES.items():
        if alias not in out and target in out:
            t = out[target]
            out[alias] = RegisteredQuery(name=alias, fn=t.fn, sql=t.sql, doc=f"[alias of {target}] {t.doc}")
    return out


def queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: rq.sql for name, rq in all_queries().items() if rq.sql is not None}
