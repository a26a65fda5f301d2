"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`nova_pulsar_spark.registry`: every operator
module registers its judge-checkable queries (Spark callable +
DuckDB oracle SQL) there; this file re-exports them in the shape the
driver expects.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nova_pulsar_spark import registry as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nova_pulsar_spark.operators.relational import flagship

    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
