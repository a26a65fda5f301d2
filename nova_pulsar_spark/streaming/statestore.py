"""State-store configuration for the stateful streaming layer.

The default (HDFSBackedStateStoreProvider) keeps every key's state as
JVM heap objects — fine for the reference's plan counts (hundreds),
but at pipeline scale (millions of in-flight keys: one per
(plan_id, phase) or per document batch) heap state causes GC pauses
and executor OOM. RocksDB keeps state off-heap with incremental
checkpointing; Spark ships the provider + rocksdbjni in the binary
distribution, so switching is one conf.

Reference behavior analog: the reference's state is the filesystem
itself (`.starry/queues/*`); the scale story is the same — state must
not live in one process's memory.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def enable_rocksdb(spark: SparkSession, changelog: bool = True) -> None:
    """Back all streaming state started after this call with RocksDB.

    ``changelog`` turns on changelog checkpointing: per-batch uploads
    are the delta, not the full SST set — the difference between O(state)
    and O(changes) checkpoint cost on large state.
    """
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog else "false",
    )


@contextmanager
def rocksdb_state_store(spark: SparkSession) -> Iterator[None]:
    """Scoped RocksDB provider: restores the previous provider after.

    The provider is read at query START — queries already running keep
    their store; use this around ``writeStream.start()``.
    """
    prev = spark.conf.get(_PROVIDER_KEY, None)
    enable_rocksdb(spark)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
