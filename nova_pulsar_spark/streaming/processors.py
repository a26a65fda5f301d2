"""Spark 4 `transformWithStateInPandas` processors — the successor API
to `applyInPandasWithState` used by :mod:`.state`.

Why both: `applyInPandasWithState` carries the full lifecycle machine
(it is the GA API the reference's watcher semantics were built on);
`transformWithStateInPandas` is the forward path — typed state
variables (value/list/map), timers, and TTL managed by the engine,
and it REQUIRES the RocksDB state store (see :mod:`.statestore`),
which is the right default at scale anyway.

Reference parity: the running per-plan event counter mirrors the
tool-count accumulation of `hooks/status-tracker.sh:140-153` (A6) in
stateful-stream form: state is one bigint per key, shard-local,
no driver involvement.

Runtime dependency: the transformWithState Python↔JVM state protocol
uses protobuf; environments without ``google.protobuf`` can import
and plan these processors but not execute them (the live test skips
itself accordingly) — `applyInPandasWithState` in :mod:`.state`
remains the dependency-free execution path.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

COUNTER_OUTPUT_SCHEMA = "plan_id STRING, n_events BIGINT"


class EventCounterProcessor(StatefulProcessor):
    """Running event count per plan_id held in engine-managed ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.count = handle.getValueState("count", "n BIGINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        prev = self.count.get()
        total = int(prev[0] if prev is not None else 0) + n
        self.count.update((total,))
        yield pd.DataFrame({"plan_id": [key[0]], "n_events": [total]})

    def close(self) -> None:
        pass


def event_counter_stream(status_stream: DataFrame) -> DataFrame:
    """Per-plan running event counts via the processor API.

    Caller must enable the RocksDB provider first
    (`statestore.enable_rocksdb` / `rocksdb_state_store`) —
    transformWithState refuses the default HDFS-backed store.
    """
    return status_stream.groupBy("plan_id").transformWithStateInPandas(
        statefulProcessor=EventCounterProcessor(),
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
