"""Arbitrary stateful streaming on the transformWithState v2 API
(Spark 4 ``transformWithStateInPandas``) — typed per-key state with
native TTL, the successor to ``applyInPandasWithState``
(streaming/stateful.py keeps the v1 form for comparison).

``stream_first_seen`` is cross-batch EXACT dedup as a state-store
operator: one boolean ValueState per key, first occurrence emitted,
replays suppressed. It complements the ledger-file dedup
(streaming/pipeline.py: stream_dedup_ledger) with the state-native
shape — RocksDB-backed on a cluster, checkpoint-recovered, and
TTL-bounded so unbounded key domains (the reference's (ticker, t)
candle keys growing forever, README.md:20's expected duplicates) do
not grow state without bound. TTL is the state-size/correctness dial:
duplicates arriving within ``ttl_ms`` of the first sighting are
dropped; later replays (beyond any sane page overlap) pass through.

Runtime requirement: the v2 API's Python<->JVM state protocol is
protobuf-framed — ``google.protobuf`` must be importable on driver and
executors or the query fails at initialization (tests skip themselves
when it's absent; the v1 operators in streaming/stateful.py have no such
dependency and cover the same semantics in those environments).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class FirstSeenProcessor(StatefulProcessor):
    """Emit only the first row ever observed for the grouping key."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            # Drain without emitting: the contract requires consuming the
            # iterator even when this batch's rows are all duplicates.
            for _ in rows:
                pass
            return
        first = None
        for pdf in rows:
            if first is None and len(pdf):
                first = pdf.iloc[:1]
        if first is not None:
            self._seen.update((True,))
            yield first

    def close(self) -> None:
        pass


def stream_first_seen(
    stream: DataFrame,
    keys,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch keyed dedup over a stream: the first row per ``keys``
    is emitted, every later duplicate (same or later micro-batch, within
    ``ttl_ms`` if set) is dropped. Output schema = input schema.

    State is one boolean per key, sharded by the grouping key across the
    cluster and persisted in the query checkpoint — a restarted query
    keeps suppressing duplicates it saw before the crash.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    return stream.groupBy(*keys).transformWithStateInPandas(
        FirstSeenProcessor(ttl_ms),
        outputStructType=stream.schema,
        outputMode="append",
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
