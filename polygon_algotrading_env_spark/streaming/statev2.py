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

Runtime requirements (both self-checkable, neither default-on in bare
local installs):

1. The v2 API's Python<->JVM state protocol is protobuf-framed —
   ``google.protobuf`` must be importable on driver and executors.
   :func:`ensure_protobuf_runtime` makes that true where possible: it
   prefers an installed protobuf and otherwise falls back to the
   pure-Python runtime bundled with a system Google Cloud SDK (a
   standard public install location), exporting it on ``PYTHONPATH`` so
   executor Python workers inherit it. It must run BEFORE the
   SparkSession (JVM) starts, or workers won't see the path.
2. transformWithState creates multiple state-store column families,
   which the default HDFSBackedStateStoreProvider rejects — set
   ``spark.sql.streaming.stateStore.providerClass`` to
   ``org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
   (a SQL conf, settable per-session; the RocksDB jars ship with Spark).

Where neither holds, the v1 operators in streaming/stateful.py and the
parquet-ledger dedup (streaming/pipeline.py) have no such dependencies
and cover the same semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

#: SQL conf required by transformWithState (multi-column-family state).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# Public, well-known locations that bundle a pure-Python google.protobuf
# runtime on systems where it isn't pip-installed.
_PROTOBUF_FALLBACKS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf_runtime() -> bool:
    """Make ``google.protobuf`` importable for this process AND for the
    executor Python workers Spark will spawn (via ``PYTHONPATH``), using
    a bundled pure-Python runtime when none is installed. Returns whether
    a usable runtime is now present.

    Must be called BEFORE the SparkSession starts: workers inherit the
    JVM's environment, which inherits this process's at launch. When the
    fallback runtime trails Spark's protobuf gencode by a minor version
    (wire format stable across minors), protobuf's own documented escape
    hatch ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` is exported —
    only in the fallback path, never for an installed runtime.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for base in _PROTOBUF_FALLBACKS:
        if not os.path.isdir(os.path.join(base, "google", "protobuf")):
            continue
        if base not in sys.path:
            sys.path.append(base)  # append: never shadow installed packages
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            continue
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if base not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [p for p in parts if p] + [base]
            )
        return True
    return False


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


class KeyedCounterProcessor(StatefulProcessor):
    """Running per-key row count — the minimal typed-ValueState aggregate
    (event counters, rate tallies, per-entity ingest accounting). Emits
    one (key, count) row per key per batch with the post-batch total."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cnt = handle.getValueState(
            "cnt", "cnt bigint", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        for pdf in rows:
            n += len(pdf)
        if n == 0:
            return
        prev = self._cnt.get()[0] if self._cnt.exists() else 0
        total = prev + n
        self._cnt.update((total,))
        yield pd.DataFrame({"key": [key[0]], "count": [total]})

    def close(self) -> None:
        pass


def stream_keyed_counts(
    stream: DataFrame,
    key_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch running count per key on typed v2 state: one bigint
    ValueState per key (RocksDB-backed, checkpoint-recovered), TTL
    bounding unbounded key domains exactly as in
    :func:`stream_first_seen`. Output: (key, count) — the running total
    after each batch that touched the key."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        KeyedCounterProcessor(ttl_ms),
        outputStructType="key string, count bigint",
        outputMode="append",
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
