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


# --- stream-stream AS-OF join (the batch flagship's streaming twin) -------

_ASOF_OUT_SCHEMA = "key string, ts_ms bigint, left_v double, right_v double"


class AsofJoinProcessor(StatefulProcessor):
    """Watermark-correct backward as-of join over a union-tagged pair of
    streams: per key, every LEFT row is matched to the latest RIGHT row
    at-or-before its event time — but only EMITTED once the watermark
    passes that event time, so any right row that could still arrive
    (disorder ≤ the watermark delay) is guaranteed to have been buffered
    first. Structured Streaming has interval equi-joins but no as-of
    join; this is the missing operator, built on v2 typed state:

    - ``rights``: ListState of (ts_ms, v) — buffered right rows; once the
      watermark passes, everything older than the LATEST right ≤ watermark
      is evicted (that single row keeps LOCF alive for future lefts —
      state is O(disorder window), never O(stream)).
    - ``lefts``: ListState of (ts_ms, v) — rows awaiting the watermark.
    - an event-time TIMER at the earliest pending left wakes the key when
      the watermark passes it even if no new input arrives for the key.

    Rows with a side tag other than L/R advance the watermark without
    touching state (test harnesses use a sentinel to flush the tail).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._h = handle
        self._rights = handle.getListState("rights", "ts_ms bigint, v double")
        self._lefts = handle.getListState("lefts", "ts_ms bigint, v double")

    def _drain(self, key, wm: int):
        rights = sorted(tuple(r) for r in self._rights.get())
        lefts = sorted(tuple(r) for r in self._lefts.get())
        out, keep_lefts = [], []
        for lt, lv in lefts:
            if lt <= wm:
                rv = None
                for rt, rv_c in rights:
                    if rt <= lt:
                        rv = rv_c
                    else:
                        break
                out.append((key[0], lt, lv, rv))
            else:
                keep_lefts.append((lt, lv))
        latest_le, keep_rights = None, []
        for rt, rv_c in rights:
            if rt <= wm:
                latest_le = (rt, rv_c)
            else:
                keep_rights.append((rt, rv_c))
        if latest_le is not None:
            keep_rights = [latest_le] + keep_rights
        self._lefts.clear()
        if keep_lefts:
            self._lefts.put(keep_lefts)
        self._rights.clear()
        if keep_rights:
            self._rights.put(keep_rights)
        if keep_lefts:
            # idempotent wake-up: duplicate timers only cause extra
            # no-op drains
            self._h.registerTimer(min(t for t, _ in keep_lefts))
        return out

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            for side, ts_ms, v in zip(pdf["side"], pdf["ts_ms"], pdf["v"]):
                if side == "L":
                    self._lefts.appendValue((int(ts_ms), float(v)))
                elif side == "R":
                    self._rights.appendValue((int(ts_ms), float(v)))
        out = self._drain(key, timerValues.getCurrentWatermarkInMs())
        if out:
            yield pd.DataFrame(
                out, columns=["key", "ts_ms", "left_v", "right_v"]
            )

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        out = self._drain(key, timerValues.getCurrentWatermarkInMs())
        if out:
            yield pd.DataFrame(
                out, columns=["key", "ts_ms", "left_v", "right_v"]
            )

    def close(self) -> None:
        pass


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    delay: str = "10 seconds",
) -> DataFrame:
    """Stream-stream BACKWARD as-of join (latest right value at-or-before
    each left row's event time) — the streaming twin of
    ``operators/asof.asof_join``, which Structured Streaming's built-in
    join surface cannot express. Both inputs must carry ``key_col``, an
    event-time ``ts_col`` (timestamp) and ``value_col`` (double).

    Mechanics: the two streams union with a side tag, take ONE watermark
    of ``delay`` on the union, group by key, and run
    :class:`AsofJoinProcessor` in event-time mode — emission of a left
    row waits for the watermark to pass its timestamp, so results are
    deterministic under any cross-stream arrival disorder bounded by
    ``delay``. Output: (key, ts_ms, left_v, right_v nullable).

    Scale shape: state is one (ts,v) list per key bounded by the
    disorder window plus ONE LOCF row; keys shard across the cluster
    exactly like the batch operator's single shuffle."""
    import pyspark.sql.functions as F

    def tag(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col).alias("ts"),
            F.lit(side).alias("side"),
            F.col(value_col).cast("double").alias("v"),
        )

    union = tag(left, "L").unionByName(tag(right, "R"))
    tagged = union.withWatermark("ts", delay).withColumn(
        "ts_ms", F.unix_millis(F.col("ts"))
    )
    return tagged.groupBy("key").transformWithStateInPandas(
        AsofJoinProcessor(),
        outputStructType=_ASOF_OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


# --- streaming split/dividend-adjusted candles (the J3 gold path twin) -----

_ADJ_OUT_SCHEMA = (
    "key string, ts_ms bigint, open double, high double, low double, "
    "close double, a_prefix double"
)
_ADJ_PRICES = ("open", "high", "low", "close")


class AdjustedCandlesProcessor(StatefulProcessor):
    """Watermark-correct streaming corporate-action adjustment — the
    causal twin of ``operators/adjust.adjust_prices`` (the computation
    the reference buys with ``adjusted=true``, main.py:43-44).

    The batch operator is FORWARD-looking (a candle at t is scaled by
    the product of factors with ex_date strictly AFTER t), which no
    append-only stream can emit — later actions would retroactively
    restate history. The causal reformulation: with A(t) = product of
    factors with ex_date <= t (a prefix, so computable once the
    watermark passes t) and P = product over ALL actions,

        batch_adjusted(t) = raw(t) * P / A(t).

    This operator emits the FIRST-DAY-BASIS series raw(t) / A(t) plus
    ``a_prefix`` = A(t): dividing two emitted rows gives the correctly
    relative-adjusted return immediately, and any fixed-basis
    convention (e.g. the batch last-day basis) is one scalar multiply
    away — the stream≡batch law in tests/test_statev2.py pins exactly
    that identity. Emission of a candle waits for the shared watermark
    to pass its event time, so every action with ex_date <= t has been
    buffered first (the stream_asof_join argument).

    State per ticker: the folded prefix (done-upto, log A) as one
    ValueState, plus disorder-window-bounded ListStates of pending
    actions and candles — O(watermark delay), never O(stream).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._h = handle
        self._prefix = handle.getValueState(
            "prefix", "done_upto bigint, log_a double"
        )
        self._actions = handle.getListState(
            "actions", "ex_ms bigint, factor double"
        )
        self._candles = handle.getListState(
            "candles",
            "ts_ms bigint, open double, high double, low double, "
            "close double",
        )

    def _drain(self, key, wm: int):
        import math

        done_upto, log_a = (
            tuple(self._prefix.get()) if self._prefix.exists() else (-(1 << 62), 0.0)
        )
        actions = sorted(tuple(a) for a in self._actions.get())
        candles = sorted(tuple(c) for c in self._candles.get())
        out, keep_candles = [], []
        ai = 0
        for row in candles:
            ts = row[0]
            if ts > wm:
                keep_candles.append(row)
                continue
            while ai < len(actions) and actions[ai][0] <= ts:
                f = actions[ai][1]
                if not f > 0:
                    raise ValueError(
                        f"non-positive factor for corporate action: {f}"
                    )
                log_a += math.log(f)
                ai += 1
            a = math.exp(log_a)
            out.append(
                (key[0], ts, row[1] / a, row[2] / a, row[3] / a, row[4] / a, a)
            )
        while ai < len(actions) and actions[ai][0] <= wm:
            f = actions[ai][1]
            if not f > 0:
                raise ValueError(
                    f"non-positive factor for corporate action: {f}"
                )
            log_a += math.log(f)
            ai += 1
        self._prefix.update((max(done_upto, wm), log_a))
        self._actions.clear()
        if actions[ai:]:
            self._actions.put(actions[ai:])
        self._candles.clear()
        if keep_candles:
            self._candles.put(keep_candles)
            self._h.registerTimer(min(c[0] for c in keep_candles))
        return out

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            for r in pdf.itertuples(index=False):
                if r.side == "C":
                    self._candles.appendValue(
                        (int(r.ts_ms), float(r.open), float(r.high),
                         float(r.low), float(r.close))
                    )
                elif r.side == "A":
                    self._actions.appendValue((int(r.ts_ms), float(r.f)))
        out = self._drain(key, timerValues.getCurrentWatermarkInMs())
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "ts_ms", *_ADJ_PRICES, "a_prefix"],
            )

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        out = self._drain(key, timerValues.getCurrentWatermarkInMs())
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "ts_ms", *_ADJ_PRICES, "a_prefix"],
            )

    def close(self) -> None:
        pass


def stream_adjusted_candles(
    candles: DataFrame,
    actions: DataFrame,
    key_col: str = "ticker",
    ts_col: str = "ts",
    ex_date_col: str = "ex_date",
    factor_col: str = "factor",
    delay: str = "10 seconds",
) -> DataFrame:
    """Streaming split/dividend adjustment: union-tag the candle and
    corporate-action streams, one shared watermark of ``delay``, group
    by ticker, run :class:`AdjustedCandlesProcessor` in event-time mode.
    Output: (key, ts_ms, open/high/low/close on the FIRST-DAY basis,
    a_prefix) — see the processor docstring for the exact batch law.

    Scale shape: identical sharding to the batch plan's single candle
    shuffle; per-key state is the disorder window plus one folded
    (done_upto, log A) pair."""
    import pyspark.sql.functions as F

    c = candles.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.lit("C").alias("side"),
        F.lit(None).cast("double").alias("f"),
        F.col("open").cast("double"),
        F.col("high").cast("double"),
        F.col("low").cast("double"),
        F.col("close").cast("double"),
    )
    a = actions.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ex_date_col).alias("ts"),
        F.lit("A").alias("side"),
        F.col(factor_col).cast("double").alias("f"),
        *[F.lit(None).cast("double").alias(p) for p in _ADJ_PRICES],
    )
    union = c.unionByName(a)
    tagged = union.withWatermark("ts", delay).withColumn(
        "ts_ms", F.unix_millis(F.col("ts"))
    )
    return tagged.groupBy("key").transformWithStateInPandas(
        AdjustedCandlesProcessor(),
        outputStructType=_ADJ_OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
