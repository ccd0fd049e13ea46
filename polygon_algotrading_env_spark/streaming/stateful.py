"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10/§2.11 — the escape hatch for semantics windowed
aggregation can't express).

``stream_running_stats`` keeps one state blob per symbol: running count,
Σp, Σp·v, Σv, last price/ts, session high/low — i.e. the live "tape
summary" a trading UI reads per symbol, updated per micro-batch and
emitted once per key per batch. State is per-key and O(1) bytes, sharded
by the group key exactly as on a cluster; a GroupStateTimeout evicts
symbols that stop trading.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (count, sum_p, sum_pv, sum_v, last_ts_epoch_us, last_price, high, low)
_STATE_SCHEMA = (
    "n bigint, sum_p double, sum_pv double, sum_v double, "
    "last_ts long, last_price double, high double, low double"
)
_OUTPUT_SCHEMA = (
    "ticker string, n bigint, mean_price double, vwap double, "
    "last_price double, high double, low double"
)


def _make_update(evict_idle_ms: int | None):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        # (the trailing yield makes this a generator on every path)
        if state.hasTimedOut:
            state.remove()
            return
        n, sum_p, sum_pv, sum_v = 0, 0.0, 0.0, 0.0
        last_ts, last_price = -1, float("nan")
        high, low = float("-inf"), float("inf")
        if state.exists:
            n, sum_p, sum_pv, sum_v, last_ts, last_price, high, low = state.get

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            sum_p += float(pdf["price"].sum())
            sum_pv += float((pdf["price"] * pdf["size"]).sum())
            sum_v += float(pdf["size"].sum())
            high = max(high, float(pdf["price"].max()))
            low = min(low, float(pdf["price"].min()))
            ts_us = pdf["ts"].astype("int64") // 1000
            idx = int(ts_us.idxmax())
            if int(ts_us.loc[idx]) > last_ts:
                last_ts = int(ts_us.loc[idx])
                last_price = float(pdf["price"].loc[idx])

        state.update((n, sum_p, sum_pv, sum_v, last_ts, last_price, high, low))
        if evict_idle_ms is not None:
            state.setTimeoutDuration(evict_idle_ms)
        yield _emit(key, n, sum_p, sum_pv, sum_v, last_price, high, low)

    return _update


def _emit(key, n, sum_p, sum_pv, sum_v, last_price, high, low):
    return pd.DataFrame(
        {
            "ticker": [key[0]],
            "n": [n],
            "mean_price": [sum_p / n if n else None],
            "vwap": [sum_pv / sum_v if sum_v else None],
            "last_price": [last_price],
            "high": [high],
            "low": [low],
        }
    )


_EVICT_IDLE_MS = 60 * 60 * 1000  # drop state for symbols idle > 1 h


def stream_running_stats(
    stream: DataFrame, key_col: str = "ticker", evict_idle: bool = True
) -> DataFrame:
    """Per-symbol running tape summary over a stream with columns
    (ticker, ts timestamp, price double, size double).

    Emits one updated row per active symbol per micro-batch (output mode:
    update). ``evict_idle`` arms a 1-hour processing-time timeout that
    drops state for symbols that stop trading — right for a long-lived
    live query; pass False for availableNow catch-up runs (an armed
    processing-time timeout keeps the query scheduling batches, so
    drain-and-stop runs don't terminate promptly).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        _make_update(_EVICT_IDLE_MS if evict_idle else None),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM: per-key drift alarms with O(1) state
# ---------------------------------------------------------------------------

_CUSUM_STATE_SCHEMA = "s double, last_ts long"
_CUSUM_OUTPUT_SCHEMA = (
    "symbol string, ts timestamp, cusum double, alarm boolean"
)


def stream_cusum(
    stream: DataFrame,
    threshold: float,
    key_col: str = "symbol",
    ts_col: str = "ts",
    dev_col: str = "a",
) -> DataFrame:
    """Streaming one-sided CUSUM per key: S ← max(0, S + a) with alarm at
    S > threshold, carried as ONE double of state per key — the live
    counterpart of the batch ``cusum_alarms_5m`` prefix-sum identity
    (same recursion, same alarms; equivalence is pinned in tests).

    ``dev_col`` is the pre-standardized deviation (z − k), produced
    upstream — e.g. a stream-static join against a per-key (μ, σ) model
    table — so the operator composes with any drift model without
    owning it. Rows within a micro-batch are applied in ``ts_col`` order;
    rows at or before the last applied timestamp are DROPPED (the
    cross-batch monotonicity guard: a sequential statistic cannot absorb
    late data retroactively — route late rows to the batch path instead).
    Emits every row with its post-update statistic (append semantics per
    input row, not one row per key per batch).
    """

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        s, last_ts = 0.0, -(1 << 62)
        if state.exists:
            s, last_ts = state.get
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col)
            ts_us = pdf[ts_col].astype("int64") // 1000
            for t, a in zip(ts_us.tolist(), pdf[dev_col].tolist()):
                if t <= last_ts:
                    continue
                last_ts = t
                s = s + float(a)
                if s < 0.0:
                    s = 0.0
                out.append((key[0], t, s, s > threshold))
        state.update((s, last_ts))
        if out:
            yield pd.DataFrame(
                {
                    "symbol": [r[0] for r in out],
                    "ts": pd.to_datetime([r[1] for r in out], unit="us"),
                    "cusum": [r[2] for r in out],
                    "alarm": [r[3] for r in out],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=_CUSUM_OUTPUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
