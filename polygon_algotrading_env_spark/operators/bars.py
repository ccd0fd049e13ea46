"""OHLCV bar aggregation — the computation the reference pays Polygon to do.

The reference requests candles at (multiplier × timespan) resolutions —
1 min (``polygon-etl-container/src/aggregates_stocks_etl.py:18-19``), 5 min
(``airflow-dags/dag_aggregates_etl.py:219-220``), and v0's ladder
1/5/15/30 min, 1 h, 24 h (``old_source/old_source_op.py:18``) — with
open=first, high=max, low=min, close=last, volume=sum, vwap=Σ(p·v)/Σv,
n=count per (ticker, bucket). SURVEY.md §2.4 A7/A8, §2.6 W3.

Spark-first: a tumbling ``window()`` + hash aggregate. first/last are
expressed as ``min_by``/``max_by`` on an explicit total-order column (never
``first()``/``last()`` in an aggregation, which are order-nondeterministic
in a distributed engine). Partial aggregation (map-side combine) means each
input partition is reduced before the single shuffle; the shuffle key
(group keys × bucket) is fine-grained enough that hot tickers spread across
many buckets, and AQE handles residual skew.

``resample_bars`` re-aggregates coarse bars from fine bars (1 m → 5 m → 1 h
→ 1 d) without touching raw ticks again — associative by construction:
open=open-of-earliest, close=close-of-latest, high=max(high), low=min(low),
volume=sum, n=sum, vwap re-derived from the carried Σ(p·v) notional.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def ohlcv_bars(
    df: DataFrame,
    ts_col: str,
    price_col: str,
    duration: str,
    keys: Sequence[str] = (),
    volume_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Aggregate tick/trade rows into OHLCV bars of ``duration``.

    order_col: total-order column breaking ties between rows with equal
    timestamps (e.g. exact nanos, or a sequence number); defaults to ts_col.
    """
    order = F.col(order_col or ts_col)
    vol = F.col(volume_col) if volume_col else F.lit(1.0)
    price = F.col(price_col)

    bucket = F.window(F.col(ts_col), duration)
    grouped = df.groupBy(*[F.col(k) for k in keys], bucket.alias("__w"))
    out = grouped.agg(
        F.min_by(price, order).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, order).alias("close"),
        F.sum(vol).alias("volume"),
        F.sum(price * vol).alias("notional"),
        F.count(F.lit(1)).alias("n_trades"),
        F.min(order).alias("__open_ord"),
        F.max(order).alias("__close_ord"),
    )
    return out.select(
        *keys,
        F.col("__w.start").alias("bucket_start"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        # try_divide: a zero-volume bucket yields NULL vwap instead of an
        # ANSI divide-by-zero runtime error (ANSI is on by default in 4.x).
        F.try_divide(F.col("notional"), F.col("volume")).alias("vwap"),
        "notional",
        "n_trades",
        F.col("__open_ord").alias("open_ord"),
        F.col("__close_ord").alias("close_ord"),
    )


def resample_bars(
    bars: DataFrame,
    duration: str,
    keys: Sequence[str] = (),
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Re-aggregate finer bars into coarser ``duration`` bars.

    Requires the ``notional``/``open_ord``/``close_ord`` bookkeeping columns
    produced by :func:`ohlcv_bars`, which make the rollup associative
    (property: resample(1m→5m→1h) ≡ resample(1m→1h); see tests).
    """
    bucket = F.window(F.col(bucket_col), duration)
    grouped = bars.groupBy(*[F.col(k) for k in keys], bucket.alias("__w"))
    out = grouped.agg(
        F.min_by("open", F.col("open_ord")).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("close_ord")).alias("close"),
        F.sum("volume").alias("volume"),
        F.sum("notional").alias("notional"),
        F.sum("n_trades").alias("n_trades"),
        F.min("open_ord").alias("__open_ord"),
        F.max("close_ord").alias("__close_ord"),
    )
    return out.select(
        *keys,
        F.col("__w.start").alias("bucket_start"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        F.try_divide(F.col("notional"), F.col("volume")).alias("vwap"),
        "notional",
        "n_trades",
        F.col("__open_ord").alias("open_ord"),
        F.col("__close_ord").alias("close_ord"),
    )
