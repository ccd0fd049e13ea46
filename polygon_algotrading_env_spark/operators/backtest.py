"""Vectorized backtesting over bar series — the north-star batch use case.

The reference stores candles so a strategy can be tested against them
(`README.md:4-8`: "extraction and storage of technical indicators" for an
algotrading environment); it contains no backtest engine.  Here the whole
signal → position → P&L loop is window expressions over the bar table —
no per-row Python, no driver loop, so a 100 TB tick history backtests as
one shuffle per (symbol) partition key.

Lookahead discipline: the position held during bar t is the signal of bar
t-1 (``lag``) — the standard next-bar execution convention; computing
P&L from same-bar signals is the classic backtest bug this operator makes
unrepresentable.

Float discipline (cross-engine reproducibility): SMAs are
round(sum, 4)/count — stabilized sum, then exact IEEE divide; bar returns
are a single divide of exact 2-decimal doubles; P&L is position × return,
one exact product per row.  No float is ever summed across rows, so every
output column is bit-identical in any engine (DuckDB-oracle checked).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sma_crossover_backtest(
    bars: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "bucket_start",
    price_col: str = "close",
    fast: int = 5,
    slow: int = 20,
) -> DataFrame:
    """Long/flat SMA-crossover strategy over (key, ts, price) bars.

    Emits per-bar: the two SMAs (partial frames at series start, same in
    every engine), the crossover ``signal``, the lagged ``position``
    actually held, the bar return, and per-bar ``pnl``.  Aggregate equity
    curves are a downstream (deliberately separate) reduction.
    """
    ordered = Window.partitionBy(key_col).orderBy(ts_col)
    f_fast = ordered.rowsBetween(-(fast - 1), 0)
    f_slow = ordered.rowsBetween(-(slow - 1), 0)
    sma_fast = F.round(F.sum(price_col).over(f_fast), 4) / F.count(
        F.lit(1)
    ).over(f_fast)
    sma_slow = F.round(F.sum(price_col).over(f_slow), 4) / F.count(
        F.lit(1)
    ).over(f_slow)
    prev_price = F.lag(price_col).over(ordered)
    with_signal = bars.select(
        key_col,
        ts_col,
        price_col,
        sma_fast.alias("sma_fast"),
        sma_slow.alias("sma_slow"),
        prev_price.alias("__prev"),
    ).withColumn(
        "signal",
        (F.col("sma_fast") > F.col("sma_slow")).cast("int"),
    )
    position = F.coalesce(F.lag("signal").over(ordered), F.lit(0))
    ret = F.when(
        F.col("__prev").isNull() | (F.col("__prev") == 0), F.lit(0.0)
    ).otherwise(F.col(price_col) / F.col("__prev") - 1)
    return (
        with_signal.withColumn("position", position.cast("int"))
        .withColumn("bar_return", ret)
        .withColumn("pnl", F.col("position") * F.col("bar_return"))
        .drop("__prev")
    )
