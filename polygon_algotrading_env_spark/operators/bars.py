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
from pyspark.sql import Column, DataFrame, Window


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


def fill_bar_gaps(
    bars: DataFrame,
    step: str,
    keys: Sequence[str] = (),
    bucket_col: str = "bucket_start",
    close_col: str = "close",
    volume_col: str = "volume",
    count_col: str = "n_trades",
    method: str = "locf",
) -> DataFrame:
    """Densify a bar series onto the regular ``step`` grid: every missing
    bucket between a key's first and last bar becomes a synthetic bar
    (volume 0, n_trades 0, ``filled`` = true) whose prices come from
    ``method``:

    - ``'locf'``: last observed close carried forward (O=H=L=C) — the
      market convention (price IS the last trade until a new one);
    - ``'interpolate'``: linear interpolation between the surrounding
      real closes, weighted by TIME (not row position, so consecutive
      gaps interpolate correctly): prev + (next − prev)·(t − t_prev)/
      (t_next − t_prev). The time-series imputation convention for
      feature pipelines. Interior gaps only by construction — the grid
      spans first..last real bar, so both neighbors always exist.

    Indicators and resamples assume a dense grid; on thinly-traded
    symbols the raw series isn't.

    Plan: per-key (min, max) bucket — a tiny aggregate — explodes into
    the full grid via ``sequence()`` (rows ∝ time-range/step per key, not
    data), left-joins the real bars on (key, bucket), then one or two
    window passes per key fill closes — all windows share the single
    per-key shuffle. Same shape as the as-of join; no driver-side
    calendar.
    """
    if method not in ("locf", "interpolate"):
        raise ValueError(f"unknown fill method: {method!r}")
    kcols = [F.col(k) for k in keys]
    grid = (
        bars.groupBy(*kcols)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}")
                )
            ).alias(bucket_col),
        )
    )
    joined = grid.join(bars, [*keys, bucket_col], "left_outer")
    w = (
        Window.partitionBy(*kcols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The flag must bind to the PRE-fill close: withColumn rebinding is
    # positional in the plan, so compute it before any coalesce.
    out = joined.withColumn("filled", F.col(close_col).isNull()).withColumn(
        "__locf", F.last(F.col(close_col), ignorenulls=True).over(w)
    )
    if method == "interpolate":
        wf = (
            Window.partitionBy(*kcols)
            .orderBy(bucket_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        real_t = F.when(
            F.col(close_col).isNotNull(), F.col(bucket_col)
        )
        out = (
            out.withColumn(
                "__pt", F.last(real_t, ignorenulls=True).over(w)
            )
            .withColumn("__nv", F.first(F.col(close_col), ignorenulls=True).over(wf))
            .withColumn("__nt", F.first(real_t, ignorenulls=True).over(wf))
            .withColumn(
                "__fill",
                F.col("__locf")
                + (F.col("__nv") - F.col("__locf"))
                # timestampdiff works for TIMESTAMP and TIMESTAMP_NTZ
                # alike; try_divide because real rows have __pt == __nt
                # (their weight is unused — coalesce takes the real value)
                * F.expr(
                    f"try_divide("
                    f"CAST(timestampdiff(SECOND, __pt, {bucket_col}) AS DOUBLE),"
                    f"timestampdiff(SECOND, __pt, __nt))"
                ),
            )
            .drop("__pt", "__nv", "__nt")
        )
    else:
        out = out.withColumn("__fill", F.col("__locf"))
    for c in ("open", "high", "low", close_col):
        if c in bars.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col("__fill")))
    out = out.drop("__fill")
    # Zero-fill with a zero CAST to each column's existing type so the
    # output schema matches the input (an integer n_trades must not widen
    # to double — downstream unions/appends against the pre-fill schema
    # would fail or silently drift).
    dtypes = dict(bars.dtypes)
    for c in (volume_col, count_col):
        if c in bars.columns:
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.lit(0).cast(dtypes[c]))
            )
    return out.drop("__locf")


def threshold_bars(
    df: DataFrame,
    measure_col: str,
    threshold: float,
    keys: Sequence[str],
    ts_col: str = "ts",
    price_col: str = "value",
    order_col: str | None = None,
    bar_col: str = "bar_id",
) -> DataFrame:
    """Information-driven bar sampling (volume / dollar bars): cut a new
    bar every time the running MEASURE (shares, notional, tick count…)
    crosses ``threshold``, instead of every N wall-clock minutes — the
    López-de-Prado alternative sampling that equalizes information per
    bar (time bars oversample quiet periods and undersample bursts).

    bar_id = floor(pre-tick cumulative measure / threshold): a tick joins
    the bar that was open when it arrived. A single tick larger than the
    threshold swallows several multiples at once, so bar ids may SKIP and
    the bar after an overshooting tick can come in under the threshold —
    information-driven bars equalize measure only up to the granularity
    of individual ticks (the standard caveat); ids remain strictly
    increasing in time and measure is conserved. The cumulative sum is
    ONE ordered window per key — sequential evaluation makes the float
    prefix sums identical in any engine that orders the same way — and
    the OHLC reduction groups on (key, bar_id) like any time bar. Emits
    start/end as epoch-millis bigints (cross-engine timestamp-safe).

    open/close tie-break on the EXACT total order (the raw order_col, or
    ts_col at full timestamp precision) — never on the millisecond
    rendering, which would make sub-ms tick order nondeterministic.
    """
    ord_expr = F.col(order_col) if order_col else F.col(ts_col)
    w = Window.partitionBy(*keys).orderBy(ord_expr).rowsBetween(
        Window.unboundedPreceding, 0
    )
    m = F.col(measure_col)
    pre = F.sum(m).over(w) - m
    bar = F.floor(pre / F.lit(threshold)).alias(bar_col)
    # Exact integer DIV, never a double round-trip: epoch nanos exceed
    # 2^53, so float division can land on the wrong millisecond.
    # unix_millis (not unix_timestamp*1000) keeps sub-second precision.
    ms = (
        F.expr(f"{order_col} DIV 1000000")
        if order_col
        else F.unix_millis(F.col(ts_col).cast("timestamp"))
    )
    ticked = df.select(
        *keys,
        bar,
        F.col(price_col).alias("__p"),
        m.alias("__m"),
        ms.alias("__ms"),
        ord_expr.alias("__ord"),
    )
    return ticked.groupBy(*keys, bar_col).agg(
        F.min_by("__p", "__ord").alias("open"),
        F.max("__p").alias("high"),
        F.min("__p").alias("low"),
        F.max_by("__p", "__ord").alias("close"),
        F.sum("__m").alias("measure"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.min("__ms").alias("start_ms"),
        F.max("__ms").alias("end_ms"),
    )
