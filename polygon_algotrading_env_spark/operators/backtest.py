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

Sizing note (hot keys): per-key window sorts are NOT split by AQE (that
applies to sort-merge joins), so one symbol's whole bar history is sorted
by one task. Bars are ~5 orders of magnitude sparser than ticks (a decade
of 5-minute bars for one symbol ≈ 5·10⁵ rows ≈ tens of MB), so a single
per-symbol task is comfortably sized even at 100 TB of source ticks; only
if backtesting on raw ticks per key would time-chunking (as in
``asof.asof_join_chunked``) be needed.

Float discipline (cross-engine reproducibility): SMAs are
round(sum, 4)/count — stabilized sum, then exact IEEE divide; bar returns
are a single divide of exact 2-decimal doubles; P&L is position × return,
one exact product per row.  No float is ever summed across rows, so every
output column is bit-identical in any engine (DuckDB-oracle checked).
"""

from __future__ import annotations

from collections.abc import Sequence

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


def extract_trades(
    bt: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "bucket_start",
    price_col: str = "close",
) -> DataFrame:
    """Round-trip trades from the per-bar position series: consecutive
    position=1 runs (gaps-and-islands — island id = running count of
    position changes) collapse to one row with entry/exit bar, duration,
    and the trade return from exact entry/exit prices.

    Same single partition-by-key shuffle as the backtest itself; the
    grouped reduction piggybacks on that partitioning.
    """
    ordered = Window.partitionBy(key_col).orderBy(ts_col)
    changed = (
        F.col("position") != F.coalesce(F.lag("position").over(ordered), F.lit(0))
    ).cast("int")
    islands = bt.withColumn("__island", F.sum(changed).over(ordered))
    return (
        islands.filter(F.col("position") == 1)
        .groupBy(key_col, "__island")
        .agg(
            F.min(ts_col).alias("entry_ts"),
            F.max(ts_col).alias("exit_ts"),
            F.count(F.lit(1)).alias("n_bars"),
            F.min_by(price_col, F.col(ts_col)).alias("entry_price"),
            F.max_by(price_col, F.col(ts_col)).alias("exit_price"),
        )
        .withColumn(
            "trade_return", F.col("exit_price") / F.col("entry_price") - 1
        )
        .drop("__island")
    )


def equity_curve(
    bt: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "bucket_start",
) -> DataFrame:
    """Running P&L and drawdown per key via ordered-window prefix sums.

    Unlike the per-bar columns, these ARE float accumulations, and
    engines order the adds differently (DuckDB's windowed sum uses a
    segment tree; Spark a running buffer), leaving ~1e-13 ulp noise —
    consumers comparing across engines should round (the declared query
    rounds to 6 decimals, far above the noise, and ratio-valued data
    never sits on the rounding grid)."""
    ordered = Window.partitionBy(key_col).orderBy(ts_col)
    run = ordered.rowsBetween(Window.unboundedPreceding, 0)
    return (
        bt.select(key_col, ts_col, "pnl")
        .withColumn("cum_pnl", F.sum("pnl").over(run))
        .withColumn("drawdown", F.max("cum_pnl").over(run) - F.col("cum_pnl"))
    )


def triple_barrier_labels(
    bars: DataFrame,
    horizon: int = 12,
    profit_take: float = 0.02,
    stop_loss: float = 0.02,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "bucket_start",
    price_col: str = "close",
) -> DataFrame:
    """Triple-barrier labels (López de Prado): each bar looks at the NEXT
    ``horizon`` closes and is labeled by the first barrier hit — +1 if
    the profit-take level (entry·(1+pt)) is touched first, −1 if the
    stop-loss (entry·(1−sl)) is touched first, 0 if neither inside the
    horizon (the time barrier) — the path-aware supervised target that
    fixed-horizon returns mislabel (a +2% move that drew down 5% first
    is NOT a win).

    The forward path is ONE window frame (ROWS 1..horizon FOLLOWING →
    collect_list) and the first-touch scan is JVM-side array algebra
    (zip_with index, filter, array_min) — no self-join of the bar
    relation against its own future, which at 100 TB would re-shuffle
    the facts horizon times; rows without a full forward window are
    dropped (labels near the end of history are undefined, not zero).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(1, horizon)
    )
    fwd = F.collect_list(price_col).over(w)
    df = bars.select(
        *keys,
        ts_col,
        F.col(price_col).alias("entry"),
        fwd.alias("fwd"),
    ).where(F.size("fwd") == horizon)
    idx = F.sequence(F.lit(1), F.lit(horizon))
    up = F.col("entry") * (1.0 + profit_take)
    dn = F.col("entry") * (1.0 - stop_loss)
    first_hit = lambda cond: F.array_min(
        F.filter(
            F.zip_with(F.col("fwd"), idx, lambda p, i: F.when(cond(p), i)),
            lambda x: x.isNotNull(),
        )
    )
    lab = df.withColumn("hit_up", first_hit(lambda p: p >= up)).withColumn(
        "hit_dn", first_hit(lambda p: p <= dn)
    )
    label = (
        F.when(
            F.col("hit_up").isNotNull()
            & (F.col("hit_dn").isNull() | (F.col("hit_up") < F.col("hit_dn"))),
            1,
        )
        .when(F.col("hit_dn").isNotNull(), -1)
        .otherwise(0)
    )
    return lab.select(
        *keys,
        ts_col,
        F.round("entry", 4).alias("entry"),
        label.cast("int").alias("label"),
        F.least(F.col("hit_up"), F.col("hit_dn")).alias("bars_to_hit"),
    )


def _ordinal_series(
    series: DataFrame,
    value_col: str,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """(keys, __v, __i): the series with 0-based per-key ordinals."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(order_col)
    return series.select(
        *keys,
        F.col(value_col).alias("__v"),
        (F.row_number().over(w) - 1).alias("__i"),
    )


def _bootstrap_positions(
    idx: DataFrame,
    keys: Sequence[str],
    n_resamples: int,
    block_len: int,
    seed_tag: str,
) -> DataFrame:
    """Circular-block resample membership (keys, __r, __i): block start
    offsets come from md5 uniforms of (key, resample, block) — the repo's
    reproducible-randomness idiom — so membership is identical on any
    engine, run, or partitioning (no RNG, no seed plumbing)."""
    counts = idx.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    n_blocks = F.ceil(F.col("__n") / block_len).cast("int")
    spine = (
        counts.select(
            *keys,
            "__n",
            F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("__r"),
        )
        .select(
            *keys,
            "__n",
            "__r",
            F.explode(F.sequence(F.lit(0), n_blocks - 1)).alias("__b"),
        )
    )
    key_str = F.concat_ws(
        "|", *[F.col(k).cast("string") for k in keys],
        F.col("__r").cast("string"), F.col("__b").cast("string"),
        F.lit(seed_tag),
    )
    u = (
        F.conv(F.substring(F.md5(key_str), 1, 12), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))
    starts = spine.select(
        *keys, "__n", "__r", "__b",
        F.floor(u * F.col("__n")).cast("long").alias("__start"),
    )
    # each block contributes block_len wrapped positions
    return starts.select(
        *keys, "__n", "__r",
        F.explode(F.sequence(F.lit(0), F.lit(block_len - 1))).alias("__o"),
        "__start",
    ).select(
        *keys, "__r",
        ((F.col("__start") + F.col("__o")) % F.col("__n")).alias("__i"),
    )


def block_bootstrap_sharpe_int(
    series: DataFrame,
    int_value_col: str,
    keys: Sequence[str],
    order_col: str,
    n_resamples: int = 100,
    block_len: int = 20,
    seed_tag: str = "bb",
) -> DataFrame:
    """Circular-block-bootstrap Sharpe CI over an EXACT INTEGER series —
    the cross-engine-certifiable variant of :func:`block_bootstrap_stat`.

    ``int_value_col`` must already be integer-valued (e.g. P&L quantized
    to a micro-unit grid: ``CAST(round(pnl * 1e6) AS BIGINT)`` — Sharpe
    is scale-invariant, so the unit cancels). Each resample then reduces
    to exact DECIMAL(38,0) moments (m, s1 = Σv, s2 = Σv²) and its Sharpe
    is the fixed scalar double recipe

        sr = (s1/m) / sqrt((m·s2 − s1²) / (m·(m−1)))

    evaluated from identical integers on any engine — no float
    accumulation order anywhere — so the [2.5%, 97.5%] CI endpoints
    (exact-percentile interpolation over the ≤ n_resamples doubles) are
    hash-comparable with a DuckDB oracle replaying the same md5 block
    membership in SQL. Degenerate resamples (zero variance) yield NULL
    and are excluded from n_resamples, as in the float variant."""
    idx = _ordinal_series(series, int_value_col, keys, order_col)
    joined = _bootstrap_positions(
        idx, keys, n_resamples, block_len, seed_tag
    ).join(idx, [*keys, "__i"])
    vd = F.col("__v").cast("decimal(38,0)")

    def _sharpe(df: DataFrame, group: list) -> DataFrame:
        agg = df.groupBy(*group).agg(
            F.count(F.lit(1)).alias("__m"),
            F.sum(vd).alias("__s1"),
            F.sum(vd * vd).alias("__s2"),
        )
        d = (
            F.col("__m").cast("decimal(38,0)") * F.col("__s2")
            - F.col("__s1") * F.col("__s1")
        )
        sr = F.when(d == 0, F.lit(None).cast("double")).otherwise(
            (F.col("__s1").cast("double") / F.col("__m"))
            / F.sqrt(
                d.cast("double")
                / (F.col("__m").cast("double") * (F.col("__m") - 1))
            )
        )
        return agg.select(*group, sr.alias("__sr"))

    per_resample = _sharpe(joined, [*keys, "__r"])
    point = _sharpe(idx, list(keys)).withColumnRenamed(
        "__sr", "sharpe_point"
    )
    ci = per_resample.groupBy(*keys).agg(
        F.expr("percentile(__sr, 0.025)").alias("ci_lo"),
        F.expr("percentile(__sr, 0.975)").alias("ci_hi"),
        F.count("__sr").alias("n_resamples"),
    )
    return point.join(ci, list(keys))


def block_bootstrap_stat(
    series: DataFrame,
    value_col: str,
    keys: Sequence[str],
    order_col: str,
    n_resamples: int = 200,
    block_len: int = 20,
    seed_tag: str = "bb",
) -> DataFrame:
    """Circular block bootstrap of the per-bar Sharpe — distribution-free
    confidence intervals for serially-correlated P&L, where iid
    resampling understates the variance (blocks preserve the local
    autocorrelation structure).

    Deterministic by construction: block start offsets come from md5
    uniforms of (key, resample, block) — the repo's reproducible-
    randomness idiom — so resample MEMBERSHIP is identical on any engine,
    run, or partitioning (no RNG, no seed plumbing); the CI endpoints are
    then stable to float-accumulation order (~1e-15 relative), the same
    reorder noise any parallel aggregate carries. The plan is pure
    DataFrame algebra: a resample×block spine (tiny — n_resamples ×
    ceil(n/block_len) rows per key) equi-joins the series on the wrapped
    ordinal (one shuffle of the series per bootstrap pass, NOT per
    resample), then two aggregations reduce to per-resample Sharpe and
    per-key quantiles. Output: point estimate + [2.5%, 97.5%] CI.
    """
    idx = _ordinal_series(series, value_col, keys, order_col)
    joined = _bootstrap_positions(
        idx, keys, n_resamples, block_len, seed_tag
    ).join(idx, [*keys, "__i"])
    # nullif-guard the Sharpe denominators: a constant (or single-row)
    # series has exactly-zero sample stddev, which must yield NULL — not
    # an ANSI divide-by-zero error, and not +-inf under non-ANSI.
    per_resample = joined.groupBy(*keys, "__r").agg(
        (F.avg("__v") / F.nullif(F.stddev_samp("__v"), F.lit(0.0))).alias("__sr")
    )
    point = series.groupBy(*keys).agg(
        (
            F.avg(value_col) / F.nullif(F.stddev_samp(value_col), F.lit(0.0))
        ).alias("sharpe_point")
    )
    # n_resamples counts NON-NULL __sr only: a degenerate resample (zero
    # sample stddev, or a single-row key) yields NULL __sr, which
    # percentile() drops — the reported CI must not claim more resamples
    # than it was computed over.
    ci = per_resample.groupBy(*keys).agg(
        F.expr("percentile(__sr, 0.025)").alias("ci_lo"),
        F.expr("percentile(__sr, 0.975)").alias("ci_hi"),
        F.count("__sr").alias("n_resamples"),
    )
    return point.join(ci, list(keys))
