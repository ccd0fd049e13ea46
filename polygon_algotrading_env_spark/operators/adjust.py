"""Split/dividend price adjustment — natively owning Polygon's
``adjusted=true`` semantics (SURVEY.md §2.5 J3).

The reference fetches both adjusted and raw series as separate API runs
(``polygon-etl-container/src/main.py:43-44``,
``v2022/etl-containers/aggregates/src/aggregates_etl.py:79-85``); the
adjustment itself happens server-side. Semantics: a candle at time t is
multiplied by the product of adjustment factors of all corporate actions
with ex_date strictly AFTER t:

- split ``split_from:split_to`` → price factor ``split_from / split_to``
  (a 2-for-1 split halves earlier prices);
- cash dividend D with previous close P → factor ``(P - D) / P``
  (simplified CRSP-style; we take the caller-provided factor column).

Scale-first plan (no per-candle × per-action row explosion):

1. per ticker, sort actions DESCENDING by ex_date and take a running
   cumulative product — ``exp(sum(log(factor)))`` over an
   unbounded-preceding frame — giving each action the total factor for all
   actions at-or-after its ex_date (suffix product);
2. as-of join (forward, strict) each candle to the earliest action with
   ex_date > t, inheriting that suffix product;
3. candles with no later action get factor 1.0.

Cost: one tiny window over the actions dim + one as-of join (single
shuffle of candles). The actions table is dimension-sized (<20 MB in the
reference, ``README.md:20``), so the union feeding the as-of window is
dominated by the candle side — equivalent to one sort-merge pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from polygon_algotrading_env_spark.operators.asof import asof_join


def suffix_factors(
    actions: DataFrame,
    key: str = "ticker",
    ex_date_col: str = "ex_date",
    factor_col: str = "factor",
) -> DataFrame:
    """Per action row, the cumulative product of factors of all actions
    at-or-after its ex_date (within key).

    Computed as exp(sum(log)) — a running product as a window aggregate.
    Zero/negative factors are corrupt input (a split ratio is strictly
    positive): log() would turn them into NULLs that sum() silently skips,
    so they fail loudly via ``raise_error`` instead. The exp/log round
    trip costs ≤1 ulp per step; adjusted prices are consumed at fixed
    decimal precision, so this never surfaces — and bad data beats a
    bit-exact product of garbage.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ex_date_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = F.col(factor_col)
    checked = F.when(
        f > 0, f
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"non-positive {factor_col} for corporate action: "),
                f.cast("string"),
            )
        )
    )
    return actions.select(
        key,
        ex_date_col,
        F.exp(F.sum(F.log(checked)).over(w)).alias("suffix_factor"),
    )


def adjust_prices(
    candles: DataFrame,
    actions: DataFrame,
    key: str = "ticker",
    ts_col: str = "ts",
    ex_date_col: str = "ex_date",
    factor_col: str = "factor",
    price_cols: tuple[str, ...] = ("open", "high", "low", "close"),
) -> DataFrame:
    """Return candles with each price column replaced by its adjusted value
    (raw values preserved under ``<col>_raw``) plus the applied
    ``adj_factor``.

    ``adjusted ≡ raw`` when the actions table is empty (property-tested),
    mirroring the reference's dual adjusted/raw runs.
    """
    sf = suffix_factors(actions, key=key, ex_date_col=ex_date_col, factor_col=factor_col)
    joined = asof_join(
        candles,
        sf,
        on=key,
        left_ts=ts_col,
        right_ts=ex_date_col,
        direction="forward",
        allow_exact_matches=False,
        tie_break=None,
    )
    out = joined.withColumn(
        "adj_factor", F.coalesce(F.col("suffix_factor"), F.lit(1.0))
    ).drop("suffix_factor", ex_date_col)
    for c in price_cols:
        out = out.withColumn(c + "_raw", F.col(c)).withColumn(
            c, F.col(c) * F.col("adj_factor")
        )
    return out


def prefix_factors(
    actions: DataFrame,
    key: str = "ticker",
    ex_date_col: str = "ex_date",
    factor_col: str = "factor",
) -> DataFrame:
    """Per action row, the cumulative product of factors of all actions
    at-or-BEFORE its ex_date (within key) — the causal mirror of
    :func:`suffix_factors`, and the quantity a stream can maintain:
    A(t) = product{ex_date <= t} only ever grows forward in time."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ex_date_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = F.col(factor_col)
    checked = F.when(f > 0, f).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"non-positive {factor_col} for corporate action: "),
                f.cast("string"),
            )
        )
    )
    return actions.select(
        key,
        ex_date_col,
        F.exp(F.sum(F.log(checked)).over(w)).alias("prefix_factor"),
    )


def adjust_prices_firstday(
    candles: DataFrame,
    actions: DataFrame,
    key: str = "ticker",
    ts_col: str = "ts",
    ex_date_col: str = "ex_date",
    factor_col: str = "factor",
    price_cols: tuple[str, ...] = ("open", "high", "low", "close"),
) -> DataFrame:
    """FIRST-DAY-BASIS adjustment: each price divided by A(t), the
    prefix product of factors with ex_date at-or-before t. Related to
    :func:`adjust_prices` (last-day basis) by one per-key scalar:

        adjust_prices price == firstday price * product(ALL factors)

    — the identity the streaming twin
    (streaming/statev2.stream_adjusted_candles) emits under, since A(t)
    is causal where the batch suffix product is forward-looking. Output
    keeps raw prices under ``<col>_raw`` plus the applied ``a_prefix``
    (1.0 before the first action). Same plan cost as adjust_prices: one
    window over the actions dim + one backward as-of join."""
    pf = prefix_factors(
        actions, key=key, ex_date_col=ex_date_col, factor_col=factor_col
    )
    joined = asof_join(
        candles,
        pf,
        on=key,
        left_ts=ts_col,
        right_ts=ex_date_col,
        direction="backward",
        allow_exact_matches=True,
        tie_break=None,
    )
    out = joined.withColumn(
        "a_prefix", F.coalesce(F.col("prefix_factor"), F.lit(1.0))
    ).drop("prefix_factor", ex_date_col)
    for c in price_cols:
        out = out.withColumn(c + "_raw", F.col(c)).withColumn(
            c, F.col(c) / F.col("a_prefix")
        )
    return out
