from __future__ import annotations

from datetime import datetime

import pytest

from polygon_algotrading_env_spark.operators.indicators import (
    with_bollinger,
    with_ema,
    with_returns,
    with_rsi,
    with_running_max_drawdown,
    with_sma,
)


@pytest.fixture(scope="module")
def series(spark):
    prices = [100.0, 102.0, 101.0, 105.0, 107.0, 103.0, 108.0, 110.0]
    rows = [("SPY", datetime(2024, 1, 1 + i), p, i) for i, p in enumerate(prices)]
    rows += [("TLT", datetime(2024, 1, 1 + i), 50.0 + i, i) for i in range(4)]
    return spark.createDataFrame(
        rows, "ticker string, ts timestamp_ntz, close double, seq long"
    )


def _by_key(df, col):
    return {
        (r["ticker"], r["seq"]): r[col] for r in df.collect()
    }


def test_sma(spark, series):
    out = _by_key(with_sma(series, "close", 3, ["ticker"], ["seq"]), "sma_3")
    assert out[("SPY", 0)] == 100.0
    assert abs(out[("SPY", 2)] - (100 + 102 + 101) / 3) < 1e-12
    assert abs(out[("SPY", 7)] - (103 + 108 + 110) / 3) < 1e-12
    assert out[("TLT", 3)] == 52.0


def test_returns(spark, series):
    out = _by_key(with_returns(series, "close", ["ticker"], ["seq"]), "ret")
    assert out[("SPY", 0)] is None
    assert abs(out[("SPY", 1)] - 0.02) < 1e-12


def test_drawdown(spark, series):
    out = _by_key(
        with_running_max_drawdown(series, "close", ["ticker"], ["seq"]), "drawdown"
    )
    assert out[("SPY", 5)] == 103.0 / 107.0 - 1.0
    assert out[("SPY", 7)] == 0.0


def test_bollinger_bands_bracket_sma(spark, series):
    df = with_bollinger(series, "close", 3, 2.0, ["ticker"], ["seq"])
    for r in df.filter("seq >= 2 and ticker = 'SPY'").collect():
        assert r["bb_lower"] <= r["bb_mid"] <= r["bb_upper"]


def test_rsi_bounds_and_direction(spark, series):
    out = _by_key(with_rsi(series, "close", 3, ["ticker"], ["seq"]), "rsi_3")
    vals = [v for k, v in out.items() if k[0] == "SPY" and k[1] >= 1]
    assert all(0.0 <= v <= 100.0 for v in vals)
    assert out[("TLT", 3)] == 100.0  # monotonic rise → no losses


def test_ema_matches_pandas(spark, series):
    import pandas as pd

    out = _by_key(with_ema(series, "close", 3, ["ticker"], ["seq"]), "ema_3")
    prices = [100.0, 102.0, 101.0, 105.0, 107.0, 103.0, 108.0, 110.0]
    expected = pd.Series(prices).ewm(alpha=0.5, adjust=False).mean()
    for i in range(8):
        assert abs(out[("SPY", i)] - expected[i]) < 1e-9
