from __future__ import annotations

from datetime import datetime

import pytest

from polygon_algotrading_env_spark.operators.adjust import adjust_prices, suffix_factors


@pytest.fixture(scope="module")
def candles(spark):
    rows = [
        ("AAPL", datetime(2020, 1, 1), 100.0, 101.0, 99.0, 100.0),
        ("AAPL", datetime(2020, 6, 1), 400.0, 404.0, 396.0, 400.0),
        ("AAPL", datetime(2021, 1, 1), 130.0, 131.0, 129.0, 130.0),
        ("MSFT", datetime(2020, 6, 1), 200.0, 202.0, 198.0, 200.0),
    ]
    return spark.createDataFrame(
        rows, "ticker string, ts timestamp_ntz, open double, high double, "
        "low double, close double"
    )


@pytest.fixture(scope="module")
def splits(spark):
    # AAPL 4:1 on 2020-08-31 → factor 1/4 applied to earlier prices.
    # A later hypothetical 2:1 on 2020-12-15 compounds on pre-split candles.
    rows = [
        ("AAPL", datetime(2020, 8, 31), 0.25),
        ("AAPL", datetime(2020, 12, 15), 0.5),
    ]
    return spark.createDataFrame(rows, "ticker string, ex_date timestamp_ntz, factor double")


def test_suffix_factors(spark, splits):
    sf = {
        (r["ticker"], r["ex_date"]): r["suffix_factor"]
        for r in suffix_factors(splits).collect()
    }
    assert abs(sf[("AAPL", datetime(2020, 12, 15))] - 0.5) < 1e-12
    assert abs(sf[("AAPL", datetime(2020, 8, 31))] - 0.125) < 1e-12


def test_adjustment_compounds(spark, candles, splits):
    out = {
        (r["ticker"], r["ts"]): (r["close"], r["adj_factor"], r["close_raw"])
        for r in adjust_prices(candles, splits).collect()
    }
    # Both candles before 2020-08-31 get 0.25 * 0.5 = 0.125.
    assert abs(out[("AAPL", datetime(2020, 1, 1))][0] - 12.5) < 1e-9
    assert abs(out[("AAPL", datetime(2020, 6, 1))][0] - 50.0) < 1e-9
    # Candle after all splits is unadjusted.
    assert out[("AAPL", datetime(2021, 1, 1))][0] == 130.0
    # Other tickers untouched.
    assert out[("MSFT", datetime(2020, 6, 1))][0] == 200.0
    # Raw preserved.
    assert out[("AAPL", datetime(2020, 1, 1))][2] == 100.0


def test_adjusted_equals_raw_when_no_actions(spark, candles):
    empty = spark.createDataFrame(
        [], "ticker string, ex_date timestamp_ntz, factor double"
    )
    out = adjust_prices(candles, empty).collect()
    assert all(r["adj_factor"] == 1.0 for r in out)
    assert all(r["close"] == r["close_raw"] for r in out)


def test_nonpositive_factor_raises(spark):
    import pytest

    from polygon_algotrading_env_spark.operators.adjust import suffix_factors

    bad = spark.createDataFrame(
        [("A", "2024-01-02", 0.0), ("A", "2024-03-05", 2.0)],
        "ticker string, ex_date string, factor double",
    )
    with pytest.raises(Exception, match="non-positive factor"):
        suffix_factors(bad).collect()


def test_firstday_basis_law(spark, candles, splits):
    """adjust_prices (last-day basis, forward-looking) and
    adjust_prices_firstday (causal prefix basis — what the streaming
    twin emits) differ by exactly one per-ticker scalar: the product of
    ALL that ticker's action factors. Also pins the exact-tie boundary
    (a candle ON an ex_date belongs to the prefix, i.e. is excluded
    from the suffix) via the 2020-06-01 candles."""
    import math

    from polygon_algotrading_env_spark.operators.adjust import (
        adjust_prices_firstday,
    )

    totals = {"AAPL": 0.25 * 0.5, "MSFT": 1.0}
    last = {
        (r["ticker"], r["ts"]): r
        for r in adjust_prices(candles, splits).collect()
    }
    first = {
        (r["ticker"], r["ts"]): r
        for r in adjust_prices_firstday(candles, splits).collect()
    }
    assert last.keys() == first.keys() and len(last) == 4
    for k, f in first.items():
        b = last[k]
        for col in ("open", "high", "low", "close"):
            assert math.isclose(
                f[col] * totals[k[0]], b[col], rel_tol=1e-12
            ), (k, col)
            assert f[col + "_raw"] == b[col + "_raw"]
        assert math.isclose(
            f["a_prefix"] * b["adj_factor"], totals[k[0]], rel_tol=1e-12
        ), k


def test_firstday_exact_tie_is_prefix(spark):
    """allow_exact_matches=True on the prefix side: a candle timestamped
    exactly at an ex_date is divided by that action's factor (the
    strict-after suffix excludes it — the two conventions must
    partition every action exactly once)."""
    from datetime import datetime as dt

    from polygon_algotrading_env_spark.operators.adjust import (
        adjust_prices_firstday,
    )

    candles = spark.createDataFrame(
        [("A", dt(2020, 8, 31), 10.0, 10.0, 10.0, 10.0)],
        "ticker string, ts timestamp_ntz, open double, high double, "
        "low double, close double",
    )
    splits = spark.createDataFrame(
        [("A", dt(2020, 8, 31), 0.5)],
        "ticker string, ex_date timestamp_ntz, factor double",
    )
    (row,) = adjust_prices_firstday(candles, splits).collect()
    assert abs(row["a_prefix"] - 0.5) < 1e-12
    assert abs(row["close"] - 20.0) < 1e-9
