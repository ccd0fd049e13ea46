"""SMA-crossover backtest — operators/backtest.py."""

from __future__ import annotations

from polygon_algotrading_env_spark.operators.backtest import sma_crossover_backtest


def test_positions_lag_signals_and_pnl_matches(spark):
    # price rises then falls; fast=2, slow=3 makes crossovers easy to hand-check
    prices = [10.0, 11.0, 12.0, 13.0, 12.0, 11.0, 10.0, 9.0]
    bars = spark.createDataFrame(
        [("X", float(i), p) for i, p in enumerate(prices)],
        "event_type string, bucket_start double, close double",
    )
    out = sorted(
        sma_crossover_backtest(bars, fast=2, slow=3).collect(),
        key=lambda r: r.bucket_start,
    )
    for i, r in enumerate(out):
        # next-bar execution: position t == signal t-1, flat at the start
        assert r.position == (out[i - 1].signal if i > 0 else 0)
        expected_ret = 0.0 if i == 0 else prices[i] / prices[i - 1] - 1
        assert abs(r.bar_return - expected_ret) < 1e-12
        assert abs(r.pnl - r.position * expected_ret) < 1e-12
    # partial frames make fast == slow until the slow frame outgrows the
    # fast one (bar 2); the downtrend flips the signal off at bar 5
    assert [r.signal for r in out] == [0, 0, 1, 1, 1, 0, 0, 0]
    # the strategy is long only on the bars after a long signal
    assert [r.position for r in out] == [0, 0, 0, 1, 1, 1, 0, 0]


def test_flat_strategy_never_earns(spark):
    bars = spark.createDataFrame(
        [("Y", float(i), 5.0) for i in range(10)],
        "event_type string, bucket_start double, close double",
    )
    rows = sma_crossover_backtest(bars).collect()
    assert all(r.signal == 0 and r.position == 0 and r.pnl == 0.0 for r in rows)


def test_extract_trades_islands(spark):
    from polygon_algotrading_env_spark.operators.backtest import extract_trades

    # two long runs separated by a flat bar: bars 1-2 and 4-5
    rows = [
        ("Z", 0.0, 10.0, 0), ("Z", 1.0, 11.0, 1), ("Z", 2.0, 12.0, 1),
        ("Z", 3.0, 11.0, 0), ("Z", 4.0, 12.0, 1), ("Z", 5.0, 13.0, 1),
    ]
    bt = spark.createDataFrame(
        rows, "event_type string, bucket_start double, close double, position int"
    )
    trades = sorted(extract_trades(bt).collect(), key=lambda r: r.entry_ts)
    assert len(trades) == 2
    t1, t2 = trades
    assert (t1.entry_ts, t1.exit_ts, t1.n_bars) == (1.0, 2.0, 2)
    assert abs(t1.trade_return - (12.0 / 11.0 - 1)) < 1e-12
    assert (t2.entry_ts, t2.exit_ts, t2.n_bars) == (4.0, 5.0, 2)


def test_equity_curve_cum_and_drawdown(spark):
    from polygon_algotrading_env_spark.operators.backtest import equity_curve

    rows = [("W", 0.0, 0.0, 0.1), ("W", 1.0, 0.0, -0.05), ("W", 2.0, 0.0, 0.02)]
    bt = spark.createDataFrame(
        rows, "event_type string, bucket_start double, close double, pnl double"
    )
    out = sorted(equity_curve(bt).collect(), key=lambda r: r.bucket_start)
    assert [round(r.cum_pnl, 10) for r in out] == [0.1, 0.05, 0.07]
    assert [round(r.drawdown, 10) for r in out] == [0.0, 0.05, 0.03]


def test_triple_barrier_all_three_classes(spark):
    from datetime import datetime, timedelta

    from polygon_algotrading_env_spark.operators.backtest import (
        triple_barrier_labels,
    )

    t0 = datetime(2024, 1, 1)
    # symbol U: rises 1%/bar → +1 at bar 2 (2% barrier); D: falls → −1;
    # F: flat → time barrier 0 with bars_to_hit NULL.
    rows = []
    for i in range(10):
        rows.append(("U", t0 + timedelta(minutes=5 * i), 100.0 * (1.01 ** i)))
        rows.append(("D", t0 + timedelta(minutes=5 * i), 100.0 * (0.99 ** i)))
        rows.append(("F", t0 + timedelta(minutes=5 * i), 100.0))
    df = spark.createDataFrame(
        rows, "event_type string, bucket_start timestamp, close double"
    )
    out = triple_barrier_labels(
        df, horizon=4, profit_take=0.02, stop_loss=0.02
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["event_type"], []).append(r)
    # only bars with a FULL 4-bar forward window survive: 10 − 4 = 6 rows
    assert all(len(v) == 6 for v in by.values())
    assert all(r["label"] == 1 for r in by["U"])
    assert all(r["label"] == -1 for r in by["D"])
    assert all(r["label"] == 0 and r["bars_to_hit"] is None for r in by["F"])
    # 1.01^2 ≈ 1.0201 crosses the 2% barrier at the SECOND forward bar
    assert all(r["bars_to_hit"] == 2 for r in by["U"])


def test_block_bootstrap_deterministic_and_sane(spark):
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.backtest import (
        block_bootstrap_stat,
    )

    # AR-ish deterministic series with positive mean
    rows = [
        ("X", i, 0.05 + 0.3 * ((i * 2654435761) % 97 / 97.0 - 0.5))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "sym string, t int, pnl double")
    out1 = block_bootstrap_stat(
        df, "pnl", keys=("sym",), order_col="t", n_resamples=50, block_len=10
    ).collect()[0]
    assert out1["n_resamples"] == 50
    assert out1["ci_lo"] <= out1["sharpe_point"] <= out1["ci_hi"]
    assert out1["ci_lo"] < out1["ci_hi"]
    # determinism across physical layouts
    out2 = block_bootstrap_stat(
        df.repartition(7), "pnl", keys=("sym",), order_col="t",
        n_resamples=50, block_len=10,
    ).collect()[0]
    assert abs(out1["ci_lo"] - out2["ci_lo"]) < 1e-12
    assert abs(out1["ci_hi"] - out2["ci_hi"]) < 1e-12


def test_block_bootstrap_degenerate_resamples_not_overcounted(spark):
    """A key whose values are constant yields NULL __sr (zero stddev) for
    every resample; percentile() drops NULLs, so n_resamples must count
    the non-null statistics actually aggregated — 0 here — rather than
    the requested resample count (r4 ADVICE)."""
    from polygon_algotrading_env_spark.operators.backtest import (
        block_bootstrap_stat,
    )

    rows = [("FLAT", i, 1.0) for i in range(40)] + [
        ("VAR", i, float((i * 7) % 5 - 2)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "sym string, t long, pnl double")
    out = {
        r["sym"]: r
        for r in block_bootstrap_stat(
            df, "pnl", keys=("sym",), order_col="t",
            n_resamples=20, block_len=8,
        ).collect()
    }
    assert out["FLAT"]["n_resamples"] == 0
    assert out["FLAT"]["ci_lo"] is None and out["FLAT"]["ci_hi"] is None
    assert out["VAR"]["n_resamples"] == 20
    assert out["VAR"]["ci_lo"] <= out["VAR"]["ci_hi"]


def test_grid_backtest_exact_integer_reference(spark):
    """grid_backtest_sma_pairs_5m vs a pure-Python replay of the exact
    integer semantics (cents prefix sums, cross-multiplied signals,
    lagged positions) on the real sf0.001 fixture."""
    from polygon_algotrading_env_spark.queries.timeseries import (
        _GRID_PAIRS,
        grid_backtest_sma_pairs_5m,
    )

    out = {
        (r["event_type"], r["fast"], r["slow"]): r
        for r in grid_backtest_sma_pairs_5m(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # rebuild the bar closes exactly as the query does
    from polygon_algotrading_env_spark.catalog import load_table
    from polygon_algotrading_env_spark.operators.bars import ohlcv_bars

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    bars = (
        ohlcv_bars(
            ev, ts_col="ts", price_col="value", duration="5 minutes",
            keys=("event_type",), volume_col="value", order_col="ts_ns",
        )
        .select("event_type", "bucket_start", "close")
        .toPandas()
        .sort_values(["event_type", "bucket_start"])
    )
    for etype, grp in bars.groupby("event_type"):
        c = [int(round(v * 100)) for v in grp["close"]]
        cum = [0]
        for v in c:
            cum.append(cum[-1] + v)
        # cum[r] = sum of first r closes (1-based row r)
        for f, s in _GRID_PAIRS:
            n_bars = n_long = n_trades = pnl = pnl2 = 0
            # peak is over OBSERVED equity (no pre-series 0 baseline)
            equity, runmax, maxdd = 0, None, 0
            for r in range(s + 2, len(c) + 1):
                sig = (cum[r] - cum[r - f]) * s > (cum[r] - cum[r - s]) * f
                sigp = (cum[r - 1] - cum[r - 1 - f]) * s > (
                    cum[r - 1] - cum[r - 1 - s]
                ) * f
                n_bars += 1
                n_long += sigp
                n_trades += abs(int(sig) - int(sigp))
                step = int(sigp) * (c[r - 1] - c[r - 2])
                pnl += step
                pnl2 += step * step
                equity += step
                runmax = equity if runmax is None else max(runmax, equity)
                maxdd = max(maxdd, runmax - equity)
            row = out[(etype, f, s)]
            assert row["n_bars"] == n_bars
            assert row["n_long"] == n_long
            assert row["n_trades"] == n_trades, (etype, f, s)
            assert row["pnl_cents"] == pnl
            assert row["pnl2_cents"] == pnl2
            assert row["maxdd_cents"] == maxdd
            if n_trades:
                assert row["pnl_per_trade"] == round(pnl / n_trades, 6)
