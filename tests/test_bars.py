from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from polygon_algotrading_env_spark.operators.bars import ohlcv_bars, resample_bars


@pytest.fixture(scope="module")
def ticks(spark):
    # One symbol, 2 hours of 1-minute ticks with a deterministic price walk,
    # plus a second sparse symbol (empty buckets must simply not appear).
    rows = []
    for i in range(120):
        ts = datetime(2024, 1, 1, 9 + i // 60, i % 60, 17)
        rows.append(("SPY", ts, 100.0 + (i * 7 % 13) - 6, 10.0 + i % 3, i))
    rows.append(("TLT", datetime(2024, 1, 1, 9, 59, 59), 50.0, 1.0, 1000))
    return spark.createDataFrame(
        rows, "ticker string, ts timestamp_ntz, price double, size double, seq long"
    )


def test_bar_semantics_single_bucket(spark):
    rows = [
        ("X", datetime(2024, 1, 1, 10, 0, 5), 10.0, 2.0, 1),
        ("X", datetime(2024, 1, 1, 10, 2, 0), 15.0, 1.0, 2),
        ("X", datetime(2024, 1, 1, 10, 4, 59), 12.0, 3.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "ticker string, ts timestamp_ntz, price double, size double, seq long"
    )
    bars = ohlcv_bars(
        df, "ts", "price", "5 minutes", keys=("ticker",),
        volume_col="size", order_col="seq",
    ).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b["open"], b["high"], b["low"], b["close"]) == (10.0, 15.0, 10.0, 12.0)
    assert b["volume"] == 6.0
    assert b["n_trades"] == 3
    # vwap = (10*2 + 15*1 + 12*3) / 6
    assert abs(b["vwap"] - (20 + 15 + 36) / 6.0) < 1e-12
    assert b["bucket_start"] == datetime(2024, 1, 1, 10, 0, 0)


def test_duplicate_timestamp_tiebreak(spark):
    rows = [
        ("X", datetime(2024, 1, 1, 10, 0, 5), 10.0, 1.0, 2),
        ("X", datetime(2024, 1, 1, 10, 0, 5), 11.0, 1.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "ticker string, ts timestamp_ntz, price double, size double, seq long"
    )
    b = ohlcv_bars(
        df, "ts", "price", "5 minutes", keys=("ticker",),
        volume_col="size", order_col="seq",
    ).collect()[0]
    assert b["open"] == 11.0 and b["close"] == 10.0  # seq decides, not ts


def test_resample_ladder_consistency(spark, ticks):
    """resample(1m→5m→1h) ≡ direct 1h aggregation (SURVEY §5 property)."""
    one_m = ohlcv_bars(
        ticks, "ts", "price", "1 minute", keys=("ticker",),
        volume_col="size", order_col="seq",
    )
    via_5m = resample_bars(
        resample_bars(one_m, "5 minutes", keys=("ticker",)),
        "1 hour",
        keys=("ticker",),
    )
    direct = ohlcv_bars(
        ticks, "ts", "price", "1 hour", keys=("ticker",),
        volume_col="size", order_col="seq",
    )
    cols = ["ticker", "bucket_start", "open", "high", "low", "close", "volume",
            "n_trades"]
    a = {tuple(r[c] for c in cols) for r in via_5m.collect()}
    b = {tuple(r[c] for c in cols) for r in direct.collect()}
    assert a == b


def test_sparse_symbol_has_no_empty_buckets(spark, ticks):
    bars = ohlcv_bars(
        ticks, "ts", "price", "5 minutes", keys=("ticker",),
        volume_col="size", order_col="seq",
    )
    tlt = bars.filter(F.col("ticker") == "TLT").collect()
    assert len(tlt) == 1 and tlt[0]["n_trades"] == 1


def test_fill_bar_gaps_dense_grid_and_roundtrip(spark):
    from datetime import datetime

    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.bars import fill_bar_gaps

    rows = [
        ("A", datetime(2024, 1, 1, 10, 0), 10.0, 10.0, 10.0, 10.0, 5.0, 1),
        # 10:05 and 10:10 missing
        ("A", datetime(2024, 1, 1, 10, 15), 12.0, 12.0, 12.0, 12.0, 3.0, 1),
        ("B", datetime(2024, 1, 1, 10, 5), 50.0, 50.0, 50.0, 50.0, 1.0, 1),
    ]
    bars = spark.createDataFrame(
        rows,
        "event_type string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume double, n_trades long",
    )
    dense = fill_bar_gaps(bars, "5 minutes", keys=("event_type",))
    a = {r["bucket_start"]: r for r in dense.where("event_type='A'").collect()}
    assert len(a) == 4  # 10:00..10:15 every 5 minutes
    gap = a[datetime(2024, 1, 1, 10, 5)]
    assert gap["filled"] and gap["volume"] == 0.0 and gap["n_trades"] == 0
    assert gap["open"] == gap["close"] == 10.0  # LOCF from 10:00
    assert not a[datetime(2024, 1, 1, 10, 15)]["filled"]
    # single-bar key: no synthetic rows
    assert dense.where("event_type='B'").count() == 1
    # dropping synthetic rows recovers the input exactly
    back = dense.where(~F.col("filled")).drop("filled")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, bars.collect()))
    # the fill must not widen column types: integer n_trades stays long,
    # so the filled relation unions/appends cleanly against pre-fill bars
    assert dict(back.dtypes) == dict(bars.dtypes)


def test_fill_bar_gaps_interpolate(spark):
    from datetime import datetime

    import pytest as _pytest

    from polygon_algotrading_env_spark.operators.bars import fill_bar_gaps

    rows = [
        ("A", datetime(2024, 1, 1, 10, 0), 10.0, 10.0, 10.0, 10.0, 5.0, 1),
        # 10:05 and 10:10 missing -> time-linear: 12.0, 14.0
        ("A", datetime(2024, 1, 1, 10, 15), 16.0, 16.0, 16.0, 16.0, 3.0, 1),
    ]
    bars = spark.createDataFrame(
        rows,
        "event_type string, bucket_start timestamp, open double, high double,"
        " low double, close double, volume double, n_trades long",
    )
    dense = fill_bar_gaps(
        bars, "5 minutes", keys=("event_type",), method="interpolate"
    )
    a = {r["bucket_start"]: r for r in dense.collect()}
    assert len(a) == 4
    g1, g2 = a[datetime(2024, 1, 1, 10, 5)], a[datetime(2024, 1, 1, 10, 10)]
    assert g1["filled"] and g2["filled"]
    assert abs(g1["close"] - 12.0) < 1e-12 and abs(g2["close"] - 14.0) < 1e-12
    assert g1["open"] == g1["high"] == g1["low"] == g1["close"]
    assert g1["volume"] == 0.0 and g1["n_trades"] == 0
    # real rows untouched
    assert a[datetime(2024, 1, 1, 10, 0)]["close"] == 10.0
    assert a[datetime(2024, 1, 1, 10, 15)]["close"] == 16.0
    with _pytest.raises(ValueError, match="fill method"):
        fill_bar_gaps(bars, "5 minutes", keys=("event_type",), method="spline")


def test_threshold_bars_sub_ms_tick_order(spark):
    """Two ticks INSIDE the same millisecond: open/close must follow the
    exact nano order (order_col), never its millisecond rendering — the
    sub-ms regime is the norm for real tick data (r4 ADVICE repro:
    10.0-then-20.0 within one ms must give open=10, close=20)."""
    from polygon_algotrading_env_spark.operators.bars import threshold_bars

    base_ns = 1_704_103_200_000_000_000  # 2024-01-01 10:00:00 UTC in nanos
    rows = [
        ("X", datetime(2024, 1, 1, 10, 0, 0), base_ns + 100, 10.0),
        ("X", datetime(2024, 1, 1, 10, 0, 0), base_ns + 900, 20.0),
        ("X", datetime(2024, 1, 1, 10, 0, 0), base_ns + 500, 15.0),
    ]
    df = spark.createDataFrame(
        rows, "sym string, ts timestamp_ntz, ts_ns long, value double"
    )
    b = threshold_bars(
        df, measure_col="value", threshold=1000.0, keys=("sym",),
        ts_col="ts", price_col="value", order_col="ts_ns",
    ).collect()
    assert len(b) == 1
    assert b[0]["open"] == 10.0 and b[0]["close"] == 20.0
    assert b[0]["start_ms"] == b[0]["end_ms"] == base_ns // 1_000_000


def test_threshold_bars_default_order_subsecond(spark):
    """order_col=None path: sub-second timestamps must still order
    open/close correctly AND start/end_ms must carry sub-second millis
    (unix_millis, not unix_timestamp*1000 which truncates to seconds)."""
    from datetime import timedelta

    from polygon_algotrading_env_spark.operators.bars import threshold_bars

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("X", t0 + timedelta(milliseconds=250), 10.0),
        ("X", t0 + timedelta(milliseconds=750), 20.0),
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, value double")
    b = threshold_bars(
        df, measure_col="value", threshold=1000.0, keys=("sym",),
        ts_col="ts", price_col="value",
    ).collect()
    assert len(b) == 1
    assert b[0]["open"] == 10.0 and b[0]["close"] == 20.0
    assert b[0]["end_ms"] - b[0]["start_ms"] == 500
