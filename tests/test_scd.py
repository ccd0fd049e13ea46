"""SCD2 dimension maintenance: change/close/insert/delete semantics and
as-of reads across refresh batches."""

from datetime import datetime

import pytest

from polygon_algotrading_env_spark.operators.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_current,
    scd2_init,
)

T0, T1, T2 = (datetime(2024, 1, d, 9, 0) for d in (1, 2, 3))


def _snap(spark, rows):
    return spark.createDataFrame(rows, "ticker string, name string, market string")


def test_scd2_lifecycle(spark):
    s0 = _snap(spark, [("SPY", "SPDR", "stocks"), ("TLT", "iShares", "stocks")])
    scd = scd2_init(s0, T0)
    assert scd2_current(scd).count() == 2

    # T1: SPY renamed, TLT unchanged, IWM appears
    s1 = _snap(spark, [
        ("SPY", "SPDR Trust", "stocks"),
        ("TLT", "iShares", "stocks"),
        ("IWM", "Russell", "stocks"),
    ])
    scd = scd2_apply(scd, s1, ["ticker"], T1)
    cur = {r["ticker"]: r for r in scd2_current(scd).collect()}
    assert set(cur) == {"SPY", "TLT", "IWM"}
    assert cur["SPY"]["name"] == "SPDR Trust" and cur["SPY"]["valid_from"] == T1
    assert cur["TLT"]["valid_from"] == T0  # untouched
    closed = [r for r in scd.collect() if r["valid_to"] is not None]
    assert [(r["ticker"], r["name"], r["valid_to"]) for r in closed] == [
        ("SPY", "SPDR", T1)
    ]

    # T2: TLT delisted (absent from snapshot)
    s2 = _snap(spark, [("SPY", "SPDR Trust", "stocks"), ("IWM", "Russell", "stocks")])
    scd = scd2_apply(scd, s2, ["ticker"], T2)
    assert set(r["ticker"] for r in scd2_current(scd).collect()) == {"SPY", "IWM"}
    tlt = [r for r in scd.collect() if r["ticker"] == "TLT"]
    assert len(tlt) == 1 and tlt[0]["valid_to"] == T2

    # as-of reads reconstruct every historical state
    as_of_t0 = {(r["ticker"], r["name"]) for r in scd2_as_of(scd, T0).collect()}
    assert as_of_t0 == {("SPY", "SPDR"), ("TLT", "iShares")}
    as_of_t1 = {(r["ticker"], r["name"]) for r in scd2_as_of(scd, T1).collect()}
    assert as_of_t1 == {("SPY", "SPDR Trust"), ("TLT", "iShares"), ("IWM", "Russell")}

    # idempotence: reapplying the same snapshot changes nothing
    again = scd2_apply(scd, s2, ["ticker"], datetime(2024, 1, 4))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, scd.collect()))


def test_scd2_null_transitions_count_as_changes(spark):
    s0 = _snap(spark, [("SPY", None, "stocks")])
    scd = scd2_init(s0, T0)
    scd = scd2_apply(scd, _snap(spark, [("SPY", "named", "stocks")]), ["ticker"], T1)
    cur = scd2_current(scd).collect()
    assert len(cur) == 1 and cur[0]["name"] == "named"
    assert sum(1 for r in scd.collect() if r["valid_to"] is not None) == 1


def test_scd2_missing_columns_raise(spark):
    scd = scd2_init(_snap(spark, [("SPY", "a", "stocks")]), T0)
    bad = spark.createDataFrame([("SPY", 1.0)], "ticker string, other double")
    with pytest.raises(ValueError):
        scd2_apply(scd, bad, ["ticker"], T1)
