"""Incremental materialized bar view (operators/incremental.py):
delta-only refresh must equal a full recompute from the snapshot."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest

from polygon_algotrading_env_spark.operators.bars import ohlcv_bars
from polygon_algotrading_env_spark.operators.incremental import (
    read_bar_view,
    refresh_bar_view,
    view_last_version,
)
from polygon_algotrading_env_spark.sources.versioned import VersionedTable

TICKS = "ticker string, ts timestamp, price double, size double"


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="pae_spark_incr_")
    yield f"{d}/table", f"{d}/view"
    shutil.rmtree(d, ignore_errors=True)


def _t(m, s=0):
    return datetime(2024, 1, 1, 10, m, s)


def _ticks(spark, rows):
    return spark.createDataFrame(rows, TICKS)


def _full(spark, table):
    return ohlcv_bars(
        table.read(), "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    )


def _canon(df):
    return sorted(
        (r["ticker"], r["bucket_start"], r["open"], r["high"], r["low"],
         r["close"], r["volume"], r["n_trades"])
        for r in df.collect()
    )


def test_incremental_refresh_equals_full_rebuild(spark, dirs):
    troot, vroot = dirs
    table = VersionedTable(spark, troot)
    table.write(_ticks(spark, [
        ("SPY", _t(0), 100.0, 1.0),
        ("SPY", _t(1), 105.0, 2.0),
        ("TLT", _t(0), 50.0, 1.0),
    ]))
    n = refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    )
    assert n == 2 and view_last_version(vroot) == 0

    # Batch 2: late tick into the EXISTING bucket (new low + new close)
    # plus a brand-new bucket.
    table.write(_ticks(spark, [
        ("SPY", _t(2), 95.0, 1.0),
        ("SPY", _t(7), 110.0, 1.0),
    ]), mode="append")
    n2 = refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    )
    assert n2 == 3 and view_last_version(vroot) == 1
    assert _canon(read_bar_view(spark, vroot)) == _canon(_full(spark, table))
    spy0 = [r for r in read_bar_view(spark, vroot).collect()
            if r["ticker"] == "SPY" and r["bucket_start"] == _t(0)][0]
    assert (spy0["open"], spy0["low"], spy0["close"]) == (100.0, 95.0, 95.0)

    # Already current -> no-op.
    assert refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    ) is None


def test_non_append_commit_forces_rebuild(spark, dirs):
    troot, vroot = dirs
    table = VersionedTable(spark, troot)
    table.write(_ticks(spark, [("SPY", _t(0), 100.0, 1.0)]))
    refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    )
    table.delete_where("price > 1000.0")  # non-append commit
    with pytest.raises(ValueError):
        refresh_bar_view(
            spark, table, vroot, "ts", "price", "5 minutes",
            keys=("ticker",), volume_col="size",
        )
    # Documented recovery: drop the view, full-build branch takes over.
    shutil.rmtree(vroot)
    n = refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    )
    assert n == 1 and _canon(read_bar_view(spark, vroot)) == _canon(_full(spark, table))


def test_engine_facade_refresh_and_read(spark, dirs):
    from polygon_algotrading_env_spark.engine import Engine

    troot, vroot = dirs
    eng = Engine(spark)
    table = eng.versioned_table(troot)
    table.write(_ticks(spark, [("SPY", _t(0), 100.0, 1.0)]))
    n = eng.refresh_view(
        table, vroot, ts_col="ts", price_col="price", duration="5 minutes",
        keys=("ticker",), volume_col="size",
    )
    assert n == 1 and eng.read_view(vroot).count() == 1


def test_refresh_kill_between_delta_write_and_stamp_no_double_merge(
    spark, dirs, monkeypatch
):
    """K8 soak (r8 VERDICT item 8): kill the refresh AFTER the merged
    delta is written to the tmp dir but BEFORE the version stamp lands,
    then restart. The stamp lives inside tmp and the tmp->data rename is
    the commit point, so the interrupted attempt must be invisible: the
    restarted refresh re-merges the SAME delta exactly once and equals a
    full rebuild (a double-merge would double volume/n_trades)."""
    import polygon_algotrading_env_spark.operators.incremental as incr

    troot, vroot = dirs
    table = VersionedTable(spark, troot)
    table.write(_ticks(spark, [
        ("SPY", _t(0), 100.0, 1.0),
        ("SPY", _t(1), 105.0, 2.0),
        ("TLT", _t(0), 50.0, 1.0),
    ]))
    assert refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    ) is not None
    v1 = view_last_version(vroot)
    # delta touches an existing bucket (same 5-min window) AND a new one
    table.write(_ticks(spark, [
        ("SPY", _t(2), 110.0, 4.0),
        ("SPY", _t(7), 120.0, 8.0),
    ]), mode="append")

    real_dump = incr.json.dump
    calls = {"n": 0}

    def poisoned_dump(obj, fh, **kw):
        calls["n"] += 1
        raise RuntimeError("injected kill before version stamp")

    monkeypatch.setattr(incr.json, "dump", poisoned_dump)
    with pytest.raises(RuntimeError, match="injected kill"):
        refresh_bar_view(
            spark, table, vroot, "ts", "price", "5 minutes",
            keys=("ticker",), volume_col="size",
        )
    assert calls["n"] == 1
    monkeypatch.setattr(incr.json, "dump", real_dump)

    # the kill left the orphan tmp dir and an UNMOVED view: the stamp
    # still says v1, so the delta is not yet applied anywhere visible
    assert view_last_version(vroot) == v1
    import os
    assert os.path.exists(os.path.join(vroot, "data.__tmp"))

    # restart: the same delta merges exactly once
    assert refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    ) is not None
    assert view_last_version(vroot) == table.latest_version()
    assert _canon(read_bar_view(spark, vroot)) == _canon(_full(spark, table))
    # idempotent when current
    assert refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    ) is None


def test_refresh_kill_between_swap_renames_recovers_by_rebuild(
    spark, dirs, monkeypatch
):
    """Kill in the narrowest window — after data/ moved aside, before
    tmp/ moved in — leaves NO live view directory. The restarted refresh
    must take the full-build branch (stamp unreadable -> last=None) and
    converge to the same bars as a full rebuild, never resurrect the
    half-swapped state."""
    import os

    import polygon_algotrading_env_spark.operators.incremental as incr

    troot, vroot = dirs
    table = VersionedTable(spark, troot)
    table.write(_ticks(spark, [
        ("SPY", _t(0), 100.0, 1.0),
        ("TLT", _t(0), 50.0, 1.0),
    ]))
    assert refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    ) is not None
    table.write(_ticks(spark, [("SPY", _t(6), 111.0, 3.0)]), mode="append")

    real_rename = os.rename
    state = {"armed": False}

    def poisoned_rename(src, dst):
        # first rename of the swap (data -> data.__old) succeeds, the
        # second (tmp -> data) is the kill point
        if src.endswith("data") and dst.endswith("data.__old"):
            real_rename(src, dst)
            state["armed"] = True
            return
        if state["armed"] and dst.endswith("data"):
            raise RuntimeError("injected kill between swap renames")
        real_rename(src, dst)

    monkeypatch.setattr(incr.os, "rename", poisoned_rename)
    with pytest.raises(RuntimeError, match="between swap renames"):
        refresh_bar_view(
            spark, table, vroot, "ts", "price", "5 minutes",
            keys=("ticker",), volume_col="size",
        )
    monkeypatch.setattr(incr.os, "rename", real_rename)

    # no live view dir -> stamp unreadable -> restart takes full build
    assert view_last_version(vroot) is None
    assert refresh_bar_view(
        spark, table, vroot, "ts", "price", "5 minutes",
        keys=("ticker",), volume_col="size",
    ) is not None
    assert view_last_version(vroot) == table.latest_version()
    assert _canon(read_bar_view(spark, vroot)) == _canon(_full(spark, table))
