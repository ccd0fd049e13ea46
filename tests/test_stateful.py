from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest

from polygon_algotrading_env_spark.streaming.stateful import stream_running_stats

TICK_SCHEMA = "ticker string, ts timestamp, price double, size double"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pae_spark_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, src, ckpt, name):
    stream = spark.readStream.schema(TICK_SCHEMA).parquet(src)
    q = (
        stream_running_stats(stream, evict_idle=False)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["ticker"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_running_stats_accumulate_per_symbol(spark, tmpdir):
    rows = [
        ("SPY", datetime(2024, 1, 1, 10, 0, 0), 100.0, 10.0),
        ("SPY", datetime(2024, 1, 1, 10, 0, 2), 110.0, 30.0),
        ("TLT", datetime(2024, 1, 1, 10, 0, 1), 50.0, 5.0),
    ]
    spark.createDataFrame(rows, TICK_SCHEMA).coalesce(1).write.parquet(f"{tmpdir}/src")
    got = _run(spark, f"{tmpdir}/src", f"{tmpdir}/ckpt", "tape1")
    spy = got["SPY"]
    assert spy["n"] == 2
    assert abs(spy["mean_price"] - 105.0) < 1e-12
    assert abs(spy["vwap"] - (100 * 10 + 110 * 30) / 40.0) < 1e-12
    assert spy["last_price"] == 110.0 and spy["high"] == 110.0 and spy["low"] == 100.0
    assert got["TLT"]["n"] == 1


def test_running_stats_state_survives_restart(spark, tmpdir):
    src = f"{tmpdir}/src"
    # Memory sink can't recover from a checkpoint; foreachBatch can — it's
    # also the production sink shape for pushing tape updates onward.
    collected: list = []

    def _run_fb(name):
        stream = spark.readStream.schema(TICK_SCHEMA).parquet(src)
        q = (
            stream_running_stats(stream, evict_idle=False)
            .writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("SPY", datetime(2024, 1, 1, 10, 0, 0), 100.0, 1.0)], TICK_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run_fb("a")
    assert [r["n"] for r in collected if r["ticker"] == "SPY"] == [1]

    collected.clear()
    spark.createDataFrame(
        [("SPY", datetime(2024, 1, 1, 10, 5, 0), 120.0, 1.0),
         ("SPY", datetime(2024, 1, 1, 10, 4, 0), 80.0, 1.0)], TICK_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run_fb("b")
    spy = [r for r in collected if r["ticker"] == "SPY"][-1]
    assert spy["n"] == 3                      # state restored from checkpoint
    assert spy["last_price"] == 120.0         # latest-ts wins, not batch order
    assert spy["low"] == 80.0 and spy["high"] == 120.0
