"""transformWithState v2 dedup: first-seen emission, cross-batch
suppression through a checkpoint restart. Executes for real when a
protobuf runtime is importable or discoverable (ensure_protobuf_runtime
ran at conftest import, before the JVM started, so executor workers
inherit the PYTHONPATH); the RocksDB state-store provider is set per-test
because transformWithState needs multi-column-family state."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest

from polygon_algotrading_env_spark.streaming.statev2 import (
    ROCKSDB_PROVIDER,
    ensure_protobuf_runtime,
    stream_first_seen,
)

TICK_SCHEMA = "ticker string, ts timestamp, price double, size double"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pae_spark_twsv2_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain(spark, src, ckpt, collected):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = spark.readStream.schema(TICK_SCHEMA).parquet(src)
        q = (
            stream_first_seen(stream, ["ticker", "ts"])
            .writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_construction_is_protobuf_free(spark, tmpdir):
    """Plan construction (the part users compose) needs no protobuf:
    schema passthrough, str-or-list grouping keys, streaming flag kept."""
    src = f"{tmpdir}/src"
    spark.createDataFrame(
        [("SPY", datetime(2024, 1, 1), 1.0, 1.0)], TICK_SCHEMA
    ).write.parquet(src)
    stream = spark.readStream.schema(TICK_SCHEMA).parquet(src)
    out = stream_first_seen(stream, "ticker")
    assert out.isStreaming and out.schema == stream.schema
    out2 = stream_first_seen(stream, ["ticker", "ts"], ttl_ms=60_000)
    assert out2.schema == stream.schema


@pytest.mark.skipif(
    not ensure_protobuf_runtime(),
    reason="no google.protobuf runtime installed or discoverable",
)
def test_first_seen_dedups_within_and_across_batches(spark, tmpdir):
    src, ckpt = f"{tmpdir}/src", f"{tmpdir}/ckpt"
    t0 = datetime(2024, 1, 1, 10, 0, 0)
    t1 = datetime(2024, 1, 1, 10, 1, 0)
    collected: list = []

    # Batch 1: duplicate (SPY, t0) within the batch + one TLT row.
    spark.createDataFrame(
        [("SPY", t0, 100.0, 1.0), ("SPY", t0, 100.0, 1.0), ("TLT", t0, 50.0, 2.0)],
        TICK_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, collected)
    assert sorted((r["ticker"], r["ts"]) for r in collected) == [
        ("SPY", t0),
        ("TLT", t0),
    ]

    # Batch 2 (fresh run, same checkpoint): replayed (SPY, t0) suppressed
    # by recovered state; new (SPY, t1) passes.
    collected.clear()
    spark.createDataFrame(
        [("SPY", t0, 100.0, 1.0), ("SPY", t1, 101.0, 1.0)], TICK_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, collected)
    assert [(r["ticker"], r["ts"]) for r in collected] == [("SPY", t1)]


@pytest.mark.skipif(
    not ensure_protobuf_runtime(),
    reason="no google.protobuf runtime installed or discoverable",
)
def test_keyed_counter_accumulates_across_restart(spark, tmpdir):
    """v2 typed-state counter: totals accumulate within a batch, and a
    fresh run over the same checkpoint recovers state and keeps
    counting."""
    from polygon_algotrading_env_spark.streaming.statev2 import (
        ROCKSDB_PROVIDER,
        stream_keyed_counts,
    )

    src, ckpt = f"{tmpdir}/src", f"{tmpdir}/ckpt"
    out: list = []

    def drain():
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
        try:
            stream = spark.readStream.schema("ticker string, qty long").parquet(src)
            q = (
                stream_keyed_counts(stream, "ticker")
                .writeStream.foreachBatch(
                    lambda bdf, bid: out.extend(bdf.collect())
                )
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert q.exception() is None, q.exception()
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )

    spark.createDataFrame(
        [("SPY", 1), ("SPY", 2), ("TLT", 3)], "ticker string, qty long"
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert sorted((r["key"], r["count"]) for r in out) == [("SPY", 2), ("TLT", 1)]

    out.clear()
    spark.createDataFrame(
        [("SPY", 4)], "ticker string, qty long"
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert [(r["key"], r["count"]) for r in out] == [("SPY", 3)]
