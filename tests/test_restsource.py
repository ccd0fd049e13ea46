from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from polygon_algotrading_env_spark.sources.restsource import PolygonPagesDataSource

DAY_MS = 86_400_000


@pytest.fixture()
def page_root(spark):
    d = tempfile.mkdtemp(prefix="pae_spark_pages_")
    for sym, days in [("SPY", 5), ("TLT", 3)]:
        os.makedirs(f"{d}/{sym}")
        # two pages, overlapping by one record (the by-design dup)
        recs = [
            {"t": i * DAY_MS, "o": 1.0, "h": 2.0, "l": 0.5, "c": 1.5 + i,
             "v": 10.0, "vw": 1.2, "n": 3}
            for i in range(days)
        ]
        mid = max(days // 2, 1)
        with open(f"{d}/{sym}/page-0.json", "w") as f:
            json.dump({"results": recs[: mid + 1]}, f)
        with open(f"{d}/{sym}/page-1.json", "w") as f:
            json.dump({"results": recs[mid:]}, f)
    spark.dataSource.register(PolygonPagesDataSource)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_datasource_distributed_scan(spark, page_root):
    df = spark.read.format("polygon_pages").option("path", page_root).load()
    counts = {r["ticker"]: r["cnt"] for r in
              df.groupBy("ticker").count().withColumnRenamed("count", "cnt").collect()}
    assert counts == {"SPY": 5, "TLT": 3}  # overlap deduped per partition
    assert df.schema["t"].dataType.simpleString() == "bigint"
    # One input partition per symbol → the reference's per-ticker fan-out.
    assert df.rdd.getNumPartitions() == 2


def test_datasource_symbol_selection_and_watermark(spark, page_root):
    df = (
        spark.read.format("polygon_pages")
        .option("path", page_root)
        .option("symbols", "SPY")
        .option("lastentryts", str(1 * DAY_MS))
        .load()
    )
    rows = df.collect()
    assert {r["ticker"] for r in rows} == {"SPY"}
    assert sorted(r["t"] for r in rows) == [2 * DAY_MS, 3 * DAY_MS, 4 * DAY_MS]


def test_datasource_numeric_page_order(spark):
    """>=10 pages: lexicographic order (page-10 before page-2) would trip the
    monotonic guard and silently drop pages 2-9. Numeric sort must keep all."""
    d = tempfile.mkdtemp(prefix="pae_spark_pages10_")
    try:
        os.makedirs(f"{d}/SPY")
        n_pages, per_page = 12, 3
        for p in range(n_pages):
            recs = [
                {"t": (p * per_page + i) * DAY_MS, "o": 1.0, "h": 2.0,
                 "l": 0.5, "c": 1.5, "v": 10.0, "vw": 1.2, "n": 3}
                for i in range(per_page)
            ]
            with open(f"{d}/SPY/page-{p}.json", "w") as f:
                json.dump({"results": recs}, f)
        spark.dataSource.register(PolygonPagesDataSource)
        df = spark.read.format("polygon_pages").option("path", d).load()
        ts = sorted(r["t"] for r in df.collect())
        assert ts == [i * DAY_MS for i in range(n_pages * per_page)]
    finally:
        shutil.rmtree(d, ignore_errors=True)
