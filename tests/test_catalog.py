from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import TABLES, load_all, load_table


def test_all_tables_load(spark, sf_dir):
    dfs = load_all(spark, sf_dir)
    assert set(dfs) == set(TABLES)
    for name, df in dfs.items():
        assert df.limit(1).count() == 1, name


def test_events_ts_conversion_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert dict(ev.dtypes)["ts_ns"] == "bigint"
    # ts must equal ts_ns truncated to microseconds, exactly (session tz is
    # pinned to UTC, so the NTZ→TIMESTAMP cast is an identity on the epoch).
    n_bad = ev.filter(
        F.unix_micros(F.col("ts").cast("timestamp")) != F.expr("ts_ns DIV 1000")
    ).count()
    assert n_bad == 0


def test_orders_shipdate_is_ntz(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    assert dict(o.dtypes)["o_orderdate"] == "timestamp_ntz"
