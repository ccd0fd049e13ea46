"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``polygon_algotrading_env_spark``; this module is a
thin adapter over its query registry
(``polygon_algotrading_env_spark/queries``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polygon_algotrading_env_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole aggregates pipeline in one declarative plan:
    scan → dedup → 5-minute OHLCV bars per symbol → ordered output.
    """
    from polygon_algotrading_env_spark.catalog import load_table
    from polygon_algotrading_env_spark.operators.bars import ohlcv_bars
    from polygon_algotrading_env_spark.operators.dedup import exact_dedup

    ev = exact_dedup(load_table(spark, "/root/testdata/sf0.001", "events"))
    bars = ohlcv_bars(
        ev,
        ts_col="ts",
        price_col="value",
        duration="5 minutes",
        keys=("event_type",),
        volume_col="value",
        order_col="ts_ns",
    )
    return bars.select(
        "event_type",
        "bucket_start",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "vwap",
        "n_trades",
    ).orderBy("event_type", "bucket_start")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _q.oracle_sql()
