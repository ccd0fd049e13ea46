"""Typed catalog over the driver's parquet fixture tables.

Replaces the reference's double type-inference (pandas from JSON, then
SQLAlchemy ``to_sql`` DDL inference — ``reference_data_etl.py:58,67``) with
fixed schemas and a single, explicit epoch→timestamp conversion at load time
(the reference converts per-record in Python, ``aggregates_etl.py:25-36,139``).

Timestamp handling (driver fixture quirks):

- ``events.ts`` has shipped in two encodings across driver generations:
  TIMESTAMP(NANOS, isAdjustedToUTC=false) — which Spark's vectorized reader
  only accepts under ``spark.sql.legacy.parquet.nanosAsLong=true``, surfacing
  as epoch-nanos bigint — and plain TIMESTAMP(MICROS). The loader normalizes
  both to the same canonical pair: ``ts`` TIMESTAMP_NTZ at microsecond
  precision plus ``ts_ns`` epoch-nanos bigint (a total-order tiebreak for
  window/asof operators). Integer arithmetic throughout (``DIV`` /
  ``timestampdiff``) — floating-point division would lose precision above
  2^53 ns.
- ``orders.o_orderdate`` / ``lineitem.l_shipdate`` are TIMESTAMP(MILLIS,
  isAdjustedToUTC=false) and read natively as TIMESTAMP_NTZ, which matches
  DuckDB's naive-timestamp view of the same files.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polygon_algotrading_env_spark.session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# TIMESTAMP_NTZ epoch origin; adding an exact microsecond count to it is
# timezone-independent (unlike timestamp_micros(), whose display binds to the
# session zone).
_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical types."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) surfaced as epoch-nanos under nanosAsLong.
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts",
                F.expr(
                    f"timestampadd(MICROSECOND, ts_ns DIV 1000, {_NTZ_EPOCH})"
                ),
            )
        else:
            # TIMESTAMP(MICROS) reads natively; derive the exact-nanos
            # tiebreak column from it (sub-microsecond digits are zero).
            df = df.withColumn(
                "ts_ns",
                F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, ts)")
                * F.lit(1000),
            )
        df = df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
