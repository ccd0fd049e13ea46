"""S4/K3/K4 JDBC round trip against embedded Derby (on Spark's classpath —
no external RDBMS needed). Mirrors the reference's MySQL surface:
``dag_aggregates_etl.py:54`` read, ``reference_data_etl.py:67`` replace
write, ``aggregates_etl.py:171-177`` incremental append.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from polygon_algotrading_env_spark.sources.readers import read_jdbc
from polygon_algotrading_env_spark.sources.writers import write_jdbc


@pytest.fixture()
def derby_url():
    d = tempfile.mkdtemp(prefix="pae_derby_")
    yield f"jdbc:derby:{d}/db;create=true"
    shutil.rmtree(d, ignore_errors=True)


def _dim(spark):
    return spark.createDataFrame(
        [(1, "AAPL", "XNAS"), (2, "MSFT", "XNAS"), (3, "SAP", "XETR")],
        "id int, ticker string, mic string",
    )


# Derby maps StringType to CLOB by default, which its SQL layer cannot
# compare against literals — pin VARCHAR like any production DDL would.
_DDL = {"createTableColumnTypes": "ticker VARCHAR(32), mic VARCHAR(8)"}


def test_jdbc_overwrite_then_read(spark, derby_url):
    write_jdbc(_dim(spark), derby_url, "tickers", mode="overwrite", properties=_DDL)
    # Full-refresh semantics: a second overwrite replaces, never accumulates.
    write_jdbc(_dim(spark), derby_url, "tickers", mode="overwrite", properties=_DDL)
    back = read_jdbc(spark, derby_url, "tickers")
    assert back.count() == 3
    assert {r["ticker"] for r in back.collect()} == {"AAPL", "MSFT", "SAP"}


def test_jdbc_append_accumulates(spark, derby_url):
    write_jdbc(_dim(spark), derby_url, "facts", mode="overwrite", properties=_DDL)
    write_jdbc(
        spark.createDataFrame([(4, "TSLA", "XNAS")], "id int, ticker string, mic string"),
        derby_url,
        "facts",
        mode="append",
    )
    back = read_jdbc(spark, derby_url, "facts")
    assert back.count() == 4


def test_jdbc_predicate_partitioned_read(spark, derby_url):
    write_jdbc(_dim(spark), derby_url, "tickers", mode="overwrite", properties=_DDL)
    # Spark's JDBC writer creates quoted (case-exact) identifiers, so the
    # predicate slices must quote them too.
    back = read_jdbc(
        spark,
        derby_url,
        "tickers",
        predicates=['"mic" = \'XNAS\'', '"mic" = \'XETR\''],
    )
    # One input partition per predicate, union of slices = full table.
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == 3


def test_jdbc_filter_pushdown_plan(spark, derby_url):
    write_jdbc(_dim(spark), derby_url, "tickers", mode="overwrite", properties=_DDL)
    q = read_jdbc(spark, derby_url, "tickers").filter("mic = 'XNAS'").select("ticker")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # The filter must reach the JDBC scan, not run in Spark post-hoc.
    assert "PushedFilters" in plan and "MIC" in plan.upper()
    assert q.count() == 2


def test_jdbc_upsert_is_idempotent(spark, derby_url):
    from polygon_algotrading_env_spark.sources.writers import write_jdbc_upsert

    base = spark.createDataFrame(
        [(1, "AAPL", 100.0), (2, "MSFT", 200.0)],
        "id long, sym string, px double",
    )
    write_jdbc(base, derby_url, "quotes", mode="overwrite")
    delta = spark.createDataFrame(
        [(2, "MSFT", 222.0), (3, "TLT", 50.0)],
        "id long, sym string, px double",
    )
    write_jdbc_upsert(delta, derby_url, "quotes", key_cols=["id"])
    # replay the SAME batch — must converge, not duplicate
    write_jdbc_upsert(delta, derby_url, "quotes", key_cols=["id"])
    back = {
        r["id"]: (r["sym"], r["px"])
        for r in read_jdbc(spark, derby_url, "quotes").collect()
    }
    assert back == {1: ("AAPL", 100.0), 2: ("MSFT", 222.0), 3: ("TLT", 50.0)}


def test_jdbc_upsert_validates_keys(spark, derby_url):
    import pytest as _pytest

    from polygon_algotrading_env_spark.sources.writers import write_jdbc_upsert

    df = spark.createDataFrame([(1, "x")], "id long, v string")
    with _pytest.raises(ValueError):
        write_jdbc_upsert(df, derby_url, "t", key_cols=[])
    with _pytest.raises(ValueError):
        write_jdbc_upsert(df, derby_url, "t", key_cols=["nope"])


def test_stream_to_jdbc_upsert_converges_across_drains(spark, derby_url, tmp_path):
    from polygon_algotrading_env_spark.sources.writers import write_jdbc
    from polygon_algotrading_env_spark.streaming.pipeline import (
        stream_to_jdbc_upsert,
    )

    base = spark.createDataFrame(
        [(1, "AAPL", 100.0)], "id long, sym string, px double"
    )
    write_jdbc(base, derby_url, "live_quotes", mode="overwrite")
    src = str(tmp_path / "src")

    def drain():
        stream = spark.readStream.schema(
            "id long, sym string, px double"
        ).parquet(src)
        q = stream_to_jdbc_upsert(
            stream, str(tmp_path / "ckpt"), derby_url, "live_quotes", ["id"]
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "AAPL", 111.0), (2, "MSFT", 200.0)],
        "id long, sym string, px double",
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    # second file + re-drain: update id=2, insert id=3
    spark.createDataFrame(
        [(2, "MSFT", 222.0), (3, "TLT", 50.0)],
        "id long, sym string, px double",
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    back = {
        r["id"]: r["px"]
        for r in read_jdbc(spark, derby_url, "live_quotes").collect()
    }
    assert back == {1: 111.0, 2: 222.0, 3: 50.0}
