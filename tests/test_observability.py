from __future__ import annotations

import shutil
import tempfile

import pytest

from polygon_algotrading_env_spark.operators.dedup import observed_dedup
from polygon_algotrading_env_spark.streaming.pipeline import stream_dim_refresh


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pae_spark_obs_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_observed_dedup_counts_without_extra_jobs(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    deduped, obs_in, obs_out = observed_dedup(df)
    rows = deduped.collect()  # ONE action drives both observations
    assert len(rows) == 3
    assert obs_in.get["rows"] == 4
    assert obs_out.get["rows"] == 3


def test_stream_dim_refresh_overwrites_latest(spark, tmpdir):
    src = f"{tmpdir}/src"
    latest = f"{tmpdir}/latest"
    schema = "ticker string, market string"

    spark.createDataFrame(
        [("SPY", "stocks"), ("SPY", "stocks"), ("BTC", "crypto")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_dim_refresh(stream, f"{tmpdir}/ckpt", latest)
    q.awaitTermination(120)
    snap1 = spark.read.parquet(latest)
    assert snap1.count() == 2  # dedup applied in the refresh

    # Next batch fully replaces the snapshot (full-refresh semantics).
    spark.createDataFrame(
        [("TLT", "stocks")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_dim_refresh(stream, f"{tmpdir}/ckpt", latest)
    q.awaitTermination(120)
    snap2 = spark.read.parquet(latest)
    assert {r["ticker"] for r in snap2.collect()} == {"TLT"}


# --- schema contracts -----------------------------------------------------

def test_schema_contract_passes_and_reports_all_violations(spark):
    import pytest as _pytest

    from polygon_algotrading_env_spark.operators.profile import (
        SchemaContractError,
        assert_schema_contract,
    )

    df = spark.createDataFrame([(1, "x", 2.0)], "id long, tag string, v double")
    # clean pass returns the same df for fluent use
    out = assert_schema_contract(
        df, {"id": "bigint", "tag": "string"}, allow_extra=True
    )
    assert out is df
    with _pytest.raises(SchemaContractError) as e:
        assert_schema_contract(
            df,
            {"id": "int", "missing_col": "string"},
            allow_extra=False,
        )
    msg = str(e.value)
    # every violation reported at once, not first-failure
    assert "missing_col" in msg and "is bigint" in msg and "unexpected" in msg


def test_schema_contract_nullability(spark):
    import pytest as _pytest

    from polygon_algotrading_env_spark.operators.profile import (
        SchemaContractError,
        assert_schema_contract,
    )

    df = spark.createDataFrame([(1,)], "id long")  # nullable by default
    with _pytest.raises(SchemaContractError, match="non-nullable"):
        assert_schema_contract(df, {"id": "bigint"}, forbid_nullable=["id"])
