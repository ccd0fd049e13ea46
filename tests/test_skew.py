from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark):
    rows = [("SPY", float(i % 10)) for i in range(5000)] + [
        ("TLT", float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "ticker string, v double")
    plain = {
        (r["ticker"]): (r["cnt"], r["s"])
        for r in df.groupBy("ticker")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["ticker"]): (r["cnt"], r["s"])
        for r in salted_aggregate(
            df,
            ["ticker"],
            partial_aggs={"cnt": F.count(F.lit(1)), "s": F.sum("v")},
            final_aggs={"cnt": F.sum("cnt"), "s": F.sum("s")},
            buckets=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [("SPY", i) for i in range(1000)] + [("TLT", i) for i in range(10)],
        "ticker string, x long",
    )
    dim = spark.createDataFrame(
        [("SPY", "etf"), ("TLT", "etf"), ("XYZ", "na")], "ticker string, kind string"
    )
    plain = fact.join(dim, "ticker").groupBy("ticker", "kind").count()
    salted = salted_join(fact, dim, "ticker", buckets=4).groupBy(
        "ticker", "kind"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_rejects_replicating_hows(spark):
    import pytest

    from polygon_algotrading_env_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, w string")
    for how in ("right", "full", "left_anti", "outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(a, b, on="k", how=how)
