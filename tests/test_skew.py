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


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join handling — the no-code-change answer to a
    hot key that salting solves manually: with thresholds scaled to test
    data, the final plan's SortMergeJoin must be marked skew=true and
    still produce exact results."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 150k rows of key 0 (hot) + uniform tail; right side small per key
        # incompressible payload: the skew detector works on SHUFFLE BYTE
        # sizes, and a constant-key partition of tiny rows compresses
        # below any threshold
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 150_000, F.lit(0))
            .otherwise(F.col("id") % 500)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pl"),
        )
        right = spark.range(0, 500).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        # Reduce with a GLOBAL aggregate (its partial phase imposes no
        # distribution requirement on the join output — a groupBy on the
        # join key would forbid splitting skewed partitions), and inspect
        # THIS Dataset's finalized AQE plan (a separate action would
        # finalize a different execution).
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rv").alias("s"),
            F.sum(F.length("pl")).alias("pl_bytes"),  # keeps pl in the shuffle
        )
        row = joined.collect()[0]
        assert row["n"] == 200_000  # every left row matches exactly once
        # tail ids 150000..199999 = 100 full 0..499 cycles of rv = 2k
        assert row["s"] == 100 * 499 * 500
        assert row["pl_bytes"] == 200_000 * 32
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
