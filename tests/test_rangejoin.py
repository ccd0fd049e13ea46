"""Range / interval joins — operators/rangejoin.py.

Correctness standard: exact equivalence with the naive non-equi join on
randomized fixtures (the brute force Spark would have run as
BroadcastNestedLoopJoin).
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from polygon_algotrading_env_spark.operators.rangejoin import (
    band_join,
    interval_overlap_join,
)


def _set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_band_join_matches_bruteforce(spark):
    rng = random.Random(3)
    left = spark.createDataFrame(
        [("k%d" % (i % 3), i, rng.randrange(0, 300)) for i in range(60)],
        "g string, lid int, lv long",
    )
    right = spark.createDataFrame(
        [("k%d" % (i % 3), i, rng.randrange(0, 300)) for i in range(80)],
        "g string, rid int, rv long",
    )
    for low, high, width in ((-10, 10, None), (0, 25, 7.0), (-5, 0, 2.0)):
        got = band_join(
            left, right, "lv", "rv", low=low, high=high, on="g",
            bucket_width=width,
        )
        brute = left.join(right, "g").filter(
            (F.col("rv") >= F.col("lv") + low) & (F.col("rv") <= F.col("lv") + high)
        )
        cols = ["g", "lid", "rid"]
        assert _set(got, cols) == _set(brute, cols), (low, high, width)


def test_band_join_no_equality_key(spark):
    left = spark.createDataFrame([(1, 100), (2, 205)], "lid int, lv long")
    right = spark.createDataFrame(
        [(10, 95), (11, 110), (12, 200), (13, 290)], "rid int, rv long"
    )
    got = _set(band_join(left, right, "lv", "rv", low=-10, high=10), ["lid", "rid"])
    assert got == {(1, 10), (1, 11), (2, 12)}


def test_band_join_rejects_empty_band(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="empty band"):
        band_join(df, df, "x", "x", low=5, high=-5)


def test_interval_overlap_matches_bruteforce(spark):
    rng = random.Random(9)

    def intervals(n, prefix):
        rows = []
        for i in range(n):
            s = rng.randrange(0, 200)
            rows.append((f"k{i % 2}", i, s, s + rng.randrange(0, 40)))
        return rows

    left = spark.createDataFrame(intervals(50, "l"), "g string, lid int, ls long, le long")
    right = spark.createDataFrame(intervals(70, "r"), "g string, rid int, rs long, re long")
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", on="g"
    )
    brute = left.join(right, "g").filter(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    cols = ["g", "lid", "rid"]
    assert _set(got, cols) == _set(brute, cols)
    # Each overlapping pair appears exactly once despite multi-cell meets.
    assert got.count() == brute.count()


def test_band_join_plan_is_hash_join(spark):
    """The point of bucketing: the physical plan must be an equi hash/sort
    join on the cell, never BroadcastNestedLoopJoin."""
    left = spark.createDataFrame([(i, i * 3) for i in range(100)], "lid int, lv long")
    right = spark.createDataFrame([(i, i * 2) for i in range(100)], "rid int, rv long")
    plan = (
        band_join(left, right, "lv", "rv", low=-4, high=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
