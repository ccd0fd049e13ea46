from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("A", 5, "l1"), ("A", 10, "l2"), ("A", 20, "l3"), ("B", 7, "l4"),
         ("C", 1, "l5")],
        "k string, t long, lv string",
    )
    right = spark.createDataFrame(
        [("A", 5, "r5"), ("A", 10, "r10"), ("A", 15, "r15"), ("B", 8, "r8")],
        "k string, t long, rv string",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", direction="backward"
    )
    got = {(r["k"], r["t"]): r["rv"] for r in out.collect()}
    assert got == {
        ("A", 5): "r5",     # exact match allowed
        ("A", 10): "r10",
        ("A", 20): "r15",
        ("B", 7): None,     # right exists only later
        ("C", 1): None,     # no right rows at all
    }


def test_backward_strict(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        direction="backward", allow_exact_matches=False,
    )
    got = {(r["k"], r["t"]): r["rv"] for r in out.collect()}
    assert got[("A", 5)] is None
    assert got[("A", 10)] == "r5"
    assert got[("A", 20)] == "r15"


def test_forward_inclusive_and_strict(spark):
    left, right = _frames(spark)
    inc = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", direction="forward"
    )
    got = {(r["k"], r["t"]): r["rv"] for r in inc.collect()}
    assert got == {
        ("A", 5): "r5",
        ("A", 10): "r10",
        ("A", 20): None,
        ("B", 7): "r8",
        ("C", 1): None,
    }
    strict = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        direction="forward", allow_exact_matches=False,
    )
    got = {(r["k"], r["t"]): r["rv"] for r in strict.collect()}
    assert got[("A", 5)] == "r10"
    assert got[("A", 10)] == "r15"


def test_tie_break_deterministic(spark):
    left = spark.createDataFrame([("A", 10, "l")], "k string, t long, lv string")
    right = spark.createDataFrame(
        [("A", 10, "first", 1), ("A", 10, "second", 2)],
        "k string, t long, rv string, seq int",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", tie_break="seq"
    )
    assert out.collect()[0]["rv"] == "second"  # greatest tie_break wins


def test_column_collision_suffix(spark):
    left = spark.createDataFrame([("A", 10, 1.0)], "k string, t long, v double")
    right = spark.createDataFrame([("A", 5, 2.0)], "k string, t long, v double")
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t")
    assert set(out.columns) == {"k", "t", "v", "t_r", "v_r"}


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_chunked_equivalence_exhaustive(spark):
    """asof_join_chunked ≡ asof_join across directions, exactness, tie
    breaks, and chunk widths that split keys mid-stream (including width 1,
    where nearly every row is its own chunk and everything flows through
    the carry path)."""
    import random

    from polygon_algotrading_env_spark.operators.asof import asof_join_chunked

    rng = random.Random(7)
    left_rows = [
        (k, rng.randrange(0, 50), f"l{i}")
        for i, k in enumerate(k for k in "AAB" * 10 for _ in range(2))
    ]
    right_rows = [
        (k, rng.randrange(0, 50), f"r{i}", float(i % 5))
        for i, k in enumerate(k for k in "ABC" * 8 for _ in range(2))
    ]
    left = spark.createDataFrame(left_rows, "k string, t long, lv string")
    right = spark.createDataFrame(right_rows, "k string, t long, rv string, w double")

    for direction in ("backward", "forward"):
        for exact in (True, False):
            base = asof_join(
                left, right, on="k", left_ts="t", right_ts="t",
                direction=direction, allow_exact_matches=exact, tie_break="w",
            )
            for chunk in (1, 7, 100):
                chunked = asof_join_chunked(
                    left, right, on="k", left_ts="t", right_ts="t",
                    chunk_seconds=chunk, direction=direction,
                    allow_exact_matches=exact, tie_break="w",
                )
                assert _rows_set(chunked) == _rows_set(base), (
                    direction, exact, chunk,
                )


def test_chunked_hot_key_parallelism(spark):
    """The big window's partition keys include the chunk: a single hot key
    no longer serializes into one task's sort."""
    from polygon_algotrading_env_spark.operators.asof import asof_join_chunked

    left = spark.createDataFrame(
        [("HOT", i, f"l{i}") for i in range(200)], "k string, t long, lv string"
    )
    right = spark.createDataFrame(
        [("HOT", i, f"r{i}") for i in range(0, 200, 3)],
        "k string, t long, rv string",
    )
    out = asof_join_chunked(
        left, right, on="k", left_ts="t", right_ts="t", chunk_seconds=50
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan  # chunk participates in the window partitioning
    got = {r["t"]: r["rv"] for r in out.collect()}
    assert got[0] == "r0" and got[4] == "r3" and got[199] == "r198"
