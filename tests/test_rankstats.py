"""Distributed per-group rank statistics (operators/rankstats.py).

Correctness laws: cumulative grid counts must equal the window-function
reference; grouped exact quantiles must be bit-identical to
``F.percentile``. Plan laws (the reason the operator exists): no Window
node may partition on the group keys alone — every window must either
include the zone id (parallel across range zones even for ONE group) or
run over the partitions×groups zone relation.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from polygon_algotrading_env_spark.operators.evalmetrics import (
    spearman_by_group,
)
from polygon_algotrading_env_spark.operators.rankstats import (
    cumulate_grid,
    grid_rank_stats,
    grouped_exact_quantiles,
)


def _rand_rows(n, groups, vmax, seed):
    rnd = random.Random(seed)
    return [
        (rnd.choice(groups), float(rnd.randint(0, vmax))) for _ in range(n)
    ]


def test_cumulate_grid_matches_window_reference(spark):
    rows = _rand_rows(500, ["a", "b", "c"], 25, seed=7)
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["v"]): (r["cum_lt"], r["cum_le"], r["n_g"])
        for r in grid_rank_stats(df, "v", ["g"]).collect()
    }
    grid = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("g").orderBy("v")
    ref = grid.select(
        "g",
        "v",
        (F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("c")).alias("lt"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("le"),
        F.sum("c").over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    want = {(r["g"], r["v"]): (r["lt"], r["le"], r["n"]) for r in ref.collect()}
    assert got == want


def test_cumulate_grid_single_group_many_zones(spark):
    # one group, forced multi-zone: the pattern the operator exists for
    df = spark.createDataFrame(
        [("g", float(i % 100)) for i in range(2000)], "g string, v double"
    )
    grid = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    out = cumulate_grid(grid, ["g"], "v", "c", num_partitions=8).collect()
    assert len(out) == 100
    by_v = sorted(out, key=lambda r: r["v"])
    run = 0
    for r in by_v:
        assert r["cum_lt"] == run
        run += r["c"]
        assert r["cum_le"] == run and r["n_g"] == 2000


@pytest.mark.parametrize("probs", [[0.5], [0.1, 0.25, 0.5, 0.75, 0.9]])
def test_grouped_exact_quantiles_match_percentile(spark, probs):
    rows = _rand_rows(700, ["a", "b"], 400, seed=13)
    df = spark.createDataFrame(rows, "g string, v double")
    names = [f"p{i}" for i in range(len(probs))]
    got = {
        r["g"]: [r[nm] for nm in names]
        for r in grouped_exact_quantiles(df, "v", ["g"], probs, names).collect()
    }
    ref = {
        r["g"]: [r[nm] for nm in names]
        for r in df.groupBy("g")
        .agg(
            *[
                F.percentile(F.col("v"), F.lit(p)).alias(nm)
                for p, nm in zip(probs, names)
            ]
        )
        .collect()
    }
    assert got == ref  # bit-identical, not approximately equal


def test_global_exact_quantiles_and_ties(spark):
    # even n with tied middle values; keys=[] global path
    vals = [1.0, 2.0, 2.0, 2.0, 3.0, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = grouped_exact_quantiles(df, "v", [], [0.5, 0.0, 1.0], ["med", "lo", "hi"]).collect()[0]
    assert r["med"] == 2.0 and r["lo"] == 1.0 and r["hi"] == 9.0
    r2 = grouped_exact_quantiles(df, "v", [], [0.9], ["q"]).collect()[0]
    ref = df.agg(F.percentile(F.col("v"), F.lit(0.9)).alias("q")).collect()[0]
    assert r2["q"] == ref["q"]


def test_quantiles_ignore_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    r = grouped_exact_quantiles(df, "v", ["g"], [0.5], ["med"]).collect()[0]
    assert r["med"] == 2.0  # interpolated over the 2 non-null values


def _window_partition_specs(df):
    """Partition column lists of every Window node in the optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Window "):
            specs.append(s)
    return specs


def test_no_window_partitions_on_group_keys_alone(spark):
    """The scale law: every Window in the spearman plan must include the
    zone id in its partition spec (or partition the tiny zone relation by
    keys + order by zone) — never sort a whole group in one task."""
    rows = _rand_rows(300, ["a", "b"], 40, seed=3)
    df = spark.createDataFrame(rows, "g string, x double").withColumn(
        "y", F.col("x") * 2
    )
    out = spearman_by_group(df, "x", "y", keys=["g"])
    specs = _window_partition_specs(out)
    assert specs, "expected Window nodes in the plan"
    for s in specs:
        # zone-partitioned running sums carry __zone in the spec; the
        # zone-relation prefix sums order by __zone. Either way the
        # string __zone must appear — a Window whose spec lacks it would
        # be a per-group single-task sort.
        assert "__zone" in s, f"group-funneled window: {s}"


def test_spearman_grid_plan_matches_legacy_window_formula(spark):
    # differential vs the rank()-window formulation it replaced
    rows = [
        (g, float(x), float(y))
        for g, x, y in [
            ("a", 1, 2), ("a", 2, 1), ("a", 2, 3), ("a", 3, 3),
            ("a", 4, 5), ("b", 1, 1), ("b", 2, 2), ("b", 2, 2),
            ("b", 9, 0),
        ]
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in spearman_by_group(df, "x", "y", ["g"]).collect()}
    asc = lambda c: Window.partitionBy("g").orderBy(F.col(c).asc())  # noqa: E731
    tie = lambda c: Window.partitionBy("g", c)  # noqa: E731
    r2 = lambda c: (  # noqa: E731
        2 * F.rank().over(asc(c)).cast("bigint")
        + F.count(F.lit(1)).over(tie(c))
        - 1
    )
    legacy = (
        df.select("g", r2("x").alias("rx"), r2("y").alias("ry"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rx").alias("sx"),
            F.sum("ry").alias("sy"),
            F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
            F.sum(F.col("ry") * F.col("ry")).alias("syy"),
            F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        )
    )
    want = {r["g"]: r for r in legacy.collect()}
    for g in ("a", "b"):
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy"):
            assert got[g][c] == want[g][c], (g, c)
    # the adaptive small-input shape must carry the identical exact
    # integers (and therefore the identical rho) as the grid plan
    glob = {
        r["g"]: r
        for r in spearman_by_group(df, "x", "y", ["g"], mode="global").collect()
    }
    for g in ("a", "b"):
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy", "rho"):
            assert glob[g][c] == got[g][c], (g, c)


def test_pre_partitioned_guard_rejects_hash_layout(spark):
    # pre_partitioned=True relies on the caller's range exchange being
    # the input's topmost shuffle; a hash-partitioned aggregate scatters
    # each group's value order across zones, so the guard must refuse it
    rows = _rand_rows(200, ["a", "b"], 10, seed=3)
    df = spark.createDataFrame(rows, "g string, v double")
    hash_grid = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    with pytest.raises(AssertionError, match="pre_partitioned"):
        cumulate_grid(hash_grid, ["g"], "v", "c", pre_partitioned=True)
    # ...while the documented shape (aggregate over a range repartition)
    # passes the guard and matches the unpinned path
    range_grid = (
        df.repartitionByRange(8, "g", "v")
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {
        (r["g"], r["v"]): (r["cum_lt"], r["cum_le"], r["n_g"])
        for r in cumulate_grid(
            range_grid, ["g"], "v", "c", pre_partitioned=True
        ).collect()
    }
    want = {
        (r["g"], r["v"]): (r["cum_lt"], r["cum_le"], r["n_g"])
        for r in cumulate_grid(range_grid, ["g"], "v", "c").collect()
    }
    assert got == want
