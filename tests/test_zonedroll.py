"""Zone-decomposed rolling windows (operators/zonedroll.py).

Correctness law: for any rolling-frame / lag / row_number expression with
lookback ≤ carry, the zoned evaluation must be BIT-IDENTICAL to the
single-partition ``Window.partitionBy(keys).orderBy(order)`` reference —
including groups shorter than ``carry`` (carries span multiple zones
back) and order-gaps inside a group. Plan law (the reason the operator
exists): every Window node in a consumer's optimized plan must mention
the zone id — no window may sort a whole group in one task.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from polygon_algotrading_env_spark.operators.zonedroll import zoned_stream


def _fixture(spark):
    rnd = random.Random(42)
    rows = []
    for g, n in (("a", 500), ("b", 7), ("c", 60)):  # b is shorter than carry
        for i in range(n):
            rows.append(
                (g, i * 10 + rnd.randint(0, 5), float(rnd.randint(-50, 50)))
            )
    return spark.createDataFrame(rows, "g string, t bigint, v double").where(
        # an order-gap inside group a: carries must hop it intact
        "NOT (g = 'a' AND t BETWEEN 1000 AND 1500)"
    )


@pytest.mark.parametrize("carry,nparts", [(14, 16), (3, 40), (1, 16)])
def test_zoned_rolling_matches_global_window(spark, carry, nparts):
    df = _fixture(spark)
    z = zoned_stream(df, ["g"], ["t"], carry=carry, num_partitions=nparts)
    lb = carry - 1
    out = z.finish(
        z.frame.select(
            "g",
            "t",
            F.sum("v").over(z.rows(-lb, 0)).alias("rsum"),
            F.count(F.lit(1)).over(z.rows(-lb, 0)).alias("rcnt"),
            (F.col("v") - F.lag("v").over(z.w)).alias("d"),
            z.row_number().alias("rn"),
            "__carry",
            "__tzone",
        )
    )
    got = {
        (r["g"], r["t"]): (r["rsum"], r["rcnt"], r["d"], r["rn"])
        for r in out.collect()
    }
    w = Window.partitionBy("g").orderBy("t")
    ref = df.select(
        "g",
        "t",
        F.sum("v").over(w.rowsBetween(-lb, 0)).alias("rsum"),
        F.count(F.lit(1)).over(w.rowsBetween(-lb, 0)).alias("rcnt"),
        (F.col("v") - F.lag("v").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    want = {
        (r["g"], r["t"]): (r["rsum"], r["rcnt"], r["d"], r["rn"])
        for r in ref.collect()
    }
    assert got == want  # bit-identical, short groups and gaps included


def test_single_group_spans_many_zones(spark):
    # one group forced across many zones — the funnel the operator removes
    df = spark.createDataFrame(
        [("g", i, float(i % 17)) for i in range(2000)],
        "g string, t bigint, v double",
    )
    z = zoned_stream(df, ["g"], ["t"], carry=5, num_partitions=16)
    zones = (
        z.frame.where("__carry = 0").select("__tzone").distinct().count()
    )
    assert zones > 1, "expected the single group to span multiple zones"
    out = z.finish(
        z.frame.select(
            "t", F.sum("v").over(z.rows(-4, 0)).alias("s"),
            z.row_number().alias("rn"), "__carry", "__tzone",
        )
    ).collect()
    w = Window.partitionBy(F.lit(1)).orderBy("t")
    want = {
        r["t"]: (r["s"], r["rn"])
        for r in df.select(
            "t",
            F.sum("v").over(w.rowsBetween(-4, 0)).alias("s"),
            F.row_number().over(w).alias("rn"),
        ).collect()
    }
    assert {r["t"]: (r["s"], r["rn"]) for r in out} == want


def test_rows_guard_rejects_uncovered_lookback(spark):
    df = _fixture(spark)
    z = zoned_stream(df, ["g"], ["t"], carry=3)
    with pytest.raises(ValueError):
        z.rows(-4, 0)
    with pytest.raises(ValueError):
        z.rows(Window.unboundedPreceding, 0)
    with pytest.raises(ValueError):
        zoned_stream(df, ["g"], ["t"], carry=0)


def test_rows_guard_rejects_forward_frames(spark):
    # carry replication covers lookback only; a forward frame would
    # silently truncate at zone boundaries, so it must fail loudly
    df = _fixture(spark)
    z = zoned_stream(df, ["g"], ["t"], carry=3)
    with pytest.raises(ValueError, match="forward"):
        z.rows(-2, 1)
    with pytest.raises(ValueError, match="forward"):
        z.rows(1, 2)


def _window_partition_specs(df):
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [
        line.strip().lstrip("+-: ")
        for line in plan.splitlines()
        if line.strip().lstrip("+-: ").startswith("Window ")
    ]


def test_no_window_partitions_on_group_keys_alone(spark, monkeypatch):
    """The scale law, asserted on the real consumers: every Window in the
    rsi_14 / hurst optimized plans must mention the zone id — a Window
    whose spec lacks it would be a per-group single-task sort (the shape
    that made rsi_14 the suite's worst 100x scaler before the rewrite).
    Forced zoned: the adaptive gate (zoning_mode) picks the global shape
    at fixture scale, pinned separately below."""
    from polygon_algotrading_env_spark.queries import REGISTRY

    monkeypatch.setenv("SPARK_GRAFT_ZONING", "zoned")
    for name in ("rsi_14_per_event_type", "hurst_exponent_by_type"):
        out = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        specs = _window_partition_specs(out)
        assert specs, f"expected Window nodes in {name}'s plan"
        for s in specs:
            assert "__zone" in s or "__tzone" in s, (name, s)


def test_zoned_row_number_matches_global(spark):
    from polygon_algotrading_env_spark.operators.zonedroll import (
        zoned_row_number,
    )

    df = _fixture(spark)
    got = {
        (r["g"], r["t"]): r["__rn"]
        for r in zoned_row_number(df, ["g"], ["t"], num_partitions=16).collect()
    }
    w = Window.partitionBy("g").orderBy("t")
    want = {
        (r["g"], r["t"]): r["rn"]
        for r in df.select("g", "t", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_ema_closed_form_has_no_bare_key_window(spark, monkeypatch):
    """with_ema_closed_form's row numbering is zone-decomposed (forced:
    the adaptive gate picks global at fixture scale): no Window node in
    any EMA-family consumer plan may partition on the group keys alone
    (every spec must carry a scaffolding column — zone or block)."""
    from polygon_algotrading_env_spark.queries import REGISTRY

    monkeypatch.setenv("SPARK_GRAFT_ZONING", "zoned")
    for name in ("ema_20_per_event_type", "ewma_vol_5m", "macd_12_26_9_5m"):
        out = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        specs = _window_partition_specs(out)
        assert specs, f"expected Window nodes in {name}'s plan"
        for s in specs:
            assert "__" in s, (name, s)
        # the fused MACD must stay pure JVM algebra — no Python recursion
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan, name


def test_global_mode_matches_zoned(spark):
    """mode="global" (the adaptive small-input shape) must produce
    bit-identical results through the SAME consumer expressions."""
    df = _fixture(spark)
    zg = zoned_stream(df, ["g"], ["t"], carry=3, mode="global")
    zz = zoned_stream(df, ["g"], ["t"], carry=3, num_partitions=16)
    def run(z):
        return {
            (r["g"], r["t"]): (r["s"], r["d"], r["rn"])
            for r in z.finish(
                z.frame.select(
                    "g", "t",
                    F.sum("v").over(z.rows(-2, 0)).alias("s"),
                    (F.col("v") - F.lag("v").over(z.w)).alias("d"),
                    z.row_number().alias("rn"),
                    "__carry", "__tzone",
                )
            ).collect()
        }
    assert run(zg) == run(zz)


def test_zoning_mode_gate_and_override(monkeypatch):
    """The adaptive gate: parquet-footer row count vs the threshold, with
    SPARK_GRAFT_ZONING forcing either shape."""
    from polygon_algotrading_env_spark.catalog import table_rows
    from polygon_algotrading_env_spark.operators.zonedroll import (
        ZONING_ROW_THRESHOLD,
        zoning_mode,
    )

    monkeypatch.delenv("SPARK_GRAFT_ZONING", raising=False)
    # every committed fixture is below the 2M-row threshold -> global
    n = table_rows("/root/testdata/sf0.001", "events")
    assert 0 < n < ZONING_ROW_THRESHOLD
    assert zoning_mode("/root/testdata/sf0.001") == "global"
    monkeypatch.setenv("SPARK_GRAFT_ZONING", "zoned")
    assert zoning_mode("/root/testdata/sf0.001") == "zoned"
    monkeypatch.setenv("SPARK_GRAFT_ZONING", "global")
    assert zoning_mode("/root/testdata/sf0.001") == "global"


def test_gated_queries_use_global_shape_at_fixture_scale(spark, monkeypatch):
    """Below the row threshold the consumers must carry NO zoning
    scaffolding — the fixed range-exchange/pin cost is exactly what the
    gate removes at small inputs."""
    from polygon_algotrading_env_spark.queries import REGISTRY

    monkeypatch.delenv("SPARK_GRAFT_ZONING", raising=False)
    for name in ("rsi_14_per_event_type", "ema_20_per_event_type"):
        out = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "__zone" not in plan, name
        assert "spark_partition_id" not in plan, name


def test_gated_queries_identical_across_shapes(spark, monkeypatch):
    """End-to-end equivalence law for every adaptively-gated query: the
    forced-global and forced-zoned plans must produce the SAME rows
    through the registry functions (the law each mode's oracle hash
    certifies separately, asserted here directly in one run)."""
    from polygon_algotrading_env_spark.operators.zonedroll import (
        GATED_QUERIES,
    )
    from polygon_algotrading_env_spark.queries import REGISTRY

    # single-sourced on GATED_QUERIES (not a hand list) so a new
    # zoning_mode() consumer is law-covered the moment it registers —
    # the same no-drift principle as the derived certified ledger
    sf = "/root/testdata/sf0.001"
    for name in GATED_QUERIES:
        monkeypatch.setenv("SPARK_GRAFT_ZONING", "global")
        a = {tuple(r) for r in REGISTRY[name].fn(spark, sf).collect()}
        monkeypatch.setenv("SPARK_GRAFT_ZONING", "zoned")
        b = {tuple(r) for r in REGISTRY[name].fn(spark, sf).collect()}
        assert a == b, name
