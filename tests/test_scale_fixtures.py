"""The 10x bench fixtures must preserve WORKLOAD SHAPE, not just row
count — the sf1 ratios in BENCH_r*.json are only evidence if the scaled
tables behave like a genuinely larger SF."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tools.scale_fixtures import build_scaled_fixtures


@pytest.fixture(scope="module")
def scaled_dir(spark, sf_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled") / "x2")
    build_scaled_fixtures(spark, sf_dir, dst, factor=2)
    return dst


def test_tpch_tables_scale_rows_and_keep_fk_joins(spark, sf_dir, scaled_dir):
    """Every scaled TPC-H table has factor x rows; FK joins stay 1:1 per
    replica (a lineitem matches exactly ONE order/part/supplier — key
    shifts are consistent across tables), so join selectivities match a
    real larger SF instead of fanning out."""
    from polygon_algotrading_env_spark.catalog import load_table

    for t in ("orders", "lineitem", "customer", "part", "supplier"):
        base = load_table(spark, sf_dir, t).count()
        scaled = load_table(spark, scaled_dir, t).count()
        assert scaled == 2 * base, t
    # dims pinned, as TPC-H pins them
    for t in ("region", "nation"):
        assert (
            load_table(spark, scaled_dir, t).count()
            == load_table(spark, sf_dir, t).count()
        ), t
    li = load_table(spark, scaled_dir, "lineitem")
    orders = load_table(spark, scaled_dir, "orders")
    part = load_table(spark, scaled_dir, "part")
    n_li = li.count()
    assert li.join(orders, li.l_orderkey == orders.o_orderkey).count() == n_li
    assert li.join(part, li.l_partkey == part.p_partkey).count() == n_li


def test_aggregates_scale_exactly(spark, sf_dir, scaled_dir):
    """Replica-shifted copies leave every non-key column untouched, so a
    star-join revenue aggregate over the scaled data is EXACTLY factor x
    the base aggregate — the strongest cheap invariant that the scaling
    changed size and nothing else."""
    from polygon_algotrading_env_spark.catalog import load_table

    def revenue(d):
        li = load_table(spark, d, "lineitem")
        return li.agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).first()[0]

    assert abs(revenue(scaled_dir) - 2 * revenue(sf_dir)) < 1e-6 * revenue(sf_dir)


def test_events_time_range_extends_not_deepens(spark, sf_dir, scaled_dir):
    """Event replicas shift in TIME: the scaled stream covers ~factor x
    the span with per-bar density unchanged (replicating timestamps
    verbatim would deepen each bar — a different workload)."""
    from polygon_algotrading_env_spark.catalog import load_table

    base = load_table(spark, sf_dir, "events")
    scaled = load_table(spark, scaled_dir, "events")
    b_lo, b_hi = base.agg(F.min("ts"), F.max("ts")).first()
    s_lo, s_hi = scaled.agg(F.min("ts"), F.max("ts")).first()
    span_b = (b_hi - b_lo).total_seconds()
    span_s = (s_hi - s_lo).total_seconds()
    assert span_s > 1.9 * span_b
    assert scaled.count() == 2 * base.count()
    # per-timestamp multiplicity unchanged: no timestamp occurs more often
    max_dup_b = base.groupBy("ts").count().agg(F.max("count")).first()[0]
    max_dup_s = scaled.groupBy("ts").count().agg(F.max("count")).first()[0]
    assert max_dup_s == max_dup_b
