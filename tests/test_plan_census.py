"""Registry-wide plan census as a pytest gate: no query may plan a
scale-killer shape (unexpected sort-merge join, any cartesian product)
— the audit tools/plan_report.py runs by hand, enforced on every run so
a future query can't silently introduce one (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_algotrading_env_spark.plans import SMJ_ALLOWED, census_violations
from polygon_algotrading_env_spark.plans.census import DIM_TABLES, SMJ_BUDGET
from polygon_algotrading_env_spark.plans.inspect import smj_sides
from polygon_algotrading_env_spark.queries import REGISTRY


def test_registry_plan_census_clean(spark, sf_dir):
    violations = census_violations(spark, sf_dir)
    assert not violations, (
        f"{len(violations)} scale-killer plan shapes: {violations}"
    )


def test_smj_allowlist_entries_still_exist():
    """A stale allowlist entry means a query was renamed/removed without
    updating the census — tighten rather than accumulate."""
    stale = SMJ_ALLOWED - set(REGISTRY)
    assert not stale, f"SMJ_ALLOWED entries not in registry: {stale}"
    stale_budget = set(SMJ_BUDGET) - SMJ_ALLOWED
    assert not stale_budget, f"SMJ_BUDGET entries not allowlisted: {stale_budget}"


def test_smj_dim_side_detector_catches_lost_broadcast(spark, sf_dir):
    """The allowlist is not a blank cheque: a dim-table side that loses its
    broadcast and sort-merges must be detected even inside an allowlisted
    query. Forge the failure mode directly — join lineitem to part with
    broadcasting disabled — and assert smj_sides exposes the dim-only side
    the census flags."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
            "l_orderkey", "p_name", F.col("l_quantity")
        )
        sides = smj_sides(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert sides, "forged no-broadcast join did not plan a SortMergeJoin"
    dim_only = [
        side
        for left, right in sides
        for side in (left, right)
        if side and side <= DIM_TABLES
    ]
    assert dim_only, f"dim-only side not detected in {sides}"
