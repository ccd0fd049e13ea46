"""Registry-wide plan census as a pytest gate: no query may plan a
scale-killer shape (unexpected sort-merge join, any cartesian product)
— the audit tools/plan_report.py runs by hand, enforced on every run so
a future query can't silently introduce one (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_algotrading_env_spark.plans import SMJ_ALLOWED, census_violations
from polygon_algotrading_env_spark.plans.census import (
    BNLJ_ALLOWED,
    DIM_TABLES,
    SMJ_BUDGET,
    _bnlj_violation,
)
from polygon_algotrading_env_spark.plans.inspect import bnlj_broadcast_sides, smj_sides
from polygon_algotrading_env_spark.queries import REGISTRY


def test_registry_plan_census_clean(spark, sf_dir):
    violations = census_violations(spark, sf_dir)
    assert not violations, (
        f"{len(violations)} scale-killer plan shapes: {violations}"
    )


def test_gated_queries_census_clean_in_zoned_shape(spark, sf_dir, monkeypatch):
    """The full-registry census above sees the GLOBAL shape at fixture
    scale (the adaptive gate); the zoned shape the 100 TB path takes must
    pass the same scale-killer rules. (A one-off full-registry census
    under SPARK_GRAFT_ZONING=zoned also ran clean in round 11 — only
    these seven queries change shape with the gate.)"""
    monkeypatch.setenv("SPARK_GRAFT_ZONING", "zoned")
    from polygon_algotrading_env_spark.operators.zonedroll import (
        GATED_QUERIES,
    )

    violations = census_violations(spark, sf_dir, names=list(GATED_QUERIES))
    assert not violations, violations


def test_smj_allowlist_entries_still_exist():
    """A stale allowlist entry means a query was renamed/removed without
    updating the census — tighten rather than accumulate."""
    stale = SMJ_ALLOWED - set(REGISTRY)
    assert not stale, f"SMJ_ALLOWED entries not in registry: {stale}"
    stale_budget = set(SMJ_BUDGET) - SMJ_ALLOWED
    assert not stale_budget, f"SMJ_BUDGET entries not allowlisted: {stale_budget}"


def test_bnlj_allowlist_entries_still_exist():
    stale = BNLJ_ALLOWED - set(REGISTRY)
    assert not stale, f"BNLJ_ALLOWED entries not in registry: {stale}"


def test_bnlj_detector_flags_multi_row_broadcast(spark, sf_dir):
    """The BNLJ idiom is not a blank cheque: a broadcast side that is a
    plain multi-row relation (no scalar aggregate, no limit) must be
    flagged. Forge it — crossJoin against a broadcast of raw part rows —
    and assert the census helper reports the violation; then check the
    documented scalar idiom (crossJoin against a 1-row global aggregate)
    passes clean."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_name")

    forged = li.crossJoin(F.broadcast(part))
    sides = bnlj_broadcast_sides(forged)
    assert sides, "forged broadcast crossJoin did not plan a BNLJ"
    assert _bnlj_violation(forged) is not None, (
        "multi-row broadcast side not flagged"
    )

    scalar = li.crossJoin(F.broadcast(li.agg(F.max("l_quantity").alias("mx"))))
    assert _bnlj_violation(scalar) is None, (
        "documented scalar-aggregate idiom wrongly flagged"
    )


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
