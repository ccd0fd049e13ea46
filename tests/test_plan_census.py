"""Registry-wide plan census as a pytest gate: no query may plan a
scale-killer shape (unexpected sort-merge join, any cartesian product)
— the audit tools/plan_report.py runs by hand, enforced on every run so
a future query can't silently introduce one (SURVEY.md §4)."""

from __future__ import annotations

from polygon_algotrading_env_spark.plans import SMJ_ALLOWED, census_violations
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
