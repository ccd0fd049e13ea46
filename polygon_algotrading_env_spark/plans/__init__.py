"""Physical-plan inspection utilities.

Scale regressions rarely change answers — they change plans (a lost
pushdown, a broadcast that became a shuffle, an extra exchange). These
helpers expose the executed plan's load-bearing properties so tests can
pin them (SURVEY.md §4).
"""

from polygon_algotrading_env_spark.plans.inspect import (  # noqa: F401
    plan_stats,
    plan_string,
)
from polygon_algotrading_env_spark.plans.census import (  # noqa: F401
    SMJ_ALLOWED,
    census_violations,
)
