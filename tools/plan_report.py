"""Plan-shape census over the whole query registry.

Builds (but does not execute) every registered query at a small SF and
tabulates physical-plan stats — shuffle exchanges, broadcast vs sort-merge
joins, top-k operators, scan column widths — the audit behind
ARCHITECTURE.md's shuffle-economics claims. Run it after adding operators
to catch silent plan regressions (a dim join degrading to sort-merge, a
top-k degrading to a global sort) before they cost anything at scale.

Usage:
    python tools/plan_report.py [sf_dir] [query ...]

Output: one TSV row per query (name, shuffles, broadcast joins, SMJ,
BNLJ, take-ordered, scans) plus a summary; exit 1 if any query plans a
sort-merge join off the documented allowlist or a BroadcastNestedLoopJoin
over an unbounded broadcast side.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polygon_algotrading_env_spark.plans import plan_stats  # noqa: E402
from polygon_algotrading_env_spark.queries import REGISTRY  # noqa: E402
from polygon_algotrading_env_spark.session import get_spark  # noqa: E402

from polygon_algotrading_env_spark.plans.census import (  # noqa: E402
    BNLJ_ALLOWED,
    SMJ_ALLOWED,
    _bnlj_violation,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark(
        app_name="plan-report", master="local[4]", shuffle_partitions=8
    )
    bad: list[str] = []
    print("query\tshuffles\tbcast\tsmj\tbnlj\ttopk\tscans")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            st = plan_stats(df)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}\tERROR: {type(e).__name__}: {e}")
            bad.append(name)
            continue
        flag = ""
        if st.sort_merge_joins and name not in SMJ_ALLOWED:
            flag = "  <-- UNEXPECTED SMJ"
            bad.append(name)
        elif (
            st.bnl_joins
            and name not in BNLJ_ALLOWED
            and _bnlj_violation(df) is not None
        ):
            flag = "  <-- UNBOUNDED BNLJ BROADCAST"
            bad.append(name)
        print(
            f"{name}\t{st.shuffle_exchanges}\t{st.broadcast_joins}"
            f"\t{st.sort_merge_joins}\t{st.bnl_joins}\t{st.take_ordered}"
            f"\t{len(st.read_schemas)}{flag}"
        )
    print(f"\n{len(names)} queries, {len(bad)} flagged", file=sys.stderr)
    if bad:
        print("flagged: " + ", ".join(bad), file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
