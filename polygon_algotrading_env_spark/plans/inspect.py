from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, execute: bool = False) -> str:
    """Executed physical plan text.

    With ``execute=True`` the DataFrame is collected first so AQE finalizes
    THIS QueryExecution — codegen stage markers (``*(n)``) and runtime join
    rewrites only appear in the final plan. (A ``df.write`` action would
    build a separate QueryExecution and leave this one un-finalized.)
    Use only on small results.
    """
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanStats:
    exchanges: int          # shuffle + broadcast exchanges
    shuffle_exchanges: int  # data-moving shuffles only
    broadcast_joins: int
    sort_merge_joins: int
    take_ordered: int       # top-k planned without a global sort
    cartesian_products: int  # CartesianProduct: the no-condition join, never intended
    pushed_filters: tuple[str, ...]
    read_schemas: tuple[str, ...]
    codegen_spans: int

    def reads_only(self, table_cols: dict[str, set[str]]) -> bool:
        """True if every scan's ReadSchema is a subset of the allowed
        columns (column pruning reached the source)."""
        for rs in self.read_schemas:
            cols = set(re.findall(r"(\w+):", rs))
            if not any(cols <= allowed for allowed in table_cols.values()):
                return False
        return True


def plan_stats(df: DataFrame, execute: bool = False) -> PlanStats:
    p = plan_string(df, execute=execute)
    return PlanStats(
        exchanges=len(re.findall(r"\bExchange\b", p)),
        shuffle_exchanges=len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", p)),
        broadcast_joins=p.count("BroadcastHashJoin"),
        sort_merge_joins=p.count("SortMergeJoin"),
        take_ordered=p.count("TakeOrderedAndProject"),
        cartesian_products=p.count("CartesianProduct"),
        pushed_filters=tuple(re.findall(r"PushedFilters: \[([^\]]*)\]", p)),
        read_schemas=tuple(re.findall(r"ReadSchema: struct<([^\n]*)", p)),
        # toString renders codegen stages as "*(n) Operator"; the
        # distinct stage ids are the codegen span count.
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", p))),
    )
