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
    bnl_joins: int          # BroadcastNestedLoopJoin: fine ONLY over a bounded broadcast
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


def _children(node):
    """Physical-plan children via py4j, descending through AQE's wrapper
    (AdaptiveSparkPlanExec reports no children; the pre-runtime tree hangs
    off initialPlan)."""
    kids = [node.children().apply(i) for i in range(node.children().length())]
    if node.nodeName() == "AdaptiveSparkPlan":
        kids.append(node.initialPlan())
    return kids


def _leaf_sources(node) -> frozenset[str]:
    """Source names under a plan subtree: parquet table stems for file
    scans, otherwise the leaf's nodeName (e.g. 'Scan ExistingRDD' for a
    localCheckpoint of a derived relation)."""
    out: set[str] = set()
    leaves = node.collectLeaves()
    for j in range(leaves.length()):
        s = leaves.apply(j).toString()
        tables = re.findall(r"/(\w+)\.parquet", s)
        out.update(tables if tables else [leaves.apply(j).nodeName()])
    return frozenset(out)


def smj_sides(df: DataFrame) -> list[tuple[frozenset[str], frozenset[str]]]:
    """For every SortMergeJoin in the (initial) physical plan, the source
    tables feeding each side — so a census can assert that an allowlisted
    fact-fact SMJ never quietly gains a dim-table side (a lost broadcast
    hiding behind the allowlist entry)."""
    found: list[tuple[frozenset[str], frozenset[str]]] = []

    def visit(n) -> None:
        if "SortMergeJoin" in n.nodeName():
            kids = _children(n)
            if len(kids) >= 2:
                found.append((_leaf_sources(kids[0]), _leaf_sources(kids[1])))
        for c in _children(n):
            visit(c)

    visit(df._jdf.queryExecution().executedPlan())
    return found


# Shapes that bound a BNLJ broadcast side to scalar/tiny row counts — the
# engine's documented idioms (census.py:9-12): a SCALAR aggregate
# (keys=[] → exactly one row), an explicit Limit, literal in-plan rows
# (LocalTableScan — e.g. a collected codebook), or a ReusedExchange
# (checked where the original exchange is built). A broadcast side with
# NONE of these is an unbounded relation riding a nested-loop join — a
# silent row multiplier the CartesianProduct check can't see.
_BOUNDED_BROADCAST_RE = re.compile(
    r"HashAggregate\(keys=\[\]"
    r"|SortAggregate\(key=\[\]"
    r"|ObjectHashAggregate\(keys=\[\]"
    r"|GlobalLimit|LocalLimit|TakeOrderedAndProject"
    r"|LocalTableScan"
    r"|ReusedExchange"
)


def bnlj_broadcast_sides(df: DataFrame) -> list[tuple[str, bool]]:
    """For every BroadcastNestedLoopJoin in the (initial) physical plan,
    (join head line, broadcast-side-is-bounded) — bounded meaning the
    build subtree contains one of the scalar/tiny idioms above. Lets the
    census assert the BNLJ idiom is never a blank cheque: a `bounds`/
    `edges` relation that silently grows would multiply rows without
    tripping the CartesianProduct or SMJ checks."""
    found: list[tuple[str, bool]] = []

    def visit(n) -> None:
        if "BroadcastNestedLoopJoin" in n.nodeName():
            head = n.toString().splitlines()[0].strip()
            kids = _children(n)
            if len(kids) >= 2:
                build = kids[0] if "BuildLeft" in head else kids[1]
                found.append(
                    (head, bool(_BOUNDED_BROADCAST_RE.search(build.toString())))
                )
        for c in _children(n):
            visit(c)

    visit(df._jdf.queryExecution().executedPlan())
    return found


def plan_stats(df: DataFrame, execute: bool = False) -> PlanStats:
    p = plan_string(df, execute=execute)
    return PlanStats(
        exchanges=len(re.findall(r"\bExchange\b", p)),
        shuffle_exchanges=len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", p)),
        broadcast_joins=p.count("BroadcastHashJoin"),
        sort_merge_joins=p.count("SortMergeJoin"),
        take_ordered=p.count("TakeOrderedAndProject"),
        cartesian_products=p.count("CartesianProduct"),
        bnl_joins=p.count("BroadcastNestedLoopJoin"),
        pushed_filters=tuple(re.findall(r"PushedFilters: \[([^\]]*)\]", p)),
        read_schemas=tuple(re.findall(r"ReadSchema: struct<([^\n]*)", p)),
        # toString renders codegen stages as "*(n) Operator"; the
        # distinct stage ids are the codegen span count.
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", p))),
    )
