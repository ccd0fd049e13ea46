"""Column profiling — the data-quality summary a pipeline runs before
training on (or backtesting against) a new table drop.

One aggregate job produces per-column row counts, null counts, and
distinct cardinalities, reshaped to one row per column.  At 100 TB note
the cost model: k exact ``count(DISTINCT)`` in one aggregate makes
Catalyst plan an Expand (k× the scan rows through the shuffle).  That is
the right trade for a handful of columns; for wide tables pass
``exact=False`` to use HyperLogLog++ sketches (``approx_count_distinct``,
single pass, no Expand, ~2% error).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def column_profile(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """Profile ``cols`` → rows of (col_name, n_rows, n_nonnull, n_distinct)."""
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nonnull, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct")


class SchemaContractError(ValueError):
    """A DataFrame violated its declared schema contract."""


def assert_schema_contract(
    df: DataFrame,
    required: dict[str, str],
    allow_extra: bool = True,
    forbid_nullable: Sequence[str] = (),
) -> DataFrame:
    """Data contract at a pipeline boundary: required column→type pairs
    (Spark simpleString names, e.g. ``bigint``/``double``/
    ``array<float>``), optionally a closed-world check (``allow_extra=
    False``) and columns that must be declared non-nullable. Raises
    ``SchemaContractError`` listing EVERY violation at once (a contract
    report, not a first-failure trip), else returns ``df`` unchanged for
    fluent use: ``write(assert_schema_contract(df, CONTRACT))``.

    This is the analysis-time guard — zero jobs, zero scans; pair it with
    ``column_profile`` for the data-level checks (nulls actually present,
    cardinality drift). The reference has no such boundary, which is how
    its silent schema drift failure mode ships (CSV column reorder between
    latest and history zones would go unnoticed until a consumer breaks).
    """
    actual = {f.name: f for f in df.schema.fields}
    problems: list[str] = []
    for name, typ in required.items():
        f = actual.get(name)
        if f is None:
            problems.append(f"missing column {name!r} ({typ})")
        elif f.dataType.simpleString() != typ:
            problems.append(
                f"column {name!r} is {f.dataType.simpleString()}, contract says {typ}"
            )
    if not allow_extra:
        extras = [n for n in actual if n not in required]
        if extras:
            problems.append(f"unexpected columns {sorted(extras)}")
    for name in forbid_nullable:
        f = actual.get(name)
        if f is not None and f.nullable:
            problems.append(f"column {name!r} must be non-nullable")
    if problems:
        raise SchemaContractError("; ".join(problems))
    return df
