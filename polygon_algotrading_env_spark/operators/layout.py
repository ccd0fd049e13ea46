"""Z-order (Morton) data layout — multi-dimensional file/row-group skipping.

The reference prunes by hand-built S3 key paths (one dimension:
``{adjusted}/{ticker}`` — aggregates_etl.py:79-85); partitioned parquet
covers that (writers.py K6). But a 100 TB fact table is filtered on MORE
dimensions than it can be partitioned by (ticker AND date AND price band);
sorting by one column makes its min/max file stats tight and leaves every
other column's stats full-range, so filters on the others skip nothing.

Z-ordering interleaves the bits of several normalized columns into one
sort key, so files are tight in ALL participating dimensions at once
(the public Delta/Iceberg OPTIMIZE ZORDER design). Parquet then skips
files/row-groups via min/max stats on a plain filter — no query-side
changes at all.

Everything is JVM-side bit arithmetic on columns (whole-stage codegen) —
no UDFs; the write is one range repartition + local sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
) -> Column:
    """Morton interleave of ``cols`` (each min/max-normalized to ``bits``
    bits) as one bigint sort key.

    Normalization bounds come from one aggregate over ``df`` (driver-side
    scalars, broadcast into the expression). Linear scaling keeps skew in
    a dimension as skew in its bucket occupancy — for heavy-tailed
    columns, pre-transform (log) or bucket by rank before z-ordering.

    ``bits × len(cols)`` must fit in 63 bits. Raises ``ValueError`` when a
    bound comes back NULL (empty input, or an all-NULL column). Row-level
    NULLs in a z-order column yield a NULL key, which
    ``repartitionByRange`` groups into an arbitrary (but single) range —
    acceptable for layout, just not co-located with any value range.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs >= 2 columns (sort by the column itself otherwise)")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a bigint")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"max_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = bounds[f"min_{j}"], bounds[f"max_{j}"]
        if lo is None or hi is None:
            raise ValueError(
                f"z-order bounds for column {cols[j]!r} are NULL "
                "(empty DataFrame or all-NULL column)"
            )
        span = (hi - lo) or 1.0
        scaled = F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top).cast(
                "long"
            ),
        )
        for i in range(bits):
            bit = F.shiftrightunsigned(scaled, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` laid out in z-order over ``cols``: range-repartition on
    the Morton key (≈ equal-size files covering contiguous z-ranges), sort
    within each partition, drop the key. Filters on ANY of ``cols`` then
    skip non-matching files/row-groups via parquet min/max stats."""
    z = zorder_value(df, cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (bytes): parquet footer totals
    propagated through the optimized plan's stats — free (no job), the
    same number the broadcast-join planner uses. An ESTIMATE: projections
    and filters scale it heuristically; treat it as sizing input, not
    accounting truth."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def repartition_for_target_size(
    df: DataFrame,
    target_mb: int = 256,
    by: Sequence[str] | None = None,
    min_partitions: int = 1,
) -> DataFrame:
    """Repartition so each output partition holds ~``target_mb`` of data,
    from Catalyst's plan-stats size estimate — the write-path sizing
    knob: parquet files in the 100 MB-1 GB band (ARCHITECTURE.md layout
    guidance) instead of whatever the upstream shuffle count left
    behind, with NO extra pass over the data to count it. With ``by``
    the movement is a hash partitioning on those columns (co-locates
    downstream joins/aggs); without, a round-robin rebalance. The
    partition count is a driver-side arithmetic decision, so the plan
    stays deterministic for a fixed input."""
    n = max(
        min_partitions,
        int(estimated_size_bytes(df) // (target_mb * 1024 * 1024)) + 1,
    )
    if by:
        return df.repartition(n, *[F.col(c) for c in by])
    return df.repartition(n)
