"""Range (interval) join — match rows by a numeric/time band, not equality.

The as-of join answers "latest right row at-or-before"; the range join
answers "ALL right rows within a band of the left row" (point-in-window
lookups, ±tolerance matching of two event streams, interval overlap).
Spark executes a bare non-equi condition as BroadcastNestedLoopJoin —
O(|L|·|R|) and a cluster-killer on two fact tables.

The scale plan is bucket-and-prune (the public Databricks/Iceberg
"binned range join" strategy): quantize the range dimension into
``bucket_width`` cells, equi-join on the cell id (each left row probes
only the cells its band can reach), then apply the exact band predicate.
Cost: explode factor = ceil(band/bucket_width)+1 cells per left row, one
balanced hash shuffle on (cell [, keys]), zero row explosion beyond true
matches + same-cell candidates. With ``bucket_width ≈ band`` the probe
factor is ~2×.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    low: float,
    high: float,
    on: Sequence[str] | str = (),
    bucket_width: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of every left row to the right rows with
    ``left_val + low <= right_val <= left_val + high`` (plus optional
    equality keys ``on``).

    ``bucket_width`` defaults to the band width (probe factor ~2). Values
    are compared on their numeric cast (timestamps ⇒ epoch seconds), so
    ``low``/``high``/``bucket_width`` are in those units.
    """
    if high < low:
        raise ValueError(f"empty band: low={low} high={high}")
    keys = [on] if isinstance(on, str) else list(on)
    width = bucket_width or (high - low) or 1.0
    if width <= 0:
        raise ValueError("bucket_width must be positive")

    left_cols = left.columns
    right_renames = {
        c: (c + suffix if c in left_cols and c not in keys else c)
        for c in right.columns
        if c not in keys
    }

    lv = F.col(left_val).cast("double")
    rv = F.col(right_val).cast("double")
    # Left probes every cell its band [lv+low, lv+high] intersects.
    first_cell = F.floor((lv + F.lit(low)) / F.lit(width)).cast("long")
    last_cell = F.floor((lv + F.lit(high)) / F.lit(width)).cast("long")
    l_cells = left.withColumn(
        "__cell", F.explode(F.sequence(first_cell, last_cell))
    ).withColumn("__lv", lv)
    r_cells = right.select(
        *[F.col(c) for c in keys],
        F.floor(rv / F.lit(width)).cast("long").alias("__cell"),
        rv.alias("__rv"),
        *[F.col(c).alias(n) for c, n in right_renames.items()],
    )
    out = (
        l_cells.join(r_cells, on=[*keys, "__cell"])
        .filter(
            (F.col("__rv") >= F.col("__lv") + F.lit(low))
            & (F.col("__rv") <= F.col("__lv") + F.lit(high))
        )
        # A right row in cell c is matched once per (left row, cell) pair,
        # and each left row probes a cell at most once — no dedup needed.
        .drop("__cell", "__lv", "__rv")
    )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] | str = (),
    bucket_width: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of interval pairs that OVERLAP:
    ``left_start <= right_end AND right_start <= left_end`` (closed
    intervals, plus optional equality keys).

    Same bucket-and-prune shape: both sides explode to the cells their
    interval covers and equi-join on cell. An overlapping pair meets in
    every shared cell, so the join keeps a pair only in its FIRST shared
    cell — ``cell == floor(max(starts)/width)`` — which dedupes without
    any distinct shuffle. ``bucket_width`` defaults to the mean left
    interval length (one aggregate); long intervals cost proportionally
    more cells — cap pathological interval lengths upstream.
    """
    keys = [on] if isinstance(on, str) else list(on)
    ls, le = F.col(left_start).cast("double"), F.col(left_end).cast("double")
    rs, re_ = F.col(right_start).cast("double"), F.col(right_end).cast("double")
    if bucket_width is None:
        row = left.agg(F.avg(le - ls).alias("w")).collect()[0]
        bucket_width = max(float(row["w"] or 1.0), 1e-9)

    left_cols = left.columns
    right_renames = {
        c: (c + suffix if c in left_cols and c not in keys else c)
        for c in right.columns
        if c not in keys
    }
    w = float(bucket_width)

    def cells(start, end):
        return F.sequence(
            F.floor(start / F.lit(w)).cast("long"),
            F.floor(end / F.lit(w)).cast("long"),
        )

    l_cells = left.withColumn("__cell", F.explode(cells(ls, le)))
    r_cells = right.select(
        *[F.col(c) for c in keys],
        F.explode(cells(rs, re_)).alias("__cell"),
        rs.alias("__rs"),
        re_.alias("__re"),
        *[F.col(c).alias(n) for c, n in right_renames.items()],
    )
    first_shared = F.floor(
        F.greatest(ls, F.col("__rs")) / F.lit(w)
    ).cast("long")
    out = (
        l_cells.join(r_cells, on=[*keys, "__cell"])
        .filter(
            (ls <= F.col("__re"))
            & (F.col("__rs") <= le)
            & (F.col("__cell") == first_shared)
        )
        .drop("__cell", "__rs", "__re")
    )
    return out
