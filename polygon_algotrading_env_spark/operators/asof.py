"""As-of join: for each left row, the nearest right row at-or-before (or
at-or-after) its timestamp, per join key.

The reference delegates this semantics to Polygon's ``adjusted=true/false``
API parameter (split/dividend-adjusted candles —
``v2022/etl-containers/aggregates/src/aggregates_etl.py:67,79-85,110``,
``polygon-etl-container/src/main.py:43-44``); our engine owns it natively
(SURVEY.md §2.5 J3, §7 stage 4a).

Spark has no native as-of join, and a naive range join
(``l.ts >= r.ts`` + argmax) is O(n·m) per key. This implementation is the
scalable union + last-observation-carried-forward plan:

1. union left and right rows into one relation tagged by side;
2. single shuffle: ``Window.partitionBy(keys).orderBy(ts, side, tie)``;
3. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
   frame carries the most recent right row forward onto each left row.

Cost: ONE shuffle + sort of |L|+|R| rows — the same cost profile as a
sort-merge join, with no row explosion. Skewed keys (hot tickers) are
handled by AQE skew-split since the window partitions by join key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left-outer as-of join.

    Parameters
    ----------
    on : equality join key(s).
    left_ts / right_ts : ordering columns (timestamp or any orderable type;
        both sides must be the same type).
    direction : 'backward' (nearest right row at-or-before the left ts) or
        'forward' (nearest at-or-after).
    allow_exact_matches : if False, 'backward' means strictly-before and
        'forward' strictly-after.
    tie_break : optional right-side column; among right rows sharing the
        same (key, ts) the one with the greatest tie_break value wins,
        making the result deterministic.
    suffix : appended to right columns that collide with left column names.

    Returns all left columns plus all right columns (minus the join keys).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")

    left_cols = left.columns
    right_payload_cols = [c for c in right.columns if c not in keys]
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in right_payload_cols
    }

    # One LOCF pass serves both directions: 'forward' just sorts descending.
    # Exactness is encoded in the side-ordering: for inclusive matches the
    # right row must sort BEFORE a left row at the same ts; for exclusive
    # matches, after.
    sign = 1 if direction == "backward" else -1
    right_first = allow_exact_matches  # inclusive → right sorts first on ties

    l_tagged = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("double").alias("__tie"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(None).cast(
            left.select(F.struct(*left_cols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_payload_cols).alias("__r"),
        F.lit(0).alias("__is_left"),
        (F.col(tie_break).cast("double") if tie_break else F.lit(0.0)).alias("__tie"),
    )

    unioned = l_tagged.unionByName(r_tagged)

    if sign == 1:
        ts_order = F.col("__ts").asc()
    else:
        ts_order = F.col("__ts").desc()
    side_order = F.col("__is_left").asc() if right_first else F.col("__is_left").desc()
    # Among same-(key, ts) right rows the winning one must sort LAST so that
    # last() picks it: ascending tie order.
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, side_order, F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = unioned.withColumn("__r_carry", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left_cols],
        *[F.col("__r_carry")[c].alias(out_names[c]) for c in right_payload_cols],
    )
    return out
