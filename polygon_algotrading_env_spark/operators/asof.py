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
sort-merge join, with no row explosion.

Hot keys: window partitioning is NOT covered by AQE's skew-join split
(that optimization applies to sort-merge joins only) — a mega-hot ticker
lands in ONE task's sort. Parallelism is bounded by the number of distinct
keys and the hottest key's row count. When one key's rows exceed what a
single task should sort (rule of thumb: keep per-task sort input under
``spark.sql.files.maxPartitionBytes``-sized chunks), use
:func:`asof_join_chunked`, which partitions each key's timeline into
time buckets and carries boundary state across them — restoring
parallelism ≈ keys × chunks at the cost of one tiny extra aggregate +
window over per-(key, chunk) boundary rows.
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


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    chunk_seconds: int,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Hot-key-safe as-of join: LOCF within (key, time-chunk) partitions.

    Identical results to :func:`asof_join` (equivalence is test-asserted),
    but the big window partitions by (key, chunk) instead of key, so a
    mega-hot key's timeline is sorted by ``timespan / chunk_seconds`` tasks
    in parallel instead of one.

    Boundary state is carried across chunks in three cheap steps on
    per-(key, chunk) BOUNDARY rows (one row per key per chunk — thousands,
    not billions, at 100 TB):

    1. per (key, chunk) of the right side, reduce to the boundary row (the
       winning right row under the as-of ordering) with one hash
       ``max_by`` — no window, no sort of the full data;
    2. one window over the tiny boundary relation computes each LEFT
       chunk's carry-in: the winning boundary among strictly-earlier
       (backward) / strictly-later (forward) chunks;
    3. inject each carry-in as a synthetic right row into its left chunk,
       then run the standard union+LOCF plan with ``chunk`` added to the
       partition keys.

    A carried-in row's timestamp lies strictly outside the receiving chunk
    (earlier for backward, later for forward), so exact-match semantics
    are unaffected.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if chunk_seconds <= 0:
        raise ValueError("chunk_seconds must be positive")

    from pyspark.sql.types import DateType, TimestampNTZType

    def chunk_of(df: DataFrame, c: str):
        # TIMESTAMP_NTZ/DATE have no direct double cast; route through
        # TIMESTAMP (session-TZ shift applies identically to both sides, so
        # bucket alignment — which correctness never depends on — is moot).
        col = F.col(c)
        if isinstance(df.schema[c].dataType, (TimestampNTZType, DateType)):
            col = col.cast("timestamp")
        return F.floor(col.cast("double") / chunk_seconds)

    lc = left.withColumn("__chunk", chunk_of(left, left_ts))
    rc = right.withColumn("__chunk", chunk_of(right, right_ts))

    # 1. Right-side boundary row per (key, chunk): the row LOCF would carry
    # out of the chunk. Backward: max (ts, tie); forward: min ts, max tie.
    r_struct = F.struct(*[F.col(c) for c in right.columns])
    tie = F.col(tie_break).cast("double") if tie_break else F.lit(0.0)
    if direction == "backward":
        order_key = F.struct(F.col(right_ts), tie)
        reducer = F.max_by(r_struct, order_key)
    else:
        order_key = F.struct(F.col(right_ts), -tie)
        reducer = F.min_by(r_struct, order_key)
    boundaries = rc.groupBy(*keys, "__chunk").agg(reducer.alias("__b"))

    # 2. Carry-in per left chunk: LOCF over the boundary relation itself,
    # with same-chunk boundaries sorted AFTER the marker so only strictly
    # prior (or later, forward) chunks are visible to it.
    markers = lc.select(*keys, "__chunk").distinct().withColumn("__m", F.lit(1))
    bm = boundaries.withColumn("__m", F.lit(0)).unionByName(
        markers.withColumn("__b", F.lit(None).cast(boundaries.schema["__b"].dataType)),
    )
    chunk_order = F.col("__chunk").asc() if direction == "backward" else F.col("__chunk").desc()
    wc = (
        Window.partitionBy(*keys)
        .orderBy(chunk_order, F.col("__m").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        bm.withColumn("__carry", F.last("__b", ignorenulls=True).over(wc))
        .filter((F.col("__m") == 1) & F.col("__carry").isNotNull())
        .select(*keys, "__chunk", "__carry")
    )

    # 3. Materialize carry-ins as synthetic right rows inside their target
    # chunk; their real timestamps lie strictly outside the chunk, so they
    # sort before (backward) / after (forward) every native row.
    injected = carry.select(
        *keys,
        "__chunk",
        *[F.col("__carry")[c].alias(c) for c in right.columns if c not in keys],
    )
    r_aug = rc.select(*keys, "__chunk", *[c for c in right.columns if c not in keys]).unionByName(
        injected
    )

    out = asof_join(
        lc,
        r_aug,
        on=[*keys, "__chunk"],
        left_ts=left_ts,
        right_ts=right_ts,
        direction=direction,
        allow_exact_matches=allow_exact_matches,
        tie_break=tie_break,
        suffix=suffix,
    )
    return out.drop("__chunk")
