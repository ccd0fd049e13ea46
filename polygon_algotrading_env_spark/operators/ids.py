"""Global ordinal assignment without a single-partition sort.

``row_number() OVER (ORDER BY ...)`` — the obvious way to number rows —
collapses the whole relation into ONE task (Spark plans a global-order
Window with a single partition): a non-starter beyond a few million rows.
The scalable plan is the classic two-phase zipWithIndex, DataFrame-native:

1. range-repartition + local sort by the ordering key (the same machinery
   ``orderBy`` uses — balanced partitions via range sampling), then stamp
   each row with ``monotonically_increasing_id()`` — which is
   ``partition-local position`` plus a per-partition offset, so within a
   partition consecutive rows get consecutive ids;
2. per-partition stats (row count + min id) → exclusive prefix-sum of
   counts in pid order — a partitions-sized relation, never data-sized;
3. broadcast the (pid → base, min-id) map back and emit
   ``ordinal = base + (id - min_id)``.

Everything happens in ONE query execution: the stats branch and the
numbering branch share the range exchange (Spark's exchange reuse — the
shuffle is written once and both sides read it), so the range-sampled
partition boundaries are computed exactly once and no checkpoint /
driver-side count collect is needed. Within a single execution the
partitioner instance is fixed, so even shuffle-retry recomputation reuses
the same boundaries. (The previous revision pinned the relation with an
eager ``localCheckpoint`` and collected per-partition counts to the
driver — three jobs plus a full executor-storage write; this shape is the
same answer at a fraction of the constant cost.)

Deterministic whenever the ordering key is unique (append a tiebreak
column if it isn't; with ties the assignment among tied rows is
arbitrary-but-valid, exactly like ``row_number``). The reference touches
this only as pandas' implicit RangeIndex; at 100 TB ordinals are how you
shard corpora into numbered training chunks without ever materializing a
global sort on one machine.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_global_ordinals(
    df: DataFrame,
    order_cols: Sequence[str],
    ordinal_col: str = "ordinal",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``ordinal_col`` = the row's 1-based position under a global sort
    by ``order_cols``, computed with per-partition work only.

    Equivalent to ``row_number() OVER (ORDER BY order_cols)`` (certified
    against exactly that oracle) but every stage is parallel: the widest
    sort this plan runs is one range-partition, not the world, and the
    full relation is shuffled exactly once (the stats side reads the same
    exchange via reuse; the pid→base map comes back as a broadcast, so
    the numbering side needs no second shuffle — there is no
    ``Window.partitionBy(pid)`` hash exchange in this plan).
    """
    cols = list(order_cols)
    if not cols:
        raise ValueError("order_cols must name at least one column")
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    stamped = (
        parted.sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    # Partitions-sized, never data-sized: one row per (non-empty) range
    # partition. count is order-independent and min(__mid) is the
    # partition's id-block offset, so tied sort keys cannot desync the
    # two branches. The prefix-sum window runs over this tiny relation
    # only — pid order IS global range order by construction.
    stats = stamped.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"), F.min("__mid").alias("__mid0")
    )
    w_prev = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = stats.select(
        "__pid",
        "__mid0",
        (F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)) + F.lit(start))
        .cast("bigint")
        .alias("__base"),
    )
    return (
        stamped.join(F.broadcast(bases), "__pid")
        .withColumn(
            ordinal_col,
            (F.col("__base") + F.col("__mid") - F.col("__mid0")).cast(
                "bigint"
            ),
        )
        .drop("__pid", "__mid", "__mid0", "__base")
    )
