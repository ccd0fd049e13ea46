"""Global ordinal assignment without a single-partition sort.

``row_number() OVER (ORDER BY ...)`` — the obvious way to number rows —
collapses the whole relation into ONE task (Spark plans a global-order
Window with a single partition): a non-starter beyond a few million rows.
The scalable plan is the classic two-phase zipWithIndex, DataFrame-native:

1. range-repartition + local sort by the ordering key (the same machinery
   ``orderBy`` uses — balanced partitions via range sampling);
2. count rows per partition (a metadata-sized driver collect, one row per
   partition — same bounded-scalar class as the z-order bounds collect,
   layout.py);
3. number rows within each partition and add the exclusive prefix-sum of
   partition counts, delivered as a broadcast (pid → base) join.

Deterministic whenever the ordering key is unique (append a tiebreak
column if it isn't). The reference touches this only as pandas' implicit
RangeIndex; at 100 TB ordinals are how you shard corpora into numbered
training chunks without ever materializing a global sort on one machine.
"""

from __future__ import annotations

import itertools
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
    by ``order_cols``, computed with per-partition windows only.

    Equivalent to ``row_number() OVER (ORDER BY order_cols)`` (certified
    against exactly that oracle) but every stage is parallel: the widest
    window this plan sorts is one range-partition, not the world.

    The range-partitioned relation is pinned with an eager local
    checkpoint before anything reads it: range partitioning samples its
    boundaries, and without pinning, the counts job and the numbering job
    could recompute the lineage with DIFFERENT boundaries — silently
    corrupting ordinals. (On a cluster, write the partitioned relation to
    a silver table instead; localCheckpoint pins it to executor storage.)
    """
    cols = list(order_cols)
    if not cols:
        raise ValueError("order_cols must name at least one column")
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    pinned = parted.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    # One row per partition — bounded by the partition count, never
    # data-sized. Partitions are range-ordered by construction, so the
    # ordinal base of partition p is start + sum(counts of partitions < p).
    count_rows = pinned.groupBy("__pid").count().orderBy("__pid").collect()
    pids = [r["__pid"] for r in count_rows]
    bases = list(
        itertools.accumulate((r["count"] for r in count_rows), initial=start)
    )[: len(pids)]
    base_df = pinned.sparkSession.createDataFrame(
        list(zip(pids, bases)) or [(0, start)], "__pid int, __base bigint"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        pinned.join(F.broadcast(base_df), "__pid")
        .withColumn(
            ordinal_col,
            (F.row_number().over(w) - 1 + F.col("__base")).cast("bigint"),
        )
        .drop("__pid", "__base")
    )
