"""Incremental-ingest bookmarks (SURVEY.md §2.10 T1, §7 stage 4b).

The reference discovers each ticker's resume point with an Airflow dance:
list S3 keys (dag_aggregates_etl.py:98-125) → argmax by LastModified
(:64-95) → download latest JSON → max(t) (:128-150) → pass
LATEST_ENTRY_TIMESTAMP as an ECS env var (:222,260-262), consumed by the
container (aggregates_etl.py:66,89-97).

Natively that's a tiny watermark table + one predicate:

    wm = bookmarks.load(spark)
    fresh = incoming.join(wm, keys, 'left').filter(ts > coalesce(wm.max_ts, -inf))

The table is key-per-row, dimension-sized, broadcastable. Updates are
idempotent merges of max(ts) per key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class BookmarkStore:
    """Watermark table on parquet: (key cols..., max_ts, updated_at)."""

    def __init__(self, path: str, key_cols: Sequence[str], ts_col: str = "max_ts"):
        self.path = path
        self.key_cols = list(key_cols)
        self.ts_col = ts_col

    def load(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.path)
        except Exception:  # first run: no bookmark yet
            return None

    def filter_new(self, incoming: DataFrame, event_ts_col: str) -> DataFrame:
        """Keep only rows strictly newer than the stored per-key watermark
        (P3/P4's high-water-mark predicate). Broadcast join: the bookmark
        table has one row per key."""
        spark = incoming.sparkSession
        wm = self.load(spark)
        if wm is None:
            return incoming
        wm = F.broadcast(
            wm.select(*self.key_cols, F.col(self.ts_col).alias("__wm"))
        )
        return (
            incoming.join(wm, on=self.key_cols, how="left")
            .filter(F.col("__wm").isNull() | (F.col(event_ts_col) > F.col("__wm")))
            .drop("__wm")
        )

    def update(self, incoming: DataFrame, event_ts_col: str) -> None:
        """Merge max(event_ts) per key into the store (idempotent: re-runs
        with the same data leave watermarks unchanged)."""
        spark = incoming.sparkSession
        fresh = incoming.groupBy(*self.key_cols).agg(
            F.max(event_ts_col).alias(self.ts_col)
        )
        old = self.load(spark)
        if old is not None:
            merged = (
                old.select(*self.key_cols, self.ts_col)
                .unionByName(fresh)
                .groupBy(*self.key_cols)
                .agg(F.max(self.ts_col).alias(self.ts_col))
            )
        else:
            merged = fresh
        out = merged.withColumn("updated_at", F.current_timestamp())
        # Small table: collect-and-rewrite avoids read/write path conflicts.
        rows = out.collect()
        spark.createDataFrame(rows, out.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.path)
