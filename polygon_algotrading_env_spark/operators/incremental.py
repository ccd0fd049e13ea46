"""Incremental materialized views: maintain a gold aggregate from a
versioned table's change feed instead of recomputing it.

The reference recomputes everything daily (full API refetch per ticker);
the scale-correct pattern is: tail ``VersionedTable.read_changes`` for the
rows ADDED since the view's last refresh, aggregate ONLY those, and merge
into the stored view with an associative combine. OHLCV bars are exactly
mergeable because :func:`operators.bars.ohlcv_bars` carries the merge
bookkeeping (``notional``, ``open_ord``/``close_ord``) that makes the
rollup associative — merging same-duration partial bars IS
:func:`operators.bars.resample_bars` at the same duration.

Only buckets the delta touches are re-merged: untouched view rows are
carried over by an anti join, so refresh cost tracks the delta, not the
table. At cluster scale the carry-over becomes dynamic partition
overwrite on a date-partitioned view; the swap here is the same
write-to-temp + rename used by ``compact_parquet``.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from polygon_algotrading_env_spark.operators.bars import ohlcv_bars, resample_bars

# Lives INSIDE data/ so the tmp->data rename swaps rows and watermark
# atomically: a crash can never leave new data with an old version stamp
# (which would re-merge an already-applied delta on the next refresh).
# The underscore prefix makes Spark's parquet reader ignore it, like
# _SUCCESS.
_META = "_view_meta.json"


def _meta_path(view_root: str) -> str:
    return os.path.join(view_root, "data", _META)


def view_last_version(view_root: str) -> int | None:
    try:
        with open(_meta_path(view_root)) as f:
            return int(json.load(f)["last_version"])
    except FileNotFoundError:
        return None


def refresh_bar_view(
    spark: SparkSession,
    table,
    view_root: str,
    ts_col: str,
    price_col: str,
    duration: str,
    keys: Sequence[str] = (),
    volume_col: str | None = None,
    order_col: str | None = None,
) -> int | None:
    """Bring the materialized OHLCV view at ``view_root`` up to ``table``'s
    latest version. Returns the number of rows in the refreshed view, or
    None when the view is already current.

    Incremental contract: only APPEND commits happened since the last
    refresh (``read_changes`` raises otherwise — an overwrite/delete
    invalidates row-level deltas, so the caller rebuilds by deleting the
    view directory and calling again, which takes the full-build branch).
    """
    data_dir = os.path.join(view_root, "data")
    latest = table.latest_version()
    if latest is None:
        return None
    last = view_last_version(view_root)
    if last is not None and last >= latest:
        return None

    if last is None:
        source = table.read()
        merged = ohlcv_bars(
            source, ts_col, price_col, duration,
            keys=keys, volume_col=volume_col, order_col=order_col,
        )
    else:
        delta = table.read_changes(last + 1, latest)
        delta_bars = ohlcv_bars(
            delta, ts_col, price_col, duration,
            keys=keys, volume_col=volume_col, order_col=order_col,
        )
        stored = spark.read.parquet(data_dir)
        join_keys = [*keys, "bucket_start"]
        touched_keys = delta_bars.select(*join_keys).dropDuplicates()
        untouched = stored.join(touched_keys, join_keys, "left_anti")
        touched_stored = stored.join(touched_keys, join_keys, "left_semi")
        # Same-duration resample merges partial bars of the same bucket:
        # every bucket_start maps to its own window, and the combine is
        # the bars' associative bookkeeping.
        remerged = resample_bars(
            touched_stored.unionByName(delta_bars), duration, keys=keys
        )
        merged = untouched.unionByName(remerged)

    tmp = data_dir + ".__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.parquet(tmp)
    n = spark.read.parquet(tmp).count()
    with open(os.path.join(tmp, _META), "w") as f:
        json.dump({"last_version": latest}, f)
    old = data_dir + ".__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(data_dir):
        os.rename(data_dir, old)
    os.rename(tmp, data_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n


def read_bar_view(spark: SparkSession, view_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(view_root, "data"))
