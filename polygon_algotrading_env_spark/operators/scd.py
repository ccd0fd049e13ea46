"""Slowly-changing-dimension maintenance (type 2): keep history when a
dimension refresh changes attributes.

The reference full-replaces its dims daily (``to_sql(if_exists=
'replace')``, reference_data_etl.py:67) — losing every prior state; its
timestamped CSV history (reference_endpoints_etl.py:61) keeps raw
snapshots but nothing queryable. SCD2 is the warehouse-native answer:
one row per (key, validity interval), ``valid_to IS NULL`` marking the
current row.

``scd2_apply`` diffs the incoming snapshot against the current rows and
produces the next SCD2 state in one pass of DataFrame algebra:

- unchanged current rows carry over untouched;
- changed rows are CLOSED (``valid_to = batch_ts``) and a new open row
  inserted;
- brand-new keys get an open row; keys absent from the snapshot are
  closed (deletions tracked, not dropped).

Every comparison is a hash equi-join on the key — history rows
(``valid_to IS NOT NULL``) are carried over by construction without ever
being scanned against the snapshot, so the work tracks |current| +
|snapshot|, not table history.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def scd2_init(
    snapshot: DataFrame, valid_from, ts_type: str = "timestamp"
) -> DataFrame:
    """First load: every snapshot row becomes an open SCD2 row."""
    return snapshot.withColumn(
        "valid_from", F.lit(valid_from).cast(ts_type)
    ).withColumn("valid_to", F.lit(None).cast(ts_type))


def scd2_apply(
    scd: DataFrame,
    snapshot: DataFrame,
    key_cols: Sequence[str],
    batch_ts,
    ts_type: str = "timestamp",
) -> DataFrame:
    """Produce the next SCD2 state from the current one + a full snapshot.

    ``scd`` must carry ``valid_from``/``valid_to``; attribute columns are
    everything else except the keys. NULL-safe comparison (``eqNullSafe``)
    so NULL→value and value→NULL both count as changes.
    """
    keys = list(key_cols)
    attrs = [
        c for c in snapshot.columns if c not in keys
    ]
    missing = [c for c in keys + attrs if c not in scd.columns]
    if missing:
        raise ValueError(f"scd table lacks snapshot columns: {missing}")
    ts = F.lit(batch_ts).cast(ts_type)

    history = scd.where(F.col("valid_to").isNotNull())
    current = scd.where(F.col("valid_to").isNull())

    # Presence on the snapshot side comes from an explicit marker, not an
    # attribute's NULL-ness — all-NULL attribute rows are still present.
    snap_marked = snapshot.select(
        *keys, F.lit(True).alias("__present"),
        *[F.col(c).alias(f"__new_{c}") for c in attrs],
    )
    j = current.join(snap_marked, keys, "full_outer")
    in_current = F.col("valid_from").isNotNull()
    in_snap = F.col("__present").isNotNull()

    changed = F.lit(False)
    for c in attrs:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))

    # 1) unchanged current rows (present both sides, same attrs)
    unchanged = j.where(in_current & in_snap & ~changed).select(
        *keys, *attrs, "valid_from", "valid_to"
    )
    # 2) closed rows: attr change or key deletion
    closed = j.where(in_current & (~in_snap | changed)).select(
        *keys, *attrs, "valid_from", ts.alias("valid_to")
    )
    # 3) new open rows: new key or changed attrs
    opened = j.where(in_snap & (~in_current | changed)).select(
        *keys,
        *[F.col(f"__new_{c}").alias(c) for c in attrs],
        ts.alias("valid_from"),
        F.lit(None).cast(ts_type).alias("valid_to"),
    )
    return (
        history.select(*keys, *attrs, "valid_from", "valid_to")
        .unionByName(unchanged)
        .unionByName(closed)
        .unionByName(opened)
    )


def scd2_current(scd: DataFrame) -> DataFrame:
    return scd.where(F.col("valid_to").isNull())


def scd2_as_of(scd: DataFrame, ts) -> DataFrame:
    """Dimension state as of ``ts``: rows whose validity interval covers it."""
    t = F.lit(ts).cast("timestamp")
    return scd.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
