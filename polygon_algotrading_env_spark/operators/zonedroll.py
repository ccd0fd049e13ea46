"""Zone-decomposed rolling windows over low-cardinality group keys.

``sum(x) OVER (PARTITION BY key ORDER BY ts ROWS BETWEEN k PRECEDING AND
CURRENT ROW)`` — the shape of every rolling indicator (RSI, rolling
sums, lag deltas, per-group row numbers) — funnels each group's FULL
stream through ONE task per window pass when the key has a handful of
values (``events.event_type`` is ~4-valued; at 100 TB that is four tasks
doing all the work, twice). Bounded ROWS frames are *zone-decomposable*:
split each group's ordered stream into contiguous zones, replicate the
last ``carry`` rows preceding each zone boundary into the zone, and
every original row's frame is complete inside its own zone — identical
to the global single-partition result, in parallel across zones even for
one group.

Pipeline (the range-zone pattern of operators/rankstats.py, applied to
per-row frames instead of grid prefix sums):

1. **Zones** — range-repartition by (keys, order); zone id = physical
   partition id; pin with ``localCheckpoint`` so the tiny side relations
   and the main branch hang off ONE materialization (exchange reuse does
   not fire across these branches — column pruning desyncs their
   ReadSchemas) and sampled zone boundaries can never desync between
   branches. Zones are contiguous per key by lexicographic construction.
2. **Row-number bases** — per-(zone, key) row counts, exclusive prefix
   sum over the zones×keys relation → a real row's global per-key row
   number is its zone base plus its in-zone position. The only window
   that orders by zone runs on the tiny zone relation.
3. **Carry assembly** — candidates = last ``carry`` rows per (zone, key)
   (a zones×keys×carry relation). Per key, candidates take a global
   index in stream order; a candidate feeds target zone z iff its index
   lies in (c(z)−carry, c(z)] where c(z) = number of candidates in zones
   before z — this spans zone gaps AND zones shorter than ``carry``
   (the last-carry-rows-before-z are always a suffix of the candidate
   stream). The index interval has fixed width ``carry``, so assignment
   is an equi-join on the index's carry-wide bucket (each target zone
   explodes to its ≤2 covering buckets) — never a zones×zones product.
4. **Rolling stage** — union real rows (target = home zone) with carry
   replicas (target = fed zone, ``__carry`` = 1): one hash exchange on
   (keys, target zone), parallel across zones for a single group.
   Callers evaluate lag/rolling expressions over the returned
   ``WindowSpec`` and call :meth:`ZonedStream.finish` to drop replicas.

Because carries replicate the exact trailing rows of the global order,
any ROWS-frame expression whose lookback ≤ ``carry`` (and any ``lag`` up
to ``carry``) evaluates bit-identically to the single-partition window —
correctness is zoning-independent, so the sampled range boundaries never
appear in results. Requires (keys, order) to be a TOTAL order (ties
straddling a zone boundary would make "last carry rows" ambiguous), the
same requirement the equivalent global window has for determinism.

Intended for LOW-cardinality group keys; with high-cardinality keys the
plain group-partitioned window already parallelizes and skips the range
exchange. The zone/base relations are partitions×groups-sized —
driver-small by construction in that regime.

No counterpart in the reference (its pandas frames roll in memory and
``aggregates_etl.py:110`` delegates bar analytics to the Polygon API);
at 100 TB this is how rolling indicators stay shuffle-balanced.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window, WindowSpec

# Adaptive small-scale gate (round-10 verdict item 4). Zoning exists to
# spread a low-cardinality key's ordered stream across tasks; its fixed
# costs (range exchange, checkpoint pin, side relations — ~1-2 s of
# stage latency per consumer) only pay off once a single-task window
# would own multi-second work. Below this per-source row count the
# global window IS the right plan: at ~10-100 ns/row of window work,
# 2M rows ≈ the point where one task's pass overtakes zoning's fixed
# cost, and the stream still fits a handful of scan partitions.
# Correctness is zoning-independent (carry-replication law), so the
# gate can never change results — only the physical shape. Both shapes
# stay plan-law-tested via the SPARK_GRAFT_ZONING override.
ZONING_ROW_THRESHOLD = 2_000_000

# The registered queries whose PHYSICAL SHAPE changes with the gate —
# the canonical list consumed by the zoned plan census
# (tests/test_plan_census.py), the like-plan scale probes (bench.py),
# and the per-round dual-shape oracle evidence (tools/zoned_oracle.py /
# ZONED_ORACLE.json). A new zoning_mode() consumer must be added here
# in the same commit so every surface certifies both its shapes.
GATED_QUERIES: tuple[str, ...] = (
    "rsi_14_per_event_type",
    "hurst_exponent_by_type",
    "ema_20_per_event_type",
    "ewma_vol_5m",
    "macd_12_26_9_5m",
    "kalman_level_5m",
    "spearman_qty_price_by_flag",
    "ecdf_drift_first_n_by_type",
)


def zoning_mode(sf_dir: str, table: str = "events") -> str:
    """Pick ``"zoned"`` or ``"global"`` for consumers deriving from
    ``table`` under ``sf_dir`` — parquet-footer row count vs
    :data:`ZONING_ROW_THRESHOLD` (driver-side metadata read, no job).
    ``SPARK_GRAFT_ZONING=zoned|global`` forces either shape (tests and
    scale probes pin both)."""
    forced = os.environ.get("SPARK_GRAFT_ZONING")
    if forced in ("zoned", "global"):
        return forced
    from polygon_algotrading_env_spark.catalog import table_rows

    n = table_rows(sf_dir, table)
    return "zoned" if n >= ZONING_ROW_THRESHOLD else "global"


@dataclass(frozen=True)
class ZonedStream:
    """A zone-decomposed ordered stream ready for rolling expressions.

    ``frame`` holds every original row once (``__carry`` = 0) plus the
    replicated carry rows (``__carry`` = 1), clustered by
    (keys, ``__tzone``). Evaluate window expressions over :attr:`w` /
    :meth:`rows`, then :meth:`finish` drops replicas and scaffolding.
    """

    frame: DataFrame
    keys: tuple[str, ...]
    order: tuple[str, ...]
    carry: int = field(default=1)

    @property
    def w(self) -> WindowSpec:
        """Zone-local window — the drop-in for
        ``Window.partitionBy(*keys).orderBy(*order)``."""
        return Window.partitionBy(*self.keys, "__tzone").orderBy(*self.order)

    def rows(self, lo: int, hi: int = 0) -> WindowSpec:
        """ROWS frame over :attr:`w`; ``|lo|`` must be ≤ ``carry``. An
        unbounded lookback is NOT zone-decomposable with bounded carry
        (it would silently truncate at the zone boundary) — use the
        prefix-sum pattern of operators/rankstats.py for running totals."""
        if lo == Window.unboundedPreceding or -lo > self.carry:
            raise ValueError(
                f"frame lookback {lo} not covered by carry={self.carry}"
            )
        if lo > 0 or hi > 0:
            # Carry rows replicate BACKWARD context only; a forward-looking
            # frame would silently truncate at zone boundaries instead of
            # seeing the next zone's rows. Fail loudly like an uncovered
            # lookback does.
            raise ValueError(
                f"forward-looking frame ({lo}, {hi}) is not zone-"
                "decomposable: carry replication covers lookback only"
            )
        return self.w.rowsBetween(lo, hi)

    def row_number(self) -> Column:
        """Global per-key 1-based row number of each REAL row (zone base +
        in-zone position among real rows); meaningless on carry rows,
        which :meth:`finish` drops."""
        pos = F.sum(
            F.when(F.col("__carry") == 0, F.lit(1)).otherwise(F.lit(0))
        ).over(self.w.rowsBetween(Window.unboundedPreceding, 0))
        return (F.col("__rnbase") + pos).cast("bigint")

    def finish(self, df: DataFrame) -> DataFrame:
        """Drop carry replicas and zoning scaffolding after all window
        expressions over :attr:`w` have been projected."""
        return df.where(F.col("__carry") == 0).drop(
            "__tzone", "__carry", "__rnbase"
        )


def zoned_stream(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    carry: int,
    num_partitions: int | None = None,
    mode: str = "zoned",
) -> ZonedStream:
    """Zone-decompose ``df`` for rolling windows of lookback ≤ ``carry``
    (rows) per ``keys`` group ordered by ``order`` (a total order within
    each group). Every downstream window partitions on (keys, zone) —
    parallel across zones even for a single group.

    ``mode="global"`` (the adaptive small-scale shape picked by
    :func:`zoning_mode`) skips zoning entirely: one constant pseudo-zone,
    no carry replication, no range exchange or pin — the returned stream
    evaluates over the plain per-key window, bit-identical by the
    carry-replication law, and every consumer expression works
    unchanged."""
    keys = list(keys)
    order = list(order)
    if carry < 1:
        raise ValueError("carry must be >= 1")
    if mode not in ("zoned", "global"):
        raise ValueError(f"unknown zoning mode {mode!r}")
    if mode == "global":
        frame = (
            df.withColumn("__tzone", F.lit(0))
            .withColumn("__carry", F.lit(0))
            .withColumn("__rnbase", F.lit(0).cast("bigint"))
        )
        return ZonedStream(
            frame=frame, keys=tuple(keys), order=tuple(order), carry=carry
        )
    cols = df.columns
    parted = (
        df.repartitionByRange(num_partitions, *keys, *order)
        if num_partitions
        else df.repartitionByRange(*keys, *order)
    ).withColumn("__zone", F.spark_partition_id())
    # Pin the zoned stream: the candidate/zone-count branches and the main
    # union branch must see ONE set of sampled range boundaries, and
    # without the pin each branch re-runs the upstream scan + range
    # exchange (pruned ReadSchemas stop exchange reuse, as measured for
    # rankstats). Lazy (eager=False) still pins — blocks persist at first
    # materialization and the range shuffle's boundaries are fixed once
    # per shuffle id — without the eager variant's separate blocking job.
    # At cluster scale this materialization is the ordered silver table.
    parted = parted.localCheckpoint(eager=False)

    # (2) zone relation → exclusive row-count prefix per key = rn bases.
    w_zone = Window.partitionBy(*keys).orderBy("__zone")
    bases = (
        parted.groupBy("__zone", *keys)
        .agg(F.count(F.lit(1)).alias("__zn"))
        .select(
            F.col("__zone").alias("__tzone"),
            *keys,
            F.coalesce(
                F.sum("__zn").over(
                    w_zone.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("__rnbase"),
        )
    )

    # (3) carry assembly on the zones×keys×carry candidate relation.
    w_desc = Window.partitionBy("__zone", *keys).orderBy(
        *[F.col(c).desc() for c in order]
    )
    cand = (
        parted.withColumn("__rdesc", F.row_number().over(w_desc))
        .where(F.col("__rdesc") <= carry)
        .drop("__rdesc")
    )
    # Global per-key candidate index in stream order — the one window
    # ordered across zones, over the tiny candidate relation only.
    # Ordering by (__zone, order) is identical to ordering by order alone
    # (zones are order-contiguous per key) and keeps the plan law uniform:
    # every Window spec in a zoned plan mentions the zone id.
    cand = cand.withColumn(
        "__ci",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy("__zone", *order)
        ),
    ).withColumn("__cb", F.expr(f"(__ci - 1) DIV {carry}"))
    # c(z) = candidates in zones before z; a zone needing carries pulls
    # candidate indices (c(z)-carry, c(z)] — a fixed-width interval, so
    # join on its ≤2 covering carry-wide buckets, then the exact range.
    targets = (
        cand.groupBy("__zone", *keys)
        .agg(F.count(F.lit(1)).alias("__cc"))
        .select(
            F.col("__zone").alias("__tzone"),
            *keys,
            F.coalesce(
                F.sum("__cc").over(
                    w_zone.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("__cstart"),
        )
        .where(F.col("__cstart") > 0)
        .withColumn(
            "__cb",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr(
                            f"(greatest(__cstart - {carry}, 0)) DIV {carry}"
                        ),
                        F.expr(f"(__cstart - 1) DIV {carry}"),
                    )
                )
            ),
        )
    )
    carries = (
        cand.join(targets, [*keys, "__cb"])
        .where(
            (F.col("__ci") > F.col("__cstart") - carry)
            & (F.col("__ci") <= F.col("__cstart"))
        )
        .select(*cols, "__tzone", F.lit(1).alias("__carry"))
    )

    # (4) one hash exchange on (keys, target zone) for the rolling stage.
    unioned = parted.select(
        *cols,
        F.col("__zone").alias("__tzone"),
        F.lit(0).alias("__carry"),
    ).unionByName(carries)
    frame = unioned.join(F.broadcast(bases), [*keys, "__tzone"])
    return ZonedStream(
        frame=frame, keys=tuple(keys), order=tuple(order), carry=carry
    )


def zoned_row_number(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    rn_col: str = "__rn",
    num_partitions: int | None = None,
    mode: str = "zoned",
) -> DataFrame:
    """Append a global per-key 1-based row number over ``order`` without a
    per-group single-task window — the lightweight sibling of
    :func:`zoned_stream` for consumers that need ONLY the numbering (no
    rolling frames, so no carry replication): range zones, per-(zone, key)
    row counts prefix-summed over the tiny zone relation, then zone base +
    in-zone ``row_number``. Every window partitions on (zone, keys) or
    runs over the zones×keys relation — parallel across zones even for a
    single group. Requires (keys, order) to be a total order within each
    group, like the global window it replaces. ``mode="global"`` (the
    adaptive small-scale shape, :func:`zoning_mode`) emits the plain
    per-key ``row_number`` window instead — identical values."""
    keys = list(keys)
    order = list(order)
    if mode not in ("zoned", "global"):
        raise ValueError(f"unknown zoning mode {mode!r}")
    if mode == "global":
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).asc() for c in order]
        )
        return df.withColumn(rn_col, F.row_number().over(w).cast("bigint"))
    parted = (
        df.repartitionByRange(num_partitions, *keys, *order)
        if num_partitions
        else df.repartitionByRange(*keys, *order)
    ).withColumn("__zone", F.spark_partition_id())
    parted = parted.localCheckpoint(eager=False)
    w_zone = Window.partitionBy(*keys).orderBy("__zone")
    bases = (
        parted.groupBy("__zone", *keys)
        .agg(F.count(F.lit(1)).alias("__zn"))
        .select(
            "__zone",
            *keys,
            F.coalesce(
                F.sum("__zn").over(
                    w_zone.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("__rnbase"),
        )
    )
    w_in = Window.partitionBy("__zone", *keys).orderBy(*order)
    return (
        parted.join(F.broadcast(bases), ["__zone", *keys])
        .withColumn(
            rn_col,
            (F.col("__rnbase") + F.row_number().over(w_in)).cast("bigint"),
        )
        .drop("__zone", "__rnbase")
    )
