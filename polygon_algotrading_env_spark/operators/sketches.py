"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark SQL as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The 100 TB pattern this enables: distinct counts are the one aggregate
that does NOT decompose over partitions (|A ∪ B| ≠ |A| + |B|), so exact
global distincts force a full shuffle of the key domain. Sketches fix the
economics: build a ~KB-sized sketch per partition/segment/day ONCE (full
precision parallelism, map-side), persist them in a silver table, and
answer any union-of-segments distinct question later by merging sketches —
no rescan, no key shuffle, error ~1.6%/sqrt(2^lgk).

Estimates are deterministic: the sketch is a pure, order-independent
function of the input SET (hash-based, no RNG), so repeated runs and
different partitionings yield byte-identical sketches — asserted in
tests. (DuckDB's approx_count_distinct is a different HLL implementation
with different estimates, hence no cross-engine oracle; accuracy is
pinned against exact counts in pytest instead.)
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: log2 of the sketch's bucket count; 12 → 4096 buckets, ~1.6% rel. error.
DEFAULT_LGK = 12


def hll_group_sketches(
    df: DataFrame,
    col: str,
    by: Sequence[str],
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One mergeable HLL sketch of ``col``'s distinct values per group —
    the build side of the sketch-per-segment pattern (write these to a
    silver table at scale)."""
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(sketch_col)
    )


def hll_estimate(df: DataFrame, sketch_col: str = "hll_sketch") -> DataFrame:
    """Attach each group's distinct-count estimate."""
    return df.withColumn(
        "distinct_est", F.hll_sketch_estimate(F.col(sketch_col))
    )


def hll_union_estimate(
    df: DataFrame, sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Merge all groups' sketches into one and estimate the UNION's
    distinct count — the query-time side: any segment combination folds
    in sketch space without touching the base data. (The boolean arg
    permits merging sketches built with different lgConfigK.)"""
    return df.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("distinct_est")
    )
