"""Skew mitigation for hot keys (SURVEY.md §4, §7 risk register).

Market data is power-law skewed: SPY/QQQ trade orders of magnitude more
than the tail. AQE's skew-join splitting (enabled in session.py) handles
sort-merge joins automatically; these utilities cover the two cases AQE
does not:

- :func:`salted_aggregate` — a single groupBy key so hot that even one
  reducer per key is too slow: two-phase aggregation through a salted
  intermediate key. Works for any algebraic aggregate (caller supplies the
  partial and final expressions).
- :func:`salted_join` — hot-key equi-join where neither side broadcasts:
  salt the skewed (fact) side, replicate the other side across all salts.

Both are plan transformations, not new physics: they trade one extra
small shuffle for bounded per-task input.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform pseudo-random salt in [0, buckets) — cheap, deterministic
    per row content is NOT required (salting only needs uniformity)."""
    return df.withColumn(
        col_name, (F.rand() * buckets).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``partial_aggs``: name → aggregate over the raw rows (phase 1).
    ``final_aggs``: name → aggregate over the phase-1 columns (phase 2),
    referencing the phase-1 output names.

    Example (count + sum + avg):
        partial = {"cnt": F.count(F.lit(1)), "s": F.sum("x")}
        final   = {"cnt": F.sum("cnt"), "s": F.sum("s")}
    """
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str] | str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated
    ``buckets``× (explode of a literal salt range), so one hot key spreads
    over ``buckets`` reducers.

    Use only when `other` is too big to broadcast yet small enough that a
    ``buckets``-fold replication is acceptable — the classic middle regime.

    Only ``inner`` and ``left`` are supported: with the other side
    replicated per salt, a right/full/anti join would emit each unmatched
    other-side row once PER SALT — ``buckets``-fold duplicates. For those
    shapes, salt the other side instead or rely on AQE's skew-join split.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): "
            "side replication duplicates unmatched other-side rows for "
            "right/full/anti joins"
        )
    keys = [on] if isinstance(on, str) else list(on)
    s = with_salt(skewed, buckets)
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = s.join(o, on=keys + ["__salt"], how=how)
    return out.drop("__salt")
