"""Order-independent table fingerprints — replica and migration
verification in one scan.

Comparing two copies of a 100 TB table by sorting and diffing is a
full-shuffle job on both sides; comparing ORDER-INDEPENDENT aggregates of
per-row hashes is one scan each, no shuffle beyond a 1-row aggregate, and
partial aggregation does almost all of it map-side. Two combiners are
kept: XOR (catches any single-row difference; an even number of
identical duplicate rows cancels) and SUM with wraparound (catches the
duplicate-parity case XOR misses) — together with the row count they
detect any difference short of an adversarial collision.

The per-row hash is the first 12 hex digits of md5 over a
separator-joined canonical string — the same engine-portable convention
as the certified hash split and hashed TF-IDF (DuckDB computes identical
values via ``('0x' || substring(md5(..), 1, 12))::BIGINT``), so a
fingerprint computed by this engine can be checked by ANY system with
md5, not just another Spark cluster. Caller chooses the columns: stick
to integers/strings/formatted timestamps — float-to-string rendering is
engine-specific and would break cross-engine comparison (hash a rounded
``format_number`` string instead).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Unit separator: visually unlikely in data; prevents ("ab","c") and
# ("a","bc") from hashing identically the way bare concat would.
_SEP = "\x1f"
_MASK = (1 << 48) - 1  # sum wraps at 48 bits: stays exact in any BIGINT


def row_hash(cols: Sequence[str]) -> F.Column:
    """Deterministic 48-bit per-row hash over the canonical string of
    ``cols`` (NULL encoded as an explicit marker distinct from '')."""
    canon = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("bigint")


def table_fingerprint(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row fingerprint: (n_rows, xor_fp, sum_fp) over ``cols``.

    Equal fingerprints + equal counts ⇒ the two relations hold the same
    multiset of rows (up to md5 collision odds); any differing row flips
    xor_fp, any duplicated/missing row moves sum_fp or n_rows.
    """
    h = row_hash(cols)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.bit_xor(h), F.lit(0)).alias("xor_fp"),
        # Sum in decimal(38,0): 48-bit terms overflow BIGINT after only
        # ~32k rows; decimal keeps the sum exact to ~10^23 rows, then the
        # 48-bit wrap brings it back to BIGINT range.
        F.coalesce(
            (F.sum(h.cast("decimal(38,0)")) % F.lit(_MASK + 1)).cast("bigint"),
            F.lit(0),
        ).alias("sum_fp"),
    )


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact multiset diff of two relations: rows whose occurrence counts
    differ, with both counts attached (0 = absent). The drill-down step
    after :func:`table_fingerprint` says two copies diverge.

    Both sides collapse to (row-values, count) via hash aggregation
    BEFORE the full-outer join, so the join carries one row per DISTINCT
    row — duplicates never amplify the shuffle, and the output is
    exactly the disagreement set (empty ⇔ identical multisets).
    """
    cols = list(cols or left.columns)
    missing = [
        c for c in cols if c not in left.columns or c not in right.columns
    ]
    if missing:
        raise ValueError(f"diff columns missing from a side: {missing}")
    if len(set(cols)) != len(cols):
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise ValueError(f"duplicate diff columns: {dupes}")
    ga = left.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_left"))
    gb = right.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_right"))
    return (
        ga.join(gb, cols, "full_outer")
        .select(
            *cols,
            F.coalesce(F.col("n_left"), F.lit(0)).alias("n_left"),
            F.coalesce(F.col("n_right"), F.lit(0)).alias("n_right"),
        )
        .where(F.col("n_left") != F.col("n_right"))
    )
