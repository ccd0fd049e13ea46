"""DuckDB oracle-SQL generator for the closed-form EMA (the exact dual of
``operators/indicators.with_ema_closed_form``).

Both engines evaluate the SAME two-level pow-normalized prefix-sum
formula — in-block running sum with normalizer r^{-p}, cross-block carry
as ``carry_terms`` lag() terms with coefficient c = r^K — with the SAME
Python-computed double literals for a, r and c^j embedded in the text, so
cross-engine differences reduce to windowed-sum association order and
libm pow ulps (~1e-13 relative), far inside the round-6 grid.

The generator emits a CTE chain; callers compose passes (MACD needs
three) by feeding one pass's output CTE as the next pass's source. The
source CTE must already expose a 0-based per-partition ordinal ``__t``.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from polygon_algotrading_env_spark.operators.indicators import ema_block_size


def ema_pass_ctes(
    tag: str,
    src: str,
    keys: Sequence[str],
    ord_col: str,
    val: str,
    span: int,
    out: str,
    block: int = 512,
    carry_terms: int = 14,
) -> tuple[str, str]:
    """Return (cte_sql, out_cte_name): CTE fragments computing ``out`` =
    EMA(span, adjust=False) of ``val`` over ``src`` partitioned by
    ``keys`` ordered by ``ord_col`` (``src`` must carry ``__t``)."""
    a = 2.0 / (span + 1.0)
    r = 1.0 - a
    K = ema_block_size(span, block)
    c = r**K
    carry_terms = max(carry_terms, math.ceil(70.0 / (K * math.log(1.0 / r))))
    kl = ", ".join(keys)
    carry = " + ".join(
        f"{c ** (j - 1)!r} * coalesce(lag(__P, {j}) OVER "
        f"(PARTITION BY {kl} ORDER BY __b), 0.0)"
        for j in range(1, carry_terms + 1)
    )
    ctes = f"""
    e_{tag} AS (
      SELECT *, __t % {K} AS __p, __t // {K} AS __b,
             (CASE WHEN __t = 0 THEN {val} ELSE {a!r} * ({val}) END)
               * power({r!r}, -(__t % {K})) AS __u
      FROM {src}
    ),
    f_{tag} AS (
      SELECT *, power({r!r}, __p) * sum(__u) OVER (
               PARTITION BY {kl}, __b ORDER BY {ord_col}
               ROWS UNBOUNDED PRECEDING) AS __partial
      FROM e_{tag}
    ),
    blk_{tag} AS (
      SELECT {kl}, __b, arg_max(__partial, __p) AS __P
      FROM f_{tag} GROUP BY {kl}, __b
    ),
    cr_{tag} AS (
      SELECT {kl}, __b, {carry} AS __carry FROM blk_{tag}
    ),
    out_{tag} AS (
      SELECT f.* EXCLUDE (__p, __b, __u, __partial),
             f.__partial + cr.__carry * power({r!r}, f.__p + 1) AS {out}
      FROM f_{tag} f JOIN cr_{tag} cr USING ({kl}, __b)
    )"""
    return ctes, f"out_{tag}"
