"""Vector math over ``array<numeric>`` columns as pure Column expressions.

All of these compile to Catalyst higher-order functions (``zip_with`` /
``aggregate``) evaluated JVM-side per row — no Python round-trip, no UDF
serialization — so a brute-force cosine scan stays in whole-stage codegen.
Elements are cast to double before arithmetic so results are independent of
the storage precision (the fixture embeddings are float32).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _d(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ (left-to-right accumulation, deterministic)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """NULL for zero-norm vectors (try_divide), not an ANSI runtime error."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def scale(a: Column | str, s: Column) -> Column:
    return F.transform(_d(a), lambda x: x * s)
