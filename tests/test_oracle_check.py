"""Laws for the dev-loop differential harness itself (tools/oracle_check).

The r14 post-mortem: three window entrants shipped with oracles DuckDB
typed HUGEINT, which pandas renders float64 ("3.0") where Spark returns
bigint ("3") — numerically equal, representation-different, and the
driver hashes REPRESENTATIONS. oracle_check compared values numerically
and certified them; the driver failed them. These tests pin the gate
that closes that class: compare() must flag any dtype-KIND mismatch as
a failure in its own right, while same-kind NULL-induced conversions
(float64 on BOTH sides) keep passing, matching the driver's observed
behavior on asof_next_event_after_order et al.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

from tools.oracle_check import compare  # noqa: E402


def test_dtype_kind_mismatch_fails_even_when_values_equal():
    """The r14 failure class reproduced: bigint 3 vs HUGEINT-made
    float64 3.0 — numerically identical, representation different."""
    sdf = pd.DataFrame({"k": ["a", "b"], "n": np.array([3, 0], dtype="int64")})
    odf = pd.DataFrame(
        {"k": ["a", "b"], "n": np.array([3.0, 0.0], dtype="float64")}
    )
    errs = compare("t", sdf, odf)
    assert errs, "int64-vs-float64 must fail the gate"
    assert any("DTYPE" in e for e in errs), errs


def test_same_kind_null_induced_float_passes():
    """int + NULL becomes float64 on BOTH sides — same kind, same
    stringified form; the driver passes these and so must the gate."""
    sdf = pd.DataFrame(
        {"k": ["a", "b"], "n": np.array([3.0, np.nan], dtype="float64")}
    )
    odf = pd.DataFrame(
        {"k": ["a", "b"], "n": np.array([3.0, np.nan], dtype="float64")}
    )
    assert compare("t", sdf, odf) == []


def test_int_width_difference_passes():
    """int32 vs int64 stringify identically ("3" both) — same kind,
    no representation hazard, must not be flagged."""
    sdf = pd.DataFrame({"n": np.array([3, 7], dtype="int32")})
    odf = pd.DataFrame({"n": np.array([3, 7], dtype="int64")})
    assert compare("t", sdf, odf) == []


def test_value_mismatch_still_detected_after_dtype_gate():
    sdf = pd.DataFrame({"n": np.array([3, 7], dtype="int64")})
    odf = pd.DataFrame({"n": np.array([3, 8], dtype="int64")})
    errs = compare("t", sdf, odf)
    assert errs and any("diffs" in e for e in errs), errs


def test_object_vs_numeric_kind_mismatch_fails():
    """DECIMAL oracles can surface as object(Decimal) columns — a kind
    mismatch against a float/int Spark column must be loud."""
    from decimal import Decimal

    sdf = pd.DataFrame({"n": np.array([3.5], dtype="float64")})
    odf = pd.DataFrame({"n": pd.Series([Decimal("3.5")], dtype="object")})
    errs = compare("t", sdf, odf)
    assert errs and any("DTYPE" in e for e in errs), errs
