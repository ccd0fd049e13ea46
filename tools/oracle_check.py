"""Dev-loop differential harness: run every declared query on Spark AND its
DuckDB oracle, compare row count / column names / values.

Mimics the verification driver's t2 gate so mismatches surface before a
round ends. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

Exit code 1 if any oracle-bearing query mismatches.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polygon_algotrading_env_spark.catalog import TABLES  # noqa: E402
from polygon_algotrading_env_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows sorted
    by stringified values, timestamps normalized to ISO micros."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("us").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        # Driver-hash-faithful dtype gate (r14 post-mortem): the driver
        # hashes stringified representations, so a DuckDB HUGEINT/DECIMAL
        # column that pandas renders float64 ("3.0") fails the driver hash
        # against a Spark bigint ("3") even when every value is numerically
        # identical. Flag any dtype-KIND mismatch (int vs float vs object
        # vs bool ...) as a failure in its own right. Same-kind widths
        # (int32 vs int64) stringify identically and are fine; NULL-induced
        # float64 on BOTH sides is same-kind and passes, matching the
        # driver's observed behavior on asof_next_event_after_order et al.
        sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok_:
            errs.append(
                f"col {c}: DTYPE kind spark={s[c].dtype} oracle={o[c].dtype}"
                " (driver hashes representations; cast the oracle, e.g."
                " CAST(sum(...) AS BIGINT))"
            )
    if errs:
        return errs
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) and np.issubdtype(ov.dtype, np.floating):
            both_nan = pd.isna(sv) & pd.isna(ov)
            close = np.isclose(sv, ov, rtol=0, atol=0, equal_nan=True)
            if not np.all(close | both_nan):
                bad = np.where(~(close | both_nan))[0][:3]
                errs.append(
                    f"col {c}: {len(np.where(~(close|both_nan))[0])} diffs, "
                    f"e.g. {[(sv[i], ov[i]) for i in bad]}"
                )
        else:
            eq = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
            if not np.all(eq):
                bad = np.where(~eq)[0][:3]
                errs.append(
                    f"col {c}: {len(np.where(~eq)[0])} diffs, "
                    f"e.g. {[(sv[i], ov[i]) for i in bad]}"
                )
    return errs


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    only = set(args)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({el:.1f}s, rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        errs = compare(name, sdf, odf)
        if errs:
            failures.append(name)
            print(f"FAIL  {name} ({el:.1f}s): " + "; ".join(errs))
        else:
            print(f"ok    {name}: {len(sdf)} rows ({el:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
