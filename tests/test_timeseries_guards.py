"""Regression guards for timeseries queries that divide by (n-1) under
Spark 4's default ANSI mode — a group with a single return row used to
abort the whole query with DIVIDE_BY_ZERO (and diverge from DuckDB's inf)."""

from __future__ import annotations

import datetime

import duckdb
import pytest


def _write_events(spark, path: str) -> None:
    """Crafted events table: 'thin' has exactly 2 daily bars (one return
    row → n=1, the ANSI crash case), 'fat' has 5 (n=4, healthy)."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def bar(sym, day, o, h, lo, c):
        nonlocal eid
        d = base + datetime.timedelta(days=day)
        for off, v in ((0, o), (60, h), (120, lo), (180, c)):
            rows.append(
                (eid, d + datetime.timedelta(seconds=off), 1, sym, float(v), "{}")
            )
            eid += 1

    bar("thin", 0, 100, 110, 95, 105)
    bar("thin", 1, 105, 115, 100, 110)  # 2 days → 1 return row → n=1
    for day in range(5):
        bar("fat", day, 100 + day, 112 + day, 93 + day, 104 + day)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_range_vol_n1_group_dropped_not_crashed(spark, tmp_path):
    """An event_type with exactly 2 daily bars (one return row) must be
    dropped by the n>=2 guard on BOTH engines — before the guard, Spark
    raised DIVIDE_BY_ZERO at (n-1) while DuckDB returned inf."""
    from polygon_algotrading_env_spark.queries import REGISTRY

    sf = str(tmp_path)
    _write_events(spark, sf)
    entry = REGISTRY["range_vol_estimators_daily"]

    out = entry.fn(spark, sf).collect()  # must not raise under ANSI
    assert [r["event_type"] for r in out] == ["fat"]
    assert out[0]["n_days"] == 4

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    oracle = con.sql(entry.oracle).fetchall()
    assert [r[0] for r in oracle] == ["fat"]
    assert all(v == v and abs(v) != float("inf") for r in oracle for v in r[1:])


def test_ks_drift_matches_python_reference(spark, sf_dir):
    """The registered KS query vs a straight-Python two-sample KS over
    the same half-split rule — exact integer d_num and count equality."""
    from collections import defaultdict

    from polygon_algotrading_env_spark.catalog import load_table
    from polygon_algotrading_env_spark.queries import REGISTRY

    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts_ns"
    ).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append((r["ts_ns"], r["value"]))
    want = {}
    for et, pairs in by_type.items():
        lo = min(t for t, _ in pairs)
        hi = max(t for t, _ in pairs)
        s1 = sorted(v for t, v in pairs if 2 * t <= lo + hi)
        s2 = sorted(v for t, v in pairs if 2 * t > lo + hi)
        if not s1 or not s2:
            continue
        n1, n2 = len(s1), len(s2)
        grid = sorted(set(s1) | set(s2))
        import bisect

        d = max(
            abs(bisect.bisect_right(s1, v) * n2 - bisect.bisect_right(s2, v) * n1)
            for v in grid
        )
        want[et] = (n1, n2, d, round(d / (n1 * n2), 6))
    got = {
        r["event_type"]: (r["n1"], r["n2"], r["d_num"], r["ks"])
        for r in REGISTRY["ks_temporal_drift_by_type"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_ecdf_drift_matches_hand_computed_textbook_case(spark, tmp_path):
    """W1 and CvM semantics on a case small enough to do on paper:
    first half {1.00, 2.00}, second half {3.00, 4.00} (one type).
    Earth-mover distance between the two point sets is exactly 2.00;
    CvM T = (n1*n2/N^2) * sum (F1-F2)^2 over the 4 sample points
    = (4/16) * (0.25 + 1 + 0.25 + 0) = 0.375. Also pins the exact
    integer numerators the oracle hashes (w1_num in cents)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polygon_algotrading_env_spark.queries import REGISTRY

    base = 1_700_000_000_000_000  # epoch MICROS (ts_ns multiplies by 1e3)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [base, base + 1, base + 10, base + 11], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(["x"] * 4),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    rows = (
        REGISTRY["ecdf_drift_by_type"].fn(spark, str(tmp_path)).collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["event_type"], r["n1"], r["n2"]) == ("x", 2, 2)
    # d over the cents grid {100,200,300,400} = 2,4,2,0; gaps 100 each
    assert r["w1_num"] == 800
    assert r["w1"] == 2.0
    # d^2 * multiplicity = 4 + 16 + 4 + 0
    assert r["cvm_num"] == 24
    assert r["cvm"] == 0.375
