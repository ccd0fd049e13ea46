"""Registry family census (queries/families.py — r8 VERDICT item 9).

Three mechanical laws replace the prose coverage list:

1. EXACT COVER — every registered query belongs to exactly one family;
   a family member that isn't registered (rename/delete drift) fails.
2. ANCHORING — every family holds at least one certified row: a
   hash-matched entry in a committed CORRECTNESS_r0N.json, a current
   DRIVER_WINDOW slot (certification pending this round), or — for
   rows-only-by-design families — a named, existing pytest file.
3. PYTEST_ANCHORED honesty — a family may only claim a pytest anchor if
   NONE of its members carries an oracle (otherwise the oracle-bearing
   member must earn the driver row).
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

from polygon_algotrading_env_spark.queries import DRIVER_WINDOW, REGISTRY
from polygon_algotrading_env_spark.queries.families import (
    FAMILIES,
    PYTEST_ANCHORED,
)

REPO = Path(__file__).resolve().parent.parent


def _recorded_greens() -> set[str]:
    names: set[str] = set()
    # r* not r0*: the zero-padded pattern silently dropped rounds >= 10
    # (caught by the twin-basis audit — cusum/ewma greens live in r11/r12)
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if row.get("hash_match") and row.get("rows_match"):
                names.add(name)
    return names


def test_families_exact_cover():
    members = [n for fam in FAMILIES.values() for n in fam]
    dupes = [n for n, c in Counter(members).items() if c > 1]
    assert not dupes, f"queries assigned to multiple families: {dupes}"
    member_set = set(members)
    unknown = member_set - set(REGISTRY)
    assert not unknown, f"family members not in registry: {sorted(unknown)}"
    orphans = set(REGISTRY) - member_set
    assert not orphans, f"registered queries with no family: {sorted(orphans)}"


def test_every_family_anchored():
    greens = _recorded_greens()
    window = set(DRIVER_WINDOW)
    unanchored = []
    for fam, names in FAMILIES.items():
        if any(n in greens or n in window for n in names):
            continue
        if fam in PYTEST_ANCHORED:
            continue
        unanchored.append(fam)
    assert not unanchored, (
        f"families with no certified row and no window slot: {unanchored}"
    )


def test_pytest_anchors_exist_and_are_honest():
    for fam, test_file in PYTEST_ANCHORED.items():
        assert (REPO / test_file).exists(), (fam, test_file)
        oracle_bearing = [
            n for n in FAMILIES[fam] if REGISTRY[n].oracle is not None
        ]
        assert not oracle_bearing, (
            f"{fam} claims a pytest anchor but has oracle-bearing members "
            f"{oracle_bearing} that should earn a driver row instead"
        )


def test_ghost_names_now_hold_or_await_green_rows():
    """The three r1 names that never passed a driver check must be
    oracle-bearing and in the current window until their first recorded
    green row lands (r8 VERDICT item 6)."""
    greens = _recorded_greens()
    for name in ("doc_fingerprints", "simhash_docs", "minhash_near_dup_pairs"):
        assert REGISTRY[name].oracle is not None, name
        assert name in greens or name in set(DRIVER_WINDOW), name


# Streaming twin → certified batch basis (r12 VERDICT item 5). Every
# stateful streaming operator whose semantics are law-tested against a
# registered batch query must point at a basis that is driver-green on
# record or currently holds a window slot (certification scheduled this
# round) — a twin whose basis is only locally hash-matched has no
# committed evidence chain.
TWIN_BASES = {
    "stream_cusum": "cusum_alarms_5m",
    "stream_sma_signal": "sma_crossover_backtest_5m",
    "stream_ewma_vol": "ewma_vol_5m",
    "stream_rsi": "rsi_14_per_event_type",
    "stream_macd": "macd_12_26_9_5m",
    "stream_kalman_level": "kalman_level_5m",
    "stream_ecdf_drift": "ecdf_drift_first_n_by_type",
    "stream_asof_join": "asof_latest_order_before_event",
    "stream_adjusted_candles": "adjusted_candles_firstday_5m",
    "stream_ohlcv_bars": "ohlcv_bars_5m",
    "stream_bars_from_page_store": "ohlcv_bars_5m",
    "stream_session_stats": "session_windows_per_user",
    "stream_mg_summary_table": "heavy_hitter_parts",
    "stream_bottomk_sketch_table": "bottomk_sketch_quantiles",
    # stream_qdigest_sketch_table joins this map when its batch basis
    # qdigest_quantiles_price earns its driver green (queued for the
    # r15 window); its stream≡batch bit-identity law already runs
    # (tests/test_streaming.py::test_stream_qdigest_sketch_table).
    # stream_cms_sketch_table and stream_ams_sketch_table likewise join
    # when cms_partkey_freq_topk / ams_f2_partkey earn driver greens
    # (both queued for the r16 window); their stream≡batch bit-identity
    # laws already run (tests/test_streaming.py).
}


def test_streaming_twin_bases_certified_or_scheduled():
    greens = _recorded_greens()
    window = set(DRIVER_WINDOW)
    from polygon_algotrading_env_spark import streaming

    import importlib

    fns = set()
    for mod in ("stateful", "statev2", "pipeline"):
        m = importlib.import_module(
            f"polygon_algotrading_env_spark.streaming.{mod}"
        )
        fns.update(n for n in dir(m) if n.startswith("stream_"))
    missing_twin = [t for t in TWIN_BASES if t not in fns]
    assert not missing_twin, f"twin map names unknown operators: {missing_twin}"
    unanchored = {
        t: b
        for t, b in TWIN_BASES.items()
        if b not in greens and b not in window
    }
    assert not unanchored, (
        f"twins whose batch basis is neither driver-green on record nor "
        f"in the current window: {unanchored}"
    )
