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
    for f in sorted(REPO.glob("CORRECTNESS_r0*.json")):
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
