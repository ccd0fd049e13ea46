"""Self-description enforcement: README.md's headline counts must match the
registry and the collected test suite, so the docs can never silently rot
(round-7 VERDICT item 2 — the counts went two rounds stale before this).
"""

import re
import subprocess
import sys
from pathlib import Path

from polygon_algotrading_env_spark.queries import REGISTRY

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_registry_counts_match():
    text = README.read_text()
    m = re.search(r"(\d+) registered queries, (\d+) with DuckDB oracle SQL", text)
    assert m, "README query-count sentence missing or reworded"
    n_reg, n_oracle = int(m.group(1)), int(m.group(2))
    assert n_reg == len(REGISTRY), (
        f"README says {n_reg} registered queries; registry has {len(REGISTRY)}"
    )
    real_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    assert n_oracle == real_oracle, (
        f"README says {n_oracle} oracle-bearing; registry has {real_oracle}"
    )


def test_architecture_registry_counts_match():
    text = (README.parent / "ARCHITECTURE.md").read_text()
    m = re.search(
        r"(\d+) of (\d+) registered queries carry a DuckDB oracle", text
    )
    assert m, "ARCHITECTURE query-count sentence missing or reworded"
    n_oracle, n_reg = int(m.group(1)), int(m.group(2))
    assert n_reg == len(REGISTRY)
    assert n_oracle == sum(1 for s in REGISTRY.values() if s.oracle)


def test_readme_test_count_matches_collection():
    text = README.read_text()
    m = re.search(r"(\d+) tests incl\.", text)
    assert m, "README test-count sentence missing or reworded"
    claimed = int(m.group(1))
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q",
         str(README.parent / "tests")],
        capture_output=True, text=True, timeout=120,
    ).stdout
    cm = re.search(r"(\d+) tests collected", out)
    assert cm, f"could not parse pytest collection output: {out[-300:]}"
    collected = int(cm.group(1))
    assert claimed == collected, (
        f"README says {claimed} tests; pytest collects {collected}"
    )
