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


def test_quoted_scale_metrics_match_scale_detail():
    """Every 100x ratio quoted in COVERAGE.md / ARCHITECTURE.md must match
    the committed SCALE_DETAIL.json (round-9 VERDICT item 4 — the quoted
    spearman/worst-spot numbers went a round stale before this). The pins
    anchor on stable phrases; rewording a claim must reword its pin."""
    import json

    base = README.parent
    detail = json.loads((base / "SCALE_DETAIL.json").read_text())["sf100"]
    spear = detail["ratio_vs_base"]["spearman_qty_price_by_flag"]
    (worst_head, worst_head_r), = detail["worst"].items()
    (worst_spot, worst_spot_r), = detail["spot"]["worst"].items()

    cov = (base / "COVERAGE.md").read_text()
    m = re.search(r"100× ratio [\d.]+× → ([\d.]+)× in SCALE_DETAIL", cov)
    assert m, "COVERAGE.md spearman-ratio claim missing or reworded"
    assert float(m.group(1)) == spear, (
        f"COVERAGE.md quotes spearman 100x ratio {m.group(1)}; "
        f"SCALE_DETAIL.json records {spear}"
    )
    m = re.search(r"worst `(\w+)` ([\d.]+)× wall for 100× rows", cov)
    assert m, "COVERAGE.md spot-worst claim missing or reworded"
    assert (m.group(1), float(m.group(2))) == (worst_spot, worst_spot_r), (
        f"COVERAGE.md quotes spot worst {m.groups()}; "
        f"SCALE_DETAIL.json records {worst_spot} {worst_spot_r}"
    )

    arch = (base / "ARCHITECTURE.md").read_text()
    m = re.search(r"recorded 100× ratio now reads ([\d.]+)×", arch)
    assert m, "ARCHITECTURE.md spearman-ratio claim missing or reworded"
    assert float(m.group(1)) == spear
    m = re.search(r"\((\w+) worst at ([\d.]+)×", arch)
    assert m, "ARCHITECTURE.md spot-worst claim missing or reworded"
    assert (m.group(1), float(m.group(2))) == (worst_spot, worst_spot_r)
    m = re.search(r"worst headliner (\w+) at ([\d.]+)×", arch)
    assert m, "ARCHITECTURE.md worst-headliner claim missing or reworded"
    assert (m.group(1), float(m.group(2))) == (worst_head, worst_head_r)

    # round-11 like-plan claims: the adaptively-gated consumers' zoned
    # scaling quoted in both docs must match gated_ratio_vs_zoned_base
    gated = detail["gated_ratio_vs_zoned_base"]
    for text, src in ((cov, "COVERAGE.md"), (arch, "ARCHITECTURE.md")):
        m = re.search(r"like-plan zoned (?:ratio|scaling) is ([\d.]+)×", text)
        m = m or re.search(r"like-plan zoned ratio .*? is ([\d.]+)×", text)
        assert m, f"{src} like-plan spearman claim missing or reworded"
        assert float(m.group(1)) == gated["spearman_qty_price_by_flag"], src
    # r12 kmeans rationale row: its quoted 100× scaling must match the
    # artifact (the r11 VERDICT item-4 "rationale row + doc-pin" close)
    m = re.search(r"scales at ([\d.]+)× for 100× data", arch)
    assert m, "ARCHITECTURE.md kmeans scaling claim missing or reworded"
    assert float(m.group(1)) == detail["ratio_vs_base"][
        "kmeans_clusters_embeddings"
    ]

    m = re.search(
        r"rsi ([\d.]+)×, hurst ([\d.]+)×, ema ([\d.]+)×, ewma-vol ([\d.]+)×,"
        r" macd ([\d.]+)×, spearman ([\d.]+)× like-plan",
        arch,
    )
    assert m, "ARCHITECTURE.md gated like-plan table missing or reworded"
    quoted = [float(g) for g in m.groups()]
    assert quoted == [
        gated["rsi_14_per_event_type"],
        gated["hurst_exponent_by_type"],
        gated["ema_20_per_event_type"],
        gated["ewma_vol_5m"],
        gated["macd_12_26_9_5m"],
        gated["spearman_qty_price_by_flag"],
    ], quoted


def test_zoned_oracle_artifact_covers_both_shapes_and_matches():
    """The committed ZONED_ORACLE.json (tools/zoned_oracle.py) is the
    durable hash evidence for the shape the 100 TB path runs: every
    gated query x {global, zoned} x each recorded SF must be present
    and hash-matched (r11 VERDICT item 3 — this lived only in a commit
    message before). Regenerate with `python tools/zoned_oracle.py`
    whenever a gated plan changes."""
    import json

    from polygon_algotrading_env_spark.operators.zonedroll import (
        GATED_QUERIES,
    )

    rec = json.loads((README.parent / "ZONED_ORACLE.json").read_text())
    assert rec["failures"] == []
    assert sorted(rec["queries"]) == sorted(GATED_QUERIES)
    for name, by_sf in rec["queries"].items():
        assert len(by_sf) >= 2, (name, "need >=2 SFs")
        for sf_key, shapes in by_sf.items():
            assert sorted(shapes) == ["global", "zoned"], (name, sf_key)
            for shape, r in shapes.items():
                assert r["hash_match"] is True, (name, sf_key, shape)
                assert r["rows"] > 0, (name, sf_key, shape)
