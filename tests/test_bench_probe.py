"""The bench harness's fresh-JVM standalone probe surface.

``python bench.py --probe NAME ...`` is the movers adjudicator's second
stage (r12 VERDICT item 2): a mover may keep ``noise: false`` only if a
FRESH subprocess JVM confirms the regression, because the long-lived
bench session drifts uniformly slower and an in-session retime inherits
that drift (round 12 committed a false flag this way). main() shells out
to this exact CLI, so the contract under test is the real integration
seam: last stdout line is JSON with a ``probes`` map carrying a positive
min-of-3 per requested query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")


def test_probe_cli_emits_one_json_line_per_request():
    proc = subprocess.run(
        [sys.executable, BENCH, "--probe", "ohlcv_bars_5m"],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(rec) == {"probes"}
    assert set(rec["probes"]) == {"ohlcv_bars_5m"}
    assert rec["probes"]["ohlcv_bars_5m"] > 0


def _movers(now, prior):
    return {
        n: {"now": now[n], "prior": prior[n], "ratio": round(now[n] / prior[n], 2)}
        for n in now
        if now[n] / prior[n] > 1.3
    }


def test_adjudicate_retime_clears_noise_without_probe():
    """Stage 1 alone clears a spike: the retime lands under threshold, so
    the fresh-JVM probe must never be consulted."""
    import bench

    movers = _movers({"q": 2.0}, {"q": 1.0})
    timings = {"q": 2.0}

    def boom(names):
        raise AssertionError("probe must not run when retime clears the flag")

    bench.adjudicate_movers(movers, timings, lambda n: 1.1, boom)
    m = movers["q"]
    assert m["noise"] is True and m["retimed"] == 1.1
    assert timings["q"] == 1.1 and "standalone" not in m


def test_adjudicate_standalone_refutes_false_flag():
    """The round-12 failure mode: the in-session retime confirms the
    regression (inherited drift), the fresh JVM lands at the prior record
    — the committed record must carry noise=true and the probe time."""
    import bench

    movers = _movers({"q": 1.32}, {"q": 1.0})
    timings = {"q": 1.32}
    bench.adjudicate_movers(
        movers, timings, lambda n: 1.35, lambda names: {"q": 0.95}
    )
    m = movers["q"]
    assert m["noise"] is True and m["standalone"] == 0.95
    assert timings["q"] == 0.95 and m["ratio"] == 0.95


def test_adjudicate_standalone_confirms_real_regression():
    import bench

    movers = _movers({"q": 2.0}, {"q": 1.0})
    timings = {"q": 2.0}
    bench.adjudicate_movers(
        movers, timings, lambda n: 1.9, lambda names: {"q": 1.85}
    )
    m = movers["q"]
    assert m["noise"] is False and m["standalone"] == 1.85
    assert timings["q"] == 1.85


def test_adjudicate_probe_failure_keeps_conservative_flag():
    import bench

    movers = _movers({"q": 2.0}, {"q": 1.0})
    timings = {"q": 2.0}

    def boom(names):
        raise RuntimeError("subprocess died")

    bench.adjudicate_movers(movers, timings, lambda n: 1.9, boom)
    m = movers["q"]
    assert m["noise"] is False
    assert "subprocess died" in m["standalone_error"]
    assert timings["q"] == 1.9
