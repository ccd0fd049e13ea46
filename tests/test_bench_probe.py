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


def test_adjudicate_probe_missing_name_is_marked_unconfirmed():
    """A still-hot mover the probe dict omits keeps its conservative
    flag AND carries standalone_error — without the marker it would
    read as fully adjudicated while the confirmation never ran."""
    import bench

    movers = _movers({"q": 2.0}, {"q": 1.0})
    timings = {"q": 2.0}
    bench.adjudicate_movers(movers, timings, lambda n: 2.0, lambda names: {})
    m = movers["q"]
    assert m["noise"] is False
    assert m["standalone_error"] == "probe returned no time"
    assert "standalone" not in m


def test_probe_cli_without_names_is_a_usage_error():
    """A bare --probe must exit 2 with usage, never fall through into
    the full multi-hour bench."""
    proc = subprocess.run(
        [sys.executable, BENCH, "--probe"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 2
    assert "usage" in proc.stderr.lower()


def test_scale_outliers_flags_only_2x_median_and_skips_pinned():
    import bench

    ratios = {"a": 1.0, "b": 2.0, "c": 3.0, "d": 30.0, "lpa": 40.0}
    # median of non-pinned {1,2,3,30} = 2.5; threshold 5.0 -> only d
    assert bench.scale_outliers(ratios, {"lpa"}) == ["d"]
    assert bench.scale_outliers({}, set()) == []
    # All-pinned blocks have nothing to judge by ratio.
    assert bench.scale_outliers({"lpa": 40.0}, {"lpa"}) == []


def test_judge_walls_band_verdicts():
    import bench

    pins = {"lpa": (35.0, 62.0), "kcore": (40.0, 75.0)}
    out = bench.judge_walls({"lpa": 50.0, "kcore": 90.0}, pins)
    assert out["lpa"]["within"] is True
    assert out["kcore"]["within"] is False
    # A missing measurement is an alarm, not a silent pass.
    out = bench.judge_walls({}, pins)
    assert all(not w["within"] and w["scaled_wall"] is None for w in out.values())


def test_spot_probe_cli_arg_validation():
    """Bounds-checked options and a non-directory positional must be
    loud usage errors, not silent misparses (r13 ADVICE)."""
    tool = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools", "spot_probe.py"
    )
    for args in (["--factor"], ["--single"], []):
        proc = subprocess.run(
            [sys.executable, tool, *args],
            capture_output=True, text=True, timeout=60,
        )
        assert proc.returncode == 2, args
        assert "usage" in proc.stderr.lower()
    # A typo'd first positional is rejected as an unknown query, not
    # silently treated as the sf_dir.
    proc = subprocess.run(
        [sys.executable, tool, "no_such_dir_or_query"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "unknown queries" in proc.stderr
