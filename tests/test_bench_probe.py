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
