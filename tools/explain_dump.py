"""Dump ``.explain("formatted")`` for named registered queries.

Optimization-round evidence: the judge checks plan claims in
OPTIMIZATION_r*.md against committed ``plans/<round>/<query>_{before,after}.txt``
files. This tool builds (does not execute) each named query and writes its
formatted physical plan to ``plans/<round>/<query>_<tag>.txt``.

Checkpoint-job plans (r15 VERDICT item 8): iterative operators pin
intermediates with eager ``localCheckpoint`` — the final plan then shows
only the post-pin stage, hiding the upstream the claims are about (e.g.
"the levenshtein pass evaluates once"). ``--checkpoints`` monkeypatches
``DataFrame.localCheckpoint`` so the PRE-PIN plan of every checkpoint job
is dumped too, numbered in call order, as
``plans/<round>/<query>_ckpt<NN>_<tag>.txt``. Building a query with eager
checkpoints EXECUTES those jobs, so this mode runs the pinned subtrees
(still cheap at the default sf0.1).

Usage:
    python tools/explain_dump.py <tag> [--checkpoints] [query ...]
    # default queries: all headliners
    SPARK_GRAFT_SF_DIR picks the data dir (default /root/testdata/sf0.1 so
    the captured plan is the bench-scale plan, matching the timed numbers).
    SPARK_GRAFT_PLANS_ROUND picks the output subdir (default r16).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polygon_algotrading_env_spark.queries import (  # noqa: E402
    REGISTRY,
    headline_queries,
)
from polygon_algotrading_env_spark.session import get_spark  # noqa: E402


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _write(out_dir: str, fname: str, plan: str) -> None:
    path = os.path.join(out_dir, fname)
    with open(path, "w") as fh:
        fh.write(plan)
        if not plan.endswith("\n"):
            fh.write("\n")
    print(f"wrote {path}")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--checkpoints"]
    dump_ckpts = "--checkpoints" in sys.argv[1:]
    tag = args[0]
    names = args[1:] or sorted(headline_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    # Spark 4: pyspark.sql.DataFrame is the ABC; live (non-Connect)
    # instances are classic.dataframe.DataFrame, which OVERRIDES
    # localCheckpoint — patch the class whose method actually runs.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # Spark 3.x layout
        from pyspark.sql import DataFrame

    orig_ckpt = DataFrame.localCheckpoint
    rc = 0
    for name in names:
        state = {"i": 0}

        def _ckpt(self, eager=True, _name=name, _state=state):
            _state["i"] += 1
            try:
                _write(
                    out_dir,
                    f"{_name}_ckpt{_state['i']:02d}_{tag}.txt",
                    _formatted(self),
                )
            except Exception as e:  # noqa: BLE001 — dump must not alter runs
                print(f"{_name} ckpt{_state['i']}: DUMP-ERROR {e}", file=sys.stderr)
            return orig_ckpt(self, eager)

        if dump_ckpts:
            DataFrame.localCheckpoint = _ckpt
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = _formatted(df)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            rc = 1
            continue
        finally:
            DataFrame.localCheckpoint = orig_ckpt
        _write(out_dir, f"{name}_{tag}.txt", plan)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
