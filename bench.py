"""Benchmark harness (driver contract).

Runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with a noop-format write: unlike
count() (which lets Catalyst prune every column), the noop sink evaluates
all output columns JVM-side without driver materialization or disk I/O.

Per-query time is the MIN over two full passes of the suite: single-run
times on a shared host carry multi-second scheduler noise (observed
spread up to 40% on identical plans), and the minimum is the standard
steady-state estimator for engine cost — the quantity that projects to
cluster scale.

An ``sf1_spot`` block re-times the three scale-critical headliners on a
deterministic 10x scaling of their input tables (tools/scale_fixtures.py,
built once into a temp dir) and reports the sf1/sf0.1 ratio — the
one-order-of-magnitude data point behind the 100 TB design claims.
Disable with SPARK_GRAFT_SKIP_SF1=1 (e.g. when benching a non-default
SF dir where the ratio would be meaningless).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polygon_algotrading_env_spark.queries import headline_queries  # noqa: E402
from polygon_algotrading_env_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="polygon-algotrading-env-spark-bench")

    # Untimed warm-up: JVM/codegen spin-up, file-index listing, and the
    # Python-worker fork + numpy/pandas import behind Arrow pandas UDFs are
    # one-off session costs, not per-query engine work.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from polygon_algotrading_env_spark.catalog import load_all
    from polygon_algotrading_env_spark.operators.dedup import minhash_signature

    for df in load_all(spark, sf_dir).values():
        df.limit(1).collect()
    spark.createDataFrame([("warm up the arrow path",)], "text string").select(
        minhash_signature("text")
    ).collect()

    timings: dict[str, float] = {}
    pass0: dict[str, float] = {}
    for pass_no in range(2):
        for name, fn in headline_queries().items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = round(time.time() - t0, 3)
            if pass_no == 0:
                pass0[name] = t
            timings[name] = min(timings.get(name, t), t)
            print(f"# pass{pass_no} {name}: {t}s", file=sys.stderr)

    sf1_spot = None
    if not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        import tempfile

        from polygon_algotrading_env_spark.queries import queries
        from tools.scale_fixtures import build_scaled_fixtures

        spot_names = (
            "minhash_near_dup_pairs", "lsh_ann_topk", "adjusted_candles_5m",
        )
        scaled_dir = os.environ.get("SPARK_GRAFT_SF1_DIR") or os.path.join(
            tempfile.gettempdir(),
            "spark_graft_scaled_" + sf_dir.strip("/").replace("/", "_"),
        )
        build_scaled_fixtures(spark, sf_dir, scaled_dir, factor=10)
        qs = queries()
        spot: dict[str, float] = {}
        spot_pass0: dict[str, float] = {}
        for pass_no in range(2):
            for name in spot_names:
                t0 = time.time()
                qs[name](spark, scaled_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t = round(time.time() - t0, 3)
                if pass_no == 0:
                    spot_pass0[name] = t
                spot[name] = min(spot.get(name, t), t)
                print(f"# sf1 pass{pass_no} {name}: {t}s", file=sys.stderr)
        sf1_spot = {
            "factor": 10,
            "queries": spot,
            "pass0": spot_pass0,
            "ratio_vs_base": {
                n: round(spot[n] / timings[n], 2)
                for n in spot_names
                if timings.get(n)
            },
        }

    total = round(sum(timings.values()), 3)
    # Both estimators in the JSON so round-over-round deltas are never
    # methodology-confounded: `value`/`queries` = min-of-2 (steady state);
    # `pass0` = first pass (includes per-query cold costs like index
    # builds and plan compilation).
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "pass0_total": round(sum(pass0.values()), 3),
                "pass0": pass0,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **({"sf1_spot": sf1_spot} if sf1_spot else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
