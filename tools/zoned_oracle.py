"""Dual-shape oracle evidence for the adaptively-gated queries.

The zoning gate (operators/zonedroll.py:zoning_mode) means the driver's
CORRECTNESS runs at fixture scale only ever hash-certify the GLOBAL
shape — every committed fixture sits below ZONING_ROW_THRESHOLD. The
zoned shape is what a 100 TB cluster runs, so its hash evidence must be
just as durable (r11 VERDICT item 3). This tool runs every GATED query
under BOTH forced shapes at each given SF dir, hash-compares each
result against the same DuckDB oracle the driver uses, and commits the
outcome to ZONED_ORACLE.json at the repo root:

    python tools/zoned_oracle.py [sf_dir ...]   # default sf0.01 + sf0.1

tests/test_docs_counts.py pins the artifact: all shapes present, all
hash_match true. Exit code 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polygon_algotrading_env_spark.catalog import TABLES  # noqa: E402
from polygon_algotrading_env_spark.operators.zonedroll import (  # noqa: E402
    GATED_QUERIES,
)
from polygon_algotrading_env_spark.queries import REGISTRY  # noqa: E402
from polygon_algotrading_env_spark.session import get_spark  # noqa: E402
from tools.oracle_check import compare  # noqa: E402


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="zoned-oracle-evidence")
    prior = os.environ.get("SPARK_GRAFT_ZONING")
    record: dict = {"queries": {}}
    failures: list[str] = []
    try:
        for sf_dir in sf_dirs:
            sf_key = "sf" + sf_dir.rstrip("/").rsplit("sf", 1)[-1]
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            for name in GATED_QUERIES:
                spec = REGISTRY[name]
                odf = con.execute(spec.oracle).df()
                for shape in ("global", "zoned"):
                    os.environ["SPARK_GRAFT_ZONING"] = shape
                    t0 = time.time()
                    sdf = spec.fn(spark, sf_dir).toPandas()
                    errs = compare(name, sdf, odf)
                    ok = not errs
                    record["queries"].setdefault(name, {}).setdefault(
                        sf_key, {}
                    )[shape] = {"hash_match": ok, "rows": len(sdf)}
                    tag = "ok   " if ok else "FAIL "
                    print(
                        f"{tag} {sf_key} {shape:6s} {name}: {len(sdf)} rows "
                        f"({time.time() - t0:.1f}s)"
                        + ("" if ok else " " + "; ".join(errs))
                    )
                    if not ok:
                        failures.append(f"{sf_key}/{shape}/{name}")
            con.close()
    finally:
        if prior is None:
            os.environ.pop("SPARK_GRAFT_ZONING", None)
        else:
            os.environ["SPARK_GRAFT_ZONING"] = prior
    record["sf_dirs"] = sf_dirs
    record["failures"] = failures
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ZONED_ORACLE.json",
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
