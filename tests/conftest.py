from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polygon_algotrading_env_spark.session import get_spark
from polygon_algotrading_env_spark.streaming.statev2 import (
    ensure_protobuf_runtime,
)

# Must run at import time — BEFORE any SparkSession (JVM) exists — so the
# protobuf fallback lands on PYTHONPATH and executor Python workers inherit
# it (transformWithState v2's state protocol is protobuf-framed). No-op
# when protobuf is installed; harmless when no fallback exists.
ensure_protobuf_runtime()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="polygon-algotrading-env-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
