"""Structured Streaming pipelines (SURVEY.md §2.10) — the live-market-data
path the reference approximates with daily incremental batch."""

from polygon_algotrading_env_spark.streaming.pipeline import (  # noqa: F401
    stream_dedup,
    stream_ohlcv_bars,
)
