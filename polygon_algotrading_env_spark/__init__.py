"""polygon_algotrading_env_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (MatthewHanni/polygon-algotrading-env): market-data
ingestion, dedup, OHLCV bar aggregation, star-schema joins, split/dividend
adjustment (as-of join + cumulative factors), technical indicators, and
incremental/streaming processing — re-expressed Spark-first (DataFrame/SQL,
Catalyst-optimized), plus LLM-data-pipeline extensions (near-duplicate text
dedup, embedding similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7): medallion architecture over partitioned
parquet; everything declarative DataFrame/SQL so Catalyst owns pushdown,
pruning, join selection, and AQE; Python UDFs only where built-ins cannot
express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"

from polygon_algotrading_env_spark.engine import Engine  # noqa: F401
from polygon_algotrading_env_spark.session import get_spark  # noqa: F401
