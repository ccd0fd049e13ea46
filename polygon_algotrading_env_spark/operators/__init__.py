"""Engine operators.

Each module owns one family from SURVEY.md §2 / §7:

- ``asof``       — as-of (nearest-key) joins, the one join the reference
                   delegates to Polygon's ``adjusted`` param (SURVEY §2.5 J3).
- ``bars``       — OHLCV tumbling-window bar aggregation + resample ladder
                   (SURVEY §2.4 A7/A8, §2.6 W3), delegated to the API by the
                   reference.
- ``adjust``     — split/dividend price adjustment via suffix cumulative
                   factors + as-of join (SURVEY §2.5 J3).
- ``indicators`` — technical indicators over window frames (SURVEY §2.6 W4).
- ``dedup``      — exact and near-duplicate dedup (SURVEY §2.3 + extensions).
- ``similarity`` — embedding similarity search (extension surface).
"""

from polygon_algotrading_env_spark.operators.asof import asof_join  # noqa: F401
from polygon_algotrading_env_spark.operators.bars import ohlcv_bars, resample_bars  # noqa: F401
