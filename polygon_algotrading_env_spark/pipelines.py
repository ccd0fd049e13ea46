"""End-to-end pipelines mirroring the reference's three entry points
(SURVEY.md §3) — the "a reference user could switch" surface.

- :func:`refresh_reference_data` ≙ entry point A/C: paginated dimension
  fetch → dedup → latest+history lake write
  (``polygon-etl-container/src/main.py:31-33`` →
  ``reference_endpoints_etl.py:28-64``;
  ``v2022/.../reference_data_etl.py:36-67``).
- :func:`ingest_aggregates` ≙ entry point B: per-symbol incremental candle
  ingest with watermark resume, monotonic dedup, bronze landing, silver
  partitioned write (``airflow-dags/dag_aggregates_etl.py`` watermark dance
  + ``v2022/.../aggregates_etl.py:89-167``) — except the watermark is a
  bookmark table and the "plan serialization" is Spark's own, not ECS env
  vars.
- :func:`build_gold_bars` ≙ the delegated analytics: bars ladder +
  indicators + adjusted series (the work the reference outsourced to
  Polygon's aggregation and absent Databricks jobs).

Network fetch is injected (``fetch_page(symbol, from_date) -> dict``);
everything after landing is distributed DataFrame work.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from polygon_algotrading_env_spark.operators.adjust import adjust_prices
from polygon_algotrading_env_spark.operators.bars import ohlcv_bars, resample_bars
from polygon_algotrading_env_spark.operators.dedup import dedup_keep_first, exact_dedup
from polygon_algotrading_env_spark.operators.indicators import with_returns, with_sma
from polygon_algotrading_env_spark.sources.bookmarks import BookmarkStore
from polygon_algotrading_env_spark.sources.readers import (
    land_records,
    paginate_date_cursor,
    paginate_next_url,
)
from polygon_algotrading_env_spark.sources.writers import (
    dual_write_latest_history,
    write_bronze,
    write_partitioned,
)

CANDLE_SCHEMA = (
    "ticker string, t long, o double, h double, l double, c double, "
    "v double, vw double, n long"
)


def refresh_reference_data(
    spark: SparkSession,
    fetch: Callable[[str | None], dict],
    schema: str,
    latest_path: str,
    history_path: str,
    snapshot_id: str,
) -> DataFrame:
    """Dimension refresh: paginate → dedup → dual write → return the dim.

    Matches A/C semantics: full refresh each run, duplicates from page
    overlap dropped, history snapshot retained.
    """
    records = list(paginate_next_url(fetch))
    dim = exact_dedup(land_records(spark, records, schema))
    dim = dim.withColumn("ingest_ts", F.current_timestamp())
    dual_write_latest_history(dim, latest_path, history_path, snapshot_id)
    return dim


def ingest_aggregates(
    spark: SparkSession,
    symbols: Sequence[str],
    fetch_page: Callable[[str, str], dict],
    lake_root: str,
    start_date: str,
    end_date: str,
    adjusted: bool = True,
    page_limit: int = 50_000,
) -> DataFrame:
    """Incremental candle ingest for a symbol set.

    Per symbol: resume from the bookmark watermark, pull pages with the
    date-cursor scan (overlap/monotonic guards), land to bronze, then
    per-(ticker, t) dedup → silver partitioned by (adjusted, ticker).
    Returns the silver increment.
    """
    store = BookmarkStore(f"{lake_root}/bookmarks", key_cols=["ticker", "adjusted"])
    bookmarks = store.load(spark)
    wm_by_symbol: dict[str, int] = {}
    if bookmarks is not None:
        for r in bookmarks.filter(F.col("adjusted") == adjusted).collect():
            wm_by_symbol[r["ticker"]] = r["max_ts"]

    all_rows: list[dict] = []
    for sym in symbols:  # API-bound loop: the reference's fan-out (J1)
        rows = paginate_date_cursor(
            lambda from_date, sym=sym: fetch_page(sym, from_date),
            start_date,
            end_date,
            limit=page_limit,
            last_entry_ts=wm_by_symbol.get(sym),
        )
        all_rows.extend({**r, "ticker": sym} for r in rows)

    if not all_rows:
        return spark.createDataFrame([], CANDLE_SCHEMA).withColumn(
            "adjusted", F.lit(adjusted)
        )

    landed = land_records(spark, all_rows, CANDLE_SCHEMA).withColumn(
        "adjusted", F.lit(adjusted)
    )
    write_bronze(landed, f"{lake_root}/bronze/candles")

    silver = dedup_keep_first(landed, keys=["ticker", "adjusted", "t"], order_col="t")
    write_partitioned(silver, f"{lake_root}/silver/candles", ["adjusted", "ticker"])
    store.update(landed, "t")
    return silver


def build_gold_bars(
    candles: DataFrame,
    actions: DataFrame | None = None,
    resolutions: Sequence[str] = ("5 minutes", "1 hour", "1 day"),
    sma_window: int = 20,
) -> dict[str, DataFrame]:
    """Gold layer: bar ladder + indicators (+ adjusted prices if actions
    given) from silver candles with columns (ticker, t, o,h,l,c,v, ts).

    The ladder reuses each finer resolution (resample, not re-scan) —
    old_source_op.py:18's 1m→…→1d period list, computed once from ticks.
    """
    out: dict[str, DataFrame] = {}
    base = ohlcv_bars(
        candles,
        ts_col="ts",
        price_col="c",
        duration=resolutions[0],
        keys=("ticker",),
        volume_col="v",
        order_col="t",
    )
    out[resolutions[0]] = base
    prev = base
    for res in resolutions[1:]:
        prev = resample_bars(prev, res, keys=("ticker",))
        out[res] = prev

    enriched = with_sma(
        base, "close", sma_window, keys=["ticker"], order_cols=["bucket_start"]
    )
    enriched = with_returns(enriched, "close", ["ticker"], ["bucket_start"])
    out["indicators"] = enriched

    if actions is not None:
        out["adjusted"] = adjust_prices(
            base.withColumn("ts", F.col("bucket_start")),
            actions,
            price_cols=("open", "high", "low", "close"),
        )
    return out
