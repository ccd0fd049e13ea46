"""Custom Python DataSource for paginated market-data ingest (Spark 4
``spark.dataSource.register`` — the native form of SURVEY.md §2.1 S1).

Unlike the driver-side ``paginate_date_cursor`` landing path (right for
one rate-limited API), a DataSource distributes the scan: one input
partition per symbol, each executor runs the cursor loop for its symbols.
That is exactly the reference's ticker fan-out (``main.py:40-44``,
``dag_aggregates_etl.py:363-366``) executed as Spark tasks instead of
sequential ECS containers.

The endpoint is abstracted as a *page store*: ``{root}/{symbol}/page-N.json``
files, each ``{"results": [...]}`` — in production a thin HTTP shim with
the same layout (options can't carry callables to executors); in tests a
directory of JSON fixtures. Cursor semantics (overlap dedup, watermark
skip) are shared with the driver-side reader via the same guard logic.
"""

from __future__ import annotations

import json
import os
import re
import time
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

DEFAULT_SCHEMA = (
    "ticker string, t long, o double, h double, l double, c double, "
    "v double, vw double, n long"
)


def _page_sort_key(name: str) -> tuple:
    """Order page files by their numeric page index, not lexicographically.

    ``sorted()`` on raw names reads ``page-10.json`` before ``page-2.json``;
    the monotonic guard below would then silently drop every record of
    pages 2-9 for any symbol with >=10 pages. Extract the first integer in
    the filename and sort on it; names with no digits sort last, by name.
    """
    m = re.search(r"(\d+)", name)
    return (0, int(m.group(1)), name) if m else (1, 0, name)


class SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


class PolygonPagesReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["path"]
        self.symbols = [s for s in options.get("symbols", "").split(",") if s]
        self.last_entry_ts = (
            int(options["lastentryts"]) if "lastentryts" in options else None
        )
        # Per-symbol watermarks (JSON {symbol: max_ts}) — options are
        # strings, so the bookmark table travels serialized; falls back to
        # the global lastentryts for symbols not in the map.
        self.wm_by_symbol: dict[str, int] = {
            k: int(v)
            for k, v in json.loads(options.get("lastentrybysymbol", "{}")).items()
        }

    def partitions(self):
        symbols = self.symbols or sorted(os.listdir(self.root))
        return [SymbolPartition(s) for s in symbols]

    def read(self, partition: SymbolPartition) -> Iterator[tuple]:
        sym_dir = os.path.join(self.root, partition.symbol)
        if not os.path.isdir(sym_dir):
            return
        fields = [f.name for f in self.schema.fields]
        watermark = self.wm_by_symbol.get(partition.symbol, self.last_entry_ts)
        prev_last_t = None
        for page_name in sorted(os.listdir(sym_dir), key=_page_sort_key):
            with open(os.path.join(sym_dir, page_name)) as f:
                page = json.load(f)
            results = page.get("results") or []
            if not results:
                break  # termination rule 1: empty page
            for rec in results:
                t = rec["t"]
                if watermark is not None and t <= watermark:
                    continue  # watermark guard
                if prev_last_t is not None and t <= prev_last_t:
                    continue  # monotonic guard (page-overlap dup)
                prev_last_t = t
                rec = {**rec, "ticker": partition.symbol}
                yield tuple(rec.get(name) for name in fields)


class PolygonStreamPartition(InputPartition):
    def __init__(self, symbol: str, start_page: int, end_page: int):
        self.symbol = symbol
        self.start_page = start_page
        self.end_page = end_page


class PolygonPagesStreamReader(DataSourceStreamReader):
    """Micro-batch streaming form of the paginated ingest — the native
    Structured Streaming replacement for the reference's daily
    Airflow→ECS incremental pull (``aggregates_etl.py:89-167``,
    watermark plumbing ``dag_aggregates_etl.py:128-179``).

    OFFSETS are the checkpointed date-cursor: ``{"pages": {symbol:
    consumed_page_count}}``. ``latestOffset`` lists the page store on the
    driver (a metadata listing, no data read); ``partitions(start, end)``
    plans ONE InputPartition per symbol with unread pages, and ``read``
    runs executor-side — the same per-ticker fan-out as the batch reader,
    so throughput scales with executors rather than the driver (unlike
    ``SimpleDataSourceStreamReader``, which reads on the driver).

    Exactly-once comes from the offset contract: Spark checkpoints
    ``(start, end)`` per micro-batch and replays a failed batch with the
    SAME page range, and pages are immutable once written. The by-design
    page-overlap duplicate is dropped even when the overlap straddles a
    batch boundary: a partition starting at page N > 0 seeds its
    monotonic guard from the last record of page N-1 (one extra page
    read, no cross-batch state).

    Rate-limit pacing: ``minpagegapms`` sleeps between page reads inside
    each task — the executor-side analogue of the reference's paced
    next_url loop (``aggregates_etl.py:152-166``).

    New symbols appearing in the store are picked up by the next
    ``latestOffset`` and start from page 0. A restarted query resumes
    from the checkpointed offsets, never the initial ones.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["path"]
        self.symbols = [s for s in options.get("symbols", "").split(",") if s]
        self.last_entry_ts = (
            int(options["lastentryts"]) if "lastentryts" in options else None
        )
        # Same per-symbol watermark map as the batch reader: records at or
        # below a symbol's watermark are skipped even on the FIRST batch
        # (checkpointed page offsets only protect restarts of the same
        # query; a brand-new stream over a store with history needs the
        # bookmark to avoid re-emitting already-landed rows).
        self.wm_by_symbol: dict[str, int] = {
            k: int(v)
            for k, v in json.loads(options.get("lastentrybysymbol", "{}")).items()
        }
        self.page_gap_ms = int(options.get("minpagegapms", "0"))

    def _symbol_list(self) -> list[str]:
        if self.symbols:
            return self.symbols
        try:
            return sorted(
                d for d in os.listdir(self.root)
                if os.path.isdir(os.path.join(self.root, d))
            )
        except FileNotFoundError:
            return []

    @staticmethod
    def _pages(sym_dir: str) -> list[str]:
        if not os.path.isdir(sym_dir):
            return []
        return sorted(os.listdir(sym_dir), key=_page_sort_key)

    def initialOffset(self) -> dict:
        return {"pages": {}}

    def latestOffset(self) -> dict:
        return {
            "pages": {
                s: len(self._pages(os.path.join(self.root, s)))
                for s in self._symbol_list()
            }
        }

    def partitions(self, start: dict, end: dict):
        consumed = start.get("pages", {})
        out = []
        for sym, end_p in sorted(end.get("pages", {}).items()):
            start_p = int(consumed.get(sym, 0))
            if int(end_p) > start_p:
                out.append(PolygonStreamPartition(sym, start_p, int(end_p)))
        # A no-progress batch still needs a partition list; empty is valid.
        return out

    def read(self, partition: PolygonStreamPartition) -> Iterator[tuple]:
        sym_dir = os.path.join(self.root, partition.symbol)
        pages = self._pages(sym_dir)
        fields = [f.name for f in self.schema.fields]

        def _page_results(name: str) -> list:
            with open(os.path.join(sym_dir, name)) as f:
                return json.load(f).get("results") or []

        watermark = self.wm_by_symbol.get(partition.symbol, self.last_entry_ts)
        prev_last_t = None
        if partition.start_page > 0:
            # Seed the monotonic guard across the batch boundary: the
            # overlap duplicate repeats the LAST record of the previous
            # page, which a fresh guard would otherwise re-emit.
            prior = _page_results(pages[partition.start_page - 1])
            if prior:
                prev_last_t = prior[-1]["t"]
        for page_name in pages[partition.start_page : partition.end_page]:
            if self.page_gap_ms:
                time.sleep(self.page_gap_ms / 1000.0)
            for rec in _page_results(page_name):
                t = rec["t"]
                if watermark is not None and t <= watermark:
                    continue  # watermark guard
                if prev_last_t is not None and t <= prev_last_t:
                    continue  # monotonic guard (page-overlap dup)
                prev_last_t = t
                rec = {**rec, "ticker": partition.symbol}
                yield tuple(rec.get(name) for name in fields)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; the store is immutable


class PolygonPagesDataSource(DataSource):
    """Usage::

        spark.dataSource.register(PolygonPagesDataSource)
        df = (spark.read.format("polygon_pages")
              .option("path", page_root)
              .option("symbols", "SPY,TLT")
              .load())

        # streaming (micro-batch incremental pull with checkpointed
        # page-cursor offsets):
        sdf = (spark.readStream.format("polygon_pages")
               .option("path", page_root)
               .load())
    """

    @classmethod
    def name(cls) -> str:
        return "polygon_pages"

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return PolygonPagesReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return PolygonPagesStreamReader(schema, self.options)
