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
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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

    def partitions(self):
        symbols = self.symbols or sorted(os.listdir(self.root))
        return [SymbolPartition(s) for s in symbols]

    def read(self, partition: SymbolPartition) -> Iterator[tuple]:
        sym_dir = os.path.join(self.root, partition.symbol)
        if not os.path.isdir(sym_dir):
            return
        fields = [f.name for f in self.schema.fields]
        prev_last_t = None
        for page_name in sorted(os.listdir(sym_dir), key=_page_sort_key):
            with open(os.path.join(sym_dir, page_name)) as f:
                page = json.load(f)
            results = page.get("results") or []
            if not results:
                break  # termination rule 1: empty page
            for rec in results:
                t = rec["t"]
                if self.last_entry_ts is not None and t <= self.last_entry_ts:
                    continue  # watermark guard
                if prev_last_t is not None and t <= prev_last_t:
                    continue  # monotonic guard (page-overlap dup)
                prev_last_t = t
                rec = {**rec, "ticker": partition.symbol}
                yield tuple(rec.get(name) for name in fields)


class PolygonPagesDataSource(DataSource):
    """Usage::

        spark.dataSource.register(PolygonPagesDataSource)
        df = (spark.read.format("polygon_pages")
              .option("path", page_root)
              .option("symbols", "SPY,TLT")
              .load())
    """

    @classmethod
    def name(cls) -> str:
        return "polygon_pages"

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return PolygonPagesReader(schema, self.options)
