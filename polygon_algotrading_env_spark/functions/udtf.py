"""Python UDTFs — the table-valued escape hatch (SURVEY.md §2.11).

The reference navigates API response JSON imperatively before any
DataFrame exists (``aggregates_etl.py:128-140``: ``response['results']``
loop → per-record guards). ``parse_candle_page`` owns that shape as a
lateral table function: one raw page blob in, N typed candle rows out —
usable from SQL as ``LATERAL parse_candle_page(raw)`` over a bronze table
of archived responses (the K1 raw zone), which is exactly how you
re-derive silver from bronze without re-fetching.

UDTFs run row-at-a-time in Python; that is acceptable here BECAUSE the
unit of work is a page (≤50k records per the reference's ``limit=``), so
the Python crossing amortizes over thousands of output rows. For
per-record scalar work the engine's rule stands: built-ins first, Arrow
UDFs second (ARCHITECTURE.md "Python is quarantined").
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType=(
    "t bigint, o double, h double, l double, c double, "
    "v double, vw double, n bigint"
))
class parse_candle_page:
    """Explode one archived aggregates-page JSON blob into candle rows.

    Tolerates the raw-zone realities the reference guards against:
    missing ``results`` (empty page → zero rows), records missing
    optional fields (``vw``/``n`` → NULL), malformed JSON raises — a
    corrupt bronze object should fail loudly, not vanish.
    """

    def eval(self, page: str):
        if page is None:
            return
        doc = json.loads(page)
        for rec in doc.get("results") or []:
            yield (
                rec.get("t"),
                rec.get("o"),
                rec.get("h"),
                rec.get("l"),
                rec.get("c"),
                rec.get("v"),
                rec.get("vw"),
                rec.get("n"),
            )


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs for SQL use (idempotent)."""
    spark.udtf.register("parse_candle_page", parse_candle_page)
