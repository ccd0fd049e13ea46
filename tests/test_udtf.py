"""UDTF surface: lateral page explosion from bronze JSON blobs."""

import json

import pytest

from polygon_algotrading_env_spark.functions.udtf import register_udtfs

PAGE = json.dumps(
    {
        "results": [
            {"t": 1000, "o": 1.0, "h": 2.0, "l": 0.5, "c": 1.5, "v": 10.0,
             "vw": 1.2, "n": 3},
            {"t": 2000, "o": 1.5, "h": 1.6, "l": 1.4, "c": 1.6, "v": 5.0},
        ],
        "resultsCount": 2,
    }
)


def test_lateral_parse_candle_page(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [("SPY", PAGE), ("EMPTY", json.dumps({"results": []}))],
        "ticker string, raw string",
    ).createOrReplaceTempView("bronze_pages")
    rows = spark.sql(
        """
        SELECT b.ticker, p.t, p.c, p.vw, p.n
        FROM bronze_pages b, LATERAL parse_candle_page(b.raw) p
        ORDER BY p.t
        """
    ).collect()
    assert [(r["ticker"], r["t"], r["c"]) for r in rows] == [
        ("SPY", 1000, 1.5),
        ("SPY", 2000, 1.6),
    ]
    # optional fields absent -> NULL, not a crash
    assert rows[1]["vw"] is None and rows[1]["n"] is None


def test_malformed_page_fails_loudly(spark):
    register_udtfs(spark)
    spark.createDataFrame([("X", "{not json")], "ticker string, raw string")\
        .createOrReplaceTempView("bronze_bad")
    with pytest.raises(Exception):
        spark.sql(
            "SELECT * FROM bronze_bad b, LATERAL parse_candle_page(b.raw)"
        ).collect()
