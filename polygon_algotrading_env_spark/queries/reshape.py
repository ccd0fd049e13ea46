"""Structural/reshaping surface: JSON struct parsing, set aggregation,
pivot, unpivot (SURVEY.md §2.9 array/JSON note + engine extensions).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.queries import register


@register(
    "from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k2
    FROM events
    """,
)
def from_json_struct(spark, sf_dir):
    """Typed JSON parsing: from_json into a struct column (vs
    json_extract_props' per-path string extraction) — the schema-first way
    to land the reference's API payloads."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k bigint").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") * 2).alias("k2"),
    )


@register(
    "collect_set_priorities",
    oracle="""
    SELECT o_custkey,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities
    FROM orders GROUP BY o_custkey
    """,
)
def collect_set_priorities(spark, sf_dir):
    """Set aggregation exposed as a canonical sorted-joined string (array
    cell canonicalization differs between engine client layers; a joined
    string is representation-stable)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities")
        )
    )


@register(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark, sf_dir):
    """Pivot with an explicit value list (never let the engine scan for
    pivot values at scale — that's an extra pass over the fact table)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "unpivot_rates",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'discount' AS rate_type, l_discount AS rate
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax' AS rate_type, l_tax AS rate
    FROM lineitem
    """,
)
def unpivot_rates(spark, sf_dir):
    """Unpivot/melt wide rate columns into (rate_type, rate) rows — the
    long form feature pipelines want."""
    return load_table(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_discount", "l_tax"],
        "rate_type",
        "rate",
    ).withColumn(
        "rate_type",
        F.when(F.col("rate_type") == "l_discount", "discount").otherwise("tax"),
    )
