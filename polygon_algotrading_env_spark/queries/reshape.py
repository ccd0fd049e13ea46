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
    "array_higher_order_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 6)        AS max_c,
           round(list_sum(list_transform(embedding,
                 x -> CAST(abs(x) AS DOUBLE))), 6)              AS l1_norm
    FROM embeddings
    """,
)
def array_higher_order_ops(spark, sf_dir):
    """Catalyst higher-order functions over array columns: filter/exists
    semantics (positive-component count), element max, and an aggregate
    fold (L1 norm) — all JVM-side, no explode."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_c"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("l1_norm"),
    )


@register(
    "levenshtein_adjacent_parts",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    """,
)
def levenshtein_adjacent_parts(spark, sf_dir):
    """Edit-distance similarity (fuzzy entity matching — the dedup-family
    string metric) over a deterministic pair set."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_b") == F.col("key_a") + 1)
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("edit_dist"),
        )
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
