"""Relational core: filters, projections, distinct/dedup, sorts, limits,
set ops, scalar functions (SURVEY.md §2.2, §2.3, §2.7, §2.8, §2.9).

Everything here is a Catalyst built-in; the value of the corpus is the
oracle check plus the plan shape (pushdown/pruning verified in tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.queries import register


# --- P1/P2: equality filter (reference: market=='stocks', main.py:34) -----
@register(
    "filter_mktsegment",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_mktsegment(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )


# --- P3: range predicate > watermark (old_source_op.py:170-174) -----------
@register(
    "filter_ship_after_watermark",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-06-01 00:00:00'
    """,
)
def filter_ship_after_watermark(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("2000-06-01 00:00:00").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


# --- P5: column projection (main.py:35) -----------------------------------
@register(
    "project_customer",
    oracle="SELECT c_custkey, c_name FROM customer",
)
def project_customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")


# --- D1: full-row dedup of overlapping batches (README.md:20 expectation) -
@register(
    "dedup_overlapping_batches",
    oracle="""
    SELECT event_type, count(*) AS n_events
    FROM (
      SELECT DISTINCT * FROM (
        SELECT * FROM events UNION ALL SELECT * FROM events
      )
    ) GROUP BY event_type
    """,
)
def dedup_overlapping_batches(spark, sf_dir):
    """Reference ingests overlapping pages and dedups downstream
    (reference_endpoints_etl.py:56, aggregates_stocks_etl.py:89); modeled
    as a double-ingest followed by dropDuplicates."""
    ev = load_table(spark, sf_dir, "events")
    both = ev.unionByName(ev)
    return both.dropDuplicates().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# --- D2: distinct single column (main.py:35 .unique()) --------------------
@register(
    "distinct_orderpriority",
    oracle="SELECT DISTINCT o_orderpriority FROM orders",
)
def distinct_orderpriority(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()


# --- O1/F8: sort by derived key (sorted(tickers, key=len), old_source_op.py:208)
@register(
    "sort_by_name_length",
    oracle="SELECT c_custkey, c_name, length(c_name) AS name_len FROM customer",
)
def sort_by_name_length(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", F.length("c_name").alias("name_len"))
        .orderBy("name_len", "c_custkey")
    )


# --- O4: top-k (TakeOrderedAndProject) ------------------------------------
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def topk_orders_by_price(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --- O3: deterministic limit ----------------------------------------------
@register(
    "limit_sorted_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100
    """,
)
def limit_sorted_lineitem(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    )


# --- §2.8: union of page batches + distinct -------------------------------
@register(
    "union_order_slices",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_totalprice > 300000
    UNION
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus = 'P'
    """,
)
def union_order_slices(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    a = orders.filter(F.col("o_totalprice") > 300000)
    b = orders.filter(F.col("o_orderstatus") == "P")
    return a.unionByName(b).distinct()


# --- F2/F4: datetime scalar functions (ts→date, strftime) -----------------
@register(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')    AS order_date,
           CAST(year(o_orderdate) AS INT)       AS order_year,
           CAST(month(o_orderdate) AS INT)      AS order_month,
           strftime(o_orderdate, '%Y%m%d-%H%M%S') AS stamp
    FROM orders
    """,
)
def scalar_datetime_funcs(spark, sf_dir):
    """F1/F2/F4: epoch→timestamp→date→formatted string
    (ts_to_datetime aggregates_etl.py:25-36; strftime helper_functions.py:15-16).

    Dates are exposed as ISO strings: DATE-typed values canonicalize
    differently across engines' client layers."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_format("o_orderdate", "yyyyMMdd-HHmmss").alias("stamp"),
    )


# --- F5/F6/F7/F8: string scalar functions ---------------------------------
@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                   AS brand_u,
           lower(p_type)                    AS type_l,
           concat_ws('#', p_brand, p_type)  AS part_key_str,
           replace(p_type, ' ', '_')        AS type_slug,
           CAST(length(p_name) AS INT)      AS name_len
    FROM part
    """,
)
def scalar_string_funcs(spark, sf_dir):
    """upper/lower normalization (aggregates_etl.py:99, reference_data_etl.py:25),
    concat key-building (aggregates_etl.py:124), replace redaction
    (reference_endpoints_etl.py:31), length (old_source_op.py:208)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.concat_ws("#", "p_brand", "p_type").alias("part_key_str"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.length("p_name").cast("int").alias("name_len"),
    )


# --- F12: conditional mapping (when/otherwise, aggregates_stocks_etl.py:33-41)
@register(
    "case_when_status",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'fulfilled'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_desc
    FROM orders
    """,
)
def case_when_status(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_desc"),
    )


# --- JSON navigation (reference parses API JSON pre-DataFrame; we own it) -
@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


# --- F10: price arithmetic (lineitem revenue expression) ------------------
@register(
    "price_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    """,
)
def price_arithmetic(spark, sf_dir):
    """Rounded at 6 decimals: the product of three 2-decimal quantities has
    exactly 6 decimal digits, so rounding is the identity on the true value
    — no cross-engine round-half tie is possible (rounding at 4 hits exact
    .xxxx5 ties where Spark's HALF_UP and DuckDB's binary-exact rounding
    disagree)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            6,
        ).alias("charged"),
    )
