"""Joins (SURVEY.md §2.5): broadcast dim join (J1), star-schema chain (J2),
and the as-of join owning Polygon's split-adjustment semantics (J3).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.operators.asof import asof_join
from polygon_algotrading_env_spark.queries import register


# --- J1: fact ⋈ broadcast dim (ticker fan-out, main.py:40-44) -------------
@register(
    "join_lineitem_part_broadcast",
    headline=True,
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_quantity), 4)      AS sum_qty,
           round(sum(l.l_extendedprice), 4) AS revenue,
           count(*)                         AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_lineitem_part_broadcast(spark, sf_dir):
    """The reference's dim-driven fan-out (tickers ⋉ candles) as a broadcast
    hash join: dim ships to every executor, fact never shuffles for the
    join (only for the final small-key aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- J1 semi form: dim rows that have facts -------------------------------
@register(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_customers_with_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --- anti join: dims with no facts (gap detection) ------------------------
@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- J2: star-schema chain (orders⋈customer⋈nation⋈region) ----------------
@register(
    "star_join_revenue_by_region",
    headline=True,
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*)                        AS n_orders,
           round(sum(o.o_totalprice), 2)   AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey   = c.c_custkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    JOIN region   r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def star_join_revenue_by_region(spark, sf_dir):
    """FK storage-layout relation of the reference (per-ticker prefixes ↔
    tickers dim in RDS, aggregates_etl.py:99,124 / dag:54) as a real join
    chain. All dims broadcast; the fact table is scanned once, unshuffled
    until the final aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


# --- J3 forward: next event strictly after each order (backtest lookup) ---
@register(
    "asof_next_event_after_order",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           m.event_id AS next_event_id,
           m.value    AS next_value
    FROM orders o
    LEFT JOIN LATERAL (
      SELECT e.event_id, e.value
      FROM events e
      WHERE e.user_id = o.o_custkey AND e.ts > o.o_orderdate
      ORDER BY e.ts ASC, e.event_id ASC
      LIMIT 1
    ) m ON TRUE
    """,
)
def asof_next_event_after_order(spark, sf_dir):
    """Forward-strict as-of: each order matched to the user's first event
    strictly after the order date — the backtest primitive ('what happened
    next'). Same union+LOCF plan, descending sort direction.

    Tie-break note: the operator keeps the greatest tie_break among rights
    at the same timestamp; for 'earliest event wins' the tie_break is
    negated event_id. Event timestamps are nanos-unique, so this only
    guards pathological inputs.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey"), F.col("o_orderdate")
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").alias("ev_ts"),
        "event_id",
        "value",
        (-F.col("event_id")).alias("neg_event_id"),
    )
    joined = asof_join(
        orders,
        ev,
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ev_ts",
        direction="forward",
        allow_exact_matches=False,
        tie_break="neg_event_id",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        F.col("event_id").alias("next_event_id"),
        F.col("value").alias("next_value"),
    )


# --- J3: as-of join (split/dividend adjustment semantics) -----------------
@register(
    "asof_latest_order_before_event",
    headline=True,
    oracle="""
    SELECT e.event_id, e.user_id,
           m.o_orderkey  AS last_orderkey,
           m.o_orderdate AS last_orderdate
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o.o_orderkey, o.o_orderdate
      FROM orders o
      WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
      LIMIT 1
    ) m ON TRUE
    """,
)
def asof_latest_order_before_event(spark, sf_dir):
    """As-of join: each event matched to the user's most recent order at or
    before the event time (J3's candle↔corporate-action pattern). The
    union+LOCF plan shuffles once; the DuckDB oracle uses a lateral top-1,
    which is only feasible at oracle scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), F.col("ts")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts_right"),
        "o_orderkey",
        "o_orderdate",
    )
    joined = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="ts_right",
        direction="backward",
        allow_exact_matches=True,
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


@register(
    "asof_chunked_order_before_event",
    oracle="""
    SELECT e.event_id, e.user_id,
           m.o_orderkey  AS last_orderkey,
           m.o_orderdate AS last_orderdate
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o.o_orderkey, o.o_orderdate
      FROM orders o
      WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
      LIMIT 1
    ) m ON TRUE
    """,
)
def asof_chunked_order_before_event(spark, sf_dir):
    """The hot-key-safe chunked as-of join certified against the SAME
    lateral-top-1 oracle as ``asof_latest_order_before_event`` — per
    (user, 90-day-chunk) LOCF with boundary carry-forward must be
    indistinguishable from the single-window plan."""
    from polygon_algotrading_env_spark.operators.asof import asof_join_chunked

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), F.col("ts")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts_right"),
        "o_orderkey",
        "o_orderdate",
    )
    joined = asof_join_chunked(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="ts_right",
        chunk_seconds=90 * 86400,
        direction="backward",
        allow_exact_matches=True,
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )
