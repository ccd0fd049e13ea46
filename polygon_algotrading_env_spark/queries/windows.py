"""Window functions (SURVEY.md §2.6 W1/W2/W4 + ranking extensions).

Every window has a deterministic total order (explicit tiebreak columns) —
non-deterministic frame orders are correctness bugs in a distributed engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.queries import register


# --- W1: per-group resume point / recent-n (per-ticker watermark) ---------
@register(
    "rownum_recent_orders_per_customer",
    headline=True,
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def rownum_recent_orders_per_customer(spark, sf_dir):
    """The reference discovers each ticker's resume point by argmax over S3
    objects (dag_aggregates_etl.py:64-179); natively it's a per-key ranking
    window — one shuffle on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --- W2: lag / monotonic last-seen check (aggregates_etl.py:135-137) ------
@register(
    "lag_value_per_user",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_value
    FROM events
    """,
)
def lag_value_per_user(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )


# --- W4: moving average over a row frame (technical-indicator core) -------
@register(
    "moving_avg_price_per_supplier",
    headline=True,
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4)
           / count(*) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS mavg_20
    FROM lineitem
    """,
)
def moving_avg_price_per_supplier(spark, sf_dir):
    """Moving average as round(windowed sum)/windowed count — same
    stabilize-then-exact-divide pattern as pricing_summary (direct avg
    rounding hits cross-engine round-half ties for dyadic window sizes)."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(-19, 0)
    )
    return load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.round(F.sum("l_extendedprice").over(w), 4)
            / F.count(F.lit(1)).over(w)
        ).alias("mavg_20"),
    )


# --- J3 ingredient: cumulative product via exp(sum(log)) ------------------
@register(
    "cumulative_factor_per_supplier",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(exp(sum(ln(1 + l_discount)) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_discount
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)), 6)
             AS cum_factor
    FROM lineitem
    """,
)
def cumulative_factor_per_supplier(spark, sf_dir):
    """The split-adjustment cumulative product (SURVEY §2.5 J3) in its
    oracle-checkable form: rolling Π(1+x) = exp(Σ ln(1+x)) over an ordered
    frame. The frame is bounded (5 factors) so the product stays O(1) and
    6-decimal rounding sits far above cross-engine ulp noise — an unbounded
    running product grows to ~1e6 where ulp noise reaches the rounding grid.
    (The real adjustment operator, operators/adjust.py, needs the factor
    only to double precision, not to a hash-exact decimal.)"""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_discount")
        .rowsBetween(-4, 0)
    )
    return load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.exp(F.sum(F.log(1 + F.col("l_discount"))).over(w)), 6).alias(
            "cum_factor"
        ),
    )


# --- winsorization: per-group quantile clip -------------------------------
@register(
    "winsorize_price_per_flag",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(least(greatest(l_extendedprice,
                   quantile_cont(l_extendedprice, 0.05)
                     OVER (PARTITION BY l_returnflag)),
                 quantile_cont(l_extendedprice, 0.95)
                     OVER (PARTITION BY l_returnflag)), 6)
             AS price_winsorized
    FROM lineitem
    """,
)
def winsorize_price_per_flag(spark, sf_dir):
    """Outlier clipping to exact per-group [p5, p95] (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``) — the reproducible pre-training/indicator
    guard. Quantiles come from a groupBy aggregate broadcast-joined back,
    NOT a window over the 3-value group (which would funnel every row
    through 3 reducers). Round-6 is tie-free: interpolated quantiles of
    2-decimal inputs have ≤4 exact decimals (the fraction p·(n−1) has
    ≤2)."""
    from polygon_algotrading_env_spark.operators.sampling import (
        winsorize_per_group,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return winsorize_per_group(
        li, "l_extendedprice", ["l_returnflag"], lower=0.05, upper=0.95
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice_winsorized", 6).alias("price_winsorized"),
    )


# --- first_value / nth_value over ordered frames --------------------------
@register(
    "first_nth_value_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_orderkey,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def first_nth_value_per_customer(spark, sf_dir):
    """first/nth/last_value over explicit deterministic frames (A5's
    'first date with data' generalization). last_value uses an unbounded
    frame — the default running frame would just echo the current row."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_orderkey"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
        F.last_value("o_orderkey").over(w_full).alias("last_orderkey"),
    )


# --- ranking extension: top-n per group via row_number --------------------
@register(
    "top5_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 5
    """,
)
def top5_orders_per_priority(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )
