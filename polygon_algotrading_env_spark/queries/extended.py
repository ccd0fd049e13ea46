"""Extended capability corpus: engine surface beyond the reference's own
operator set, declared in SURVEY.md §2 as built-in extensions (set ops,
CUBE, ranking, percentiles, range frames, SQL API) plus the remaining
scalar-function rows (F9 nonce, O5 shuffle, F3 audit columns, A7 vwap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from polygon_algotrading_env_spark.catalog import load_table, register_views
from polygon_algotrading_env_spark.queries import register


# --- A7 completion: vwap with hash-exact semantics ------------------------
@register(
    "vwap_5m",
    headline=True,
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket_start,
           round(sum(value * value), 6)
             / nullif(round(sum(value), 4), 0) AS vwap
    FROM events
    GROUP BY event_type, bucket_start
    """,
)
def vwap_5m(spark, sf_dir):
    """VWAP per bucket (A7's Σ(p·v)/Σv with value as both price and size).
    Both numerator and denominator are stabilized by rounding (their true
    values have ≤4 decimals, so rounding is the identity), then divided —
    IEEE division of identical doubles is bit-identical across engines.
    Zero-volume buckets (they exist at sf0.1) → NULL via NULLIF in both
    engines; an unguarded divide is an ANSI runtime error in Spark 4."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "5 minutes").alias("__w"))
        .agg(
            (
                F.round(F.sum(F.col("value") * F.col("value")), 6)
                / F.nullif(F.round(F.sum("value"), 4), F.lit(0.0))
            ).alias("vwap")
        )
        .select("event_type", F.col("__w.start").alias("bucket_start"), "vwap")
    )


# --- §2.8: intersect / except ---------------------------------------------
@register(
    "intersect_order_slices",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
    INTERSECT
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_order_slices(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return a.intersect(b)


@register(
    "except_order_slices",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_order_slices(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return a.exceptAll(b).distinct()


@register(
    "except_all_parts",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity >= 30
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def except_all_parts(spark, sf_dir):
    """Multiset EXCEPT ALL — per-row multiplicities survive (the
    bag-semantics sibling of except_order_slices' DISTINCT variant);
    Spark plans it as a count-bookkeeping aggregate, no row explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 30).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.exceptAll(b)


@register(
    "intersect_all_parts",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity >= 30
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def intersect_all_parts(spark, sf_dir):
    """Multiset INTERSECT ALL — min(multiplicity) per key."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 30).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.intersectAll(b)


# --- CUBE -----------------------------------------------------------------
@register(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- ranking: rank / dense_rank (deterministic under ties) ----------------
@register(
    "rank_orders_in_priority",
    oracle="""
    SELECT o_orderkey,
           rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
    FROM orders
    """,
)
def rank_orders_in_priority(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --- percentiles (continuous interpolation) -------------------------------
@register(
    "median_qty_per_flag",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6)  AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 6)  AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def median_qty_per_flag(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
        )
    )


# --- date arithmetic ------------------------------------------------------
@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY                              AS due_ts,
           CAST(datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                         o_orderdate) AS INT)                         AS epoch_day,
           CAST(datepart('quarter', o_orderdate) AS INT)              AS qtr
    FROM orders
    """,
)
def date_arithmetic(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_ts"),
        F.date_diff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz")
        )
        .cast("int")
        .alias("epoch_day"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    )


# --- string functions II: substring / pad / split / regexp_extract --------
@register(
    "string_funcs_extended",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 1, 8)                           AS name8,
           lpad(p_brand, 12, '_')                            AS brand_pad,
           str_split(p_type, ' ')[1]                         AS type_head,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num
    FROM part
    """,
)
def string_funcs_extended(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name8"),
        F.lpad("p_brand", 12, "_").alias("brand_pad"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
    )


# --- null handling: coalesce / nullif / greatest / least ------------------
@register(
    "null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_tax, l_discount)                 AS max_rate,
           least(l_tax, l_discount)                    AS min_rate,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def null_handling(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


# --- time-range window frame (30-day trailing sum) ------------------------
@register(
    "range_frame_30d_qty",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY CAST(datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                                    l_shipdate) AS BIGINT)
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 4) AS qty_30d
    FROM lineitem
    """,
)
def range_frame_30d_qty(spark, sf_dir):
    """Time-based RANGE frame (the technical-indicator 'trailing 30
    calendar days' shape, distinct from W4's row frame): order by epoch-day
    and bound the frame by value, not row count."""
    li = load_table(spark, sf_dir, "lineitem")
    epoch_day = F.date_diff(
        F.col("l_shipdate"), F.lit("1970-01-01").cast("timestamp_ntz")
    ).cast("bigint")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(epoch_day)
        .rangeBetween(-29, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 4).alias("qty_30d"),
    )


# --- SQL API: the engine accepts textual SQL over registered views --------
_SQL_TOP_CUSTOMERS = """
    SELECT c.c_custkey, c.c_name, count(*) AS n_big_orders
    FROM customer c
    WHERE c.c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    )
    AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_custkey, c.c_name
    HAVING count(*) >= 1
"""


@register("sql_api_in_exists_having", oracle=_SQL_TOP_CUSTOMERS)
def sql_api_in_exists_having(spark, sf_dir):
    """Same SQL text runs on both engines: IN-subquery (Catalyst rewrites
    to semi join), correlated EXISTS, GROUP BY + HAVING — the spark.sql
    entry point over registered views.

    NB: the outer count(*) counts customer rows (1 per group), kept
    deliberately so the identical SQL string is its own oracle.
    """
    register_views(spark, sf_dir)
    return spark.sql(_SQL_TOP_CUSTOMERS)


# --- O5/F9/F3: nondeterministic surface (rows-only checks) ----------------
@register("shuffled_work_order", oracle=None)
def shuffled_work_order(spark, sf_dir):
    """O5: random work-order shuffle (main.py:36 random.shuffle) — seeded
    rand() is deterministic per plan but not across engines → rows-only."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", F.rand(seed=42).alias("shuffle_key"))
        .orderBy("shuffle_key")
    )


@register("audit_and_nonce_columns", oracle=None)
def audit_and_nonce_columns(spark, sf_dir):
    """F3 (ingestion audit timestamp, reference_data_etl.py:66) + F9
    (5-char uppercase nonce, helper_functions.py:25-36) — value-
    nondeterministic by design → rows-only."""
    nonce = F.upper(F.substring(F.md5(F.rand(seed=7).cast("string")), 1, 5))
    return load_table(spark, sf_dir, "region").select(
        "r_regionkey",
        F.current_timestamp().alias("ingest_ts"),
        nonce.alias("nonce"),
    )


@register("approx_distinct_parts", oracle=None)
def approx_distinct_parts(spark, sf_dir):
    """HyperLogLog++ approximate distinct — engine-specific sketches →
    rows-only (the exact variant is oracle-checked in
    count_distinct_parts_per_flag)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
           count(o_custkey) AS n_nonnull,
           count(DISTINCT o_custkey) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    """,
)
def profile_orders_columns(spark, sf_dir):
    """Data-quality profile (rows/nulls/cardinality per column) in ONE
    aggregate pass + stack reshape — see operators/profile.py for the
    exact-vs-HLL cost model at scale."""
    from polygon_algotrading_env_spark.operators.profile import column_profile

    return column_profile(
        load_table(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@register(
    "exact_percentiles_per_flag",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS p75,
           round(quantile_cont(l_quantity, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def exact_percentiles_per_flag(spark, sf_dir):
    """Exact interpolated percentiles per group, computed DISTRIBUTED by
    the grid-quantile operator (operators/rankstats.py): grid → zoned
    prefix sums → a scan-side filter keeping ≤2 grid rows per requested
    percentile → one tiny aggregate. Bit-identical to Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` (the same linear
    interpolation recipe, certified by tests/test_rankstats.py), but no
    distinct-value-sized counts buffer ever lands on a single reducer —
    the weakness ``F.percentile`` shares with group-keyed rank windows
    on a ~3-value key like returnflag. The correctness anchor for the
    approx_percentile/median sketch queries."""
    from polygon_algotrading_env_spark.operators.rankstats import (
        grouped_exact_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    probs = (0.25, 0.50, 0.75, 0.99)
    out = grouped_exact_quantiles(
        li,
        "l_quantity",
        ["l_returnflag"],
        probs,
        [f"p{int(q * 100)}" for q in probs],
    )
    return out.select(
        "l_returnflag",
        *[
            F.round(F.col(f"p{int(q * 100)}"), 6).alias(f"p{int(q * 100)}")
            for q in probs
        ],
    )


@register(
    "grouping_sets_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_flag_status(spark, sf_dir):
    """Explicit GROUPING SETS (the generalization rollup/cube specialize):
    per-flag, per-status, and grand-total rows from one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               count(*)                  AS n
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        li=li,
    )


@register(
    "rank_fractions_per_flag",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()   OVER w, 6)  AS cume,
           CAST(ntile(10)      OVER w AS INT) AS decile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_quantity ASC, l_extendedprice ASC,
                          l_orderkey ASC, l_linenumber ASC)
    """,
)
def rank_fractions_per_flag(spark, sf_dir):
    """Fractional ranks (percent_rank/cume_dist/ntile) per group — the
    score-normalization window family. Order includes the value columns
    AND both id columns: (l_orderkey, l_linenumber) alone is not unique in
    the fixture (sampled with replacement), so every tiebreak level is
    explicit. percent_rank/cume_dist are exact small-integer ratios;
    round-6 is far above any ulp divergence."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").asc(),
        F.col("l_extendedprice").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@register(
    "map_and_timezone_suite",
    oracle="""
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 2)  AS prio_name,
           CAST(split_part(o_orderpriority, '-', 1) AS INT) AS prio_num,
           'name,num'                           AS map_keys_sorted,
           strftime(CAST(timezone('America/New_York', o_orderdate)
                         AS TIMESTAMP), '%Y-%m-%d %H:%M') AS utc_wall
    FROM orders
    """,
)
def map_and_timezone_suite(spark, sf_dir):
    """Map-typed columns + DST-aware timezone conversion in one scan.

    The priority code splits into a MAP('num' -> .., 'name' -> ..) via
    str_to_map and is read back with element_at/map_keys — certifying the
    map construction/lookup surface against an oracle that computes the
    same values with split_part. The reference's naive-Eastern-time bug
    (ts_to_datetime TODO, aggregates_etl.py:34) is answered with the
    explicit conversion: to_utc_timestamp(ts, 'America/New_York') — DST
    boundaries included — which DuckDB mirrors as timezone(tz, ts).
    Wall-clock results are exposed as formatted strings so the hash does
    not depend on either engine's timestamp rendering; both sessions run
    UTC (session.py pins Spark; the harness container runs UTC DuckDB).
    """
    o = load_table(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    m = F.str_to_map(
        F.concat_ws(
            ";",
            F.concat(F.lit("num="), parts.getItem(0)),
            F.concat(F.lit("name="), parts.getItem(1)),
        ),
        F.lit(";"),
        F.lit("="),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "name").alias("prio_name"),
        F.element_at(m, "num").cast("int").alias("prio_num"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("map_keys_sorted"),
        F.date_format(
            F.to_utc_timestamp(F.col("o_orderdate"), "America/New_York"),
            "yyyy-MM-dd HH:mm",
        ).alias("utc_wall"),
    )


# --- Spark 4 VARIANT: semi-structured without a schema --------------------
@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           count(*)                                         AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
                                                            AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) % 2 = 0
    GROUP BY 1
    """,
)
def variant_props_stats(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured data: ``parse_json`` once
    into the binary variant encoding, then typed ``variant_get`` path
    extraction — the schema-less alternative to from_json's fixed
    StructType, and the engine-native answer to payloads whose shape
    drifts (the reference archives raw API JSON verbatim and re-parses
    ad hoc). Filter + grouped stats over an extracted int path; the
    oracle uses DuckDB's json_extract on the same strings."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
    )
    return (
        v.where(F.col("k") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


# --- Spark 4 SQL pipe syntax ----------------------------------------------
@register(
    "pipe_syntax_priority_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
)
def pipe_syntax_priority_revenue(spark, sf_dir):
    """Spark 4 SQL pipe syntax (`|>`): the linear form of
    filter→aggregate that reads in dataflow order — certifying the
    engine's SQL-text surface accepts it and plans identically to the
    classic formulation (the oracle IS the classic formulation)."""
    from polygon_algotrading_env_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus <> 'F'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
    """)


# --- Spark 4 SQL scalar UDFs (CREATE FUNCTION ... RETURN) -----------------
@register(
    "sql_udf_discounted_pricing",
    oracle="""
    SELECT l_returnflag,
           count(*)                                              AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 4)     AS disc_rev,
           round(sum(l_extendedprice * (1 - l_discount)
                     * (1 + l_tax)), 4)                          AS charged_rev
    FROM lineitem
    GROUP BY 1
    """,
)
def sql_udf_discounted_pricing(spark, sf_dir):
    """Spark 4 SQL scalar UDFs: business logic declared ONCE as
    `CREATE FUNCTION ... RETURN <expr>` and reused by name across
    queries — the governed-semantics path (a price formula maintained in
    SQL, not copy-pasted into every pipeline). SQL UDFs inline into the
    plan at analysis time (no Python worker, no serialization wall — same
    wholestage codegen as writing the expression by hand), which is why
    the oracle is simply the inlined formula. Certifies definition,
    composition (one UDF calling into the other's result), and use in
    aggregates."""
    from polygon_algotrading_env_spark.catalog import load_table

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_price("
        "p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN disc_price(p, d) * (1.0 + t)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__sql_udf_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*)                                             AS n,
               round(sum(disc_price(l_extendedprice, l_discount)), 4)
                 AS disc_rev,
               round(sum(charged_price(l_extendedprice, l_discount, l_tax)), 4)
                 AS charged_rev
        FROM __sql_udf_lineitem
        GROUP BY 1
        """
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n, k) AS i FROM counts
    ),
    s AS (
      SELECT count(*) AS n_keys, sum(n) AS n_rows, max(n) AS max_n,
             sum(2.0 * i * n) AS s2in
      FROM ranked
    )
    SELECT CAST(n_keys AS BIGINT)                          AS n_keys,
           CAST(n_rows AS BIGINT)                          AS n_rows,
           CAST(max_n AS BIGINT)                           AS max_n,
           round(max_n * 1.0 / n_rows, 6)                  AS max_share,
           round((s2in - (n_keys + 1.0) * n_rows)
                 / (n_keys * 1.0 * n_rows), 6)             AS gini
    FROM s
    """,
)
def key_skew_profile(spark, sf_dir):
    """Shuffle-key skew profile for a candidate join/agg key (l_partkey):
    key count, hottest-key share, and the Gini coefficient of the
    per-key row distribution — the pre-flight check that decides between
    a plain hash shuffle, AQE skew handling, and explicit salting
    (operators/skew.py). Gini uses the sorted-rank identity
    2Σ(i·x) − (n+1)Σx over (n·Σx): counts are one hash aggregate, and
    the global rank comes from with_global_ordinals (operators/ids.py) —
    range-partitioned, never a one-task ORDER BY window, so the profile
    stays parallel even when the KEY domain itself is billions of rows
    (exactly the regime where you'd be running a skew profile). Final
    reduction is a single row; exact-integer inputs make round-6
    tie-free."""
    from polygon_algotrading_env_spark.operators.ids import (
        with_global_ordinals,
    )

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ranked = with_global_ordinals(counts, ["n", "k"], ordinal_col="i").select(
        "n", "i"
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_n"),
        F.sum(2.0 * F.col("i") * F.col("n")).alias("s2in"),
    )
    return s.select(
        "n_keys",
        "n_rows",
        "max_n",
        F.round(F.col("max_n") * 1.0 / F.col("n_rows"), 6).alias("max_share"),
        F.round(
            (F.col("s2in") - (F.col("n_keys") + 1.0) * F.col("n_rows"))
            / (F.col("n_keys") * 1.0 * F.col("n_rows")),
            6,
        ).alias("gini"),
    )


@register(
    "dq_constraint_audit",
    oracle="""
    WITH checks AS (
      SELECT 'o_totalprice_positive' AS constraint_name,
             count(*) FILTER (WHERE o_totalprice <= 0) AS n_violations,
             count(*) AS n_checked
      FROM orders
      UNION ALL
      SELECT 'o_orderdate_not_null',
             count(*) FILTER (WHERE o_orderdate IS NULL), count(*)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority_in_domain',
             count(*) FILTER (WHERE o_orderpriority NOT IN
               ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')),
             count(*)
      FROM orders
      UNION ALL
      SELECT 'o_custkey_fk_customer',
             count(*) FILTER (WHERE c.c_custkey IS NULL), count(*)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'o_orderkey_unique',
             (SELECT count(*) FROM
               (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)),
             count(DISTINCT o_orderkey)
      FROM orders
    )
    SELECT constraint_name,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT)    AS n_checked,
           n_violations = 0             AS passed
    FROM checks
    """,
)
def dq_constraint_audit(spark, sf_dir):
    """Declarative data-quality audit over the orders table — the
    expectation checks (non-null, domain membership, range, FK integrity,
    key uniqueness) every pipeline runs before promoting a bronze batch.
    Plan economics: the four row-local checks share ONE scan via
    conditional aggregation (count(when(...))) — never one job per
    constraint; the FK check is a broadcast left join counted in the same
    style; uniqueness is a groupBy on the key with a HAVING-style filter.
    Emitting counts (not booleans alone) makes the audit monotonic for
    incremental runs: per-batch counts add up."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def check(name, bad, checked):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            bad.cast("bigint").alias("n_violations"),
            checked.cast("bigint").alias("n_checked"),
        )

    n = F.count(F.lit(1))
    bad = lambda cond: F.count(F.when(cond, 1))
    row_local = orders.agg(
        F.array(
            check(
                "o_totalprice_positive",
                bad(F.col("o_totalprice") <= 0),
                n,
            ),
            check(
                "o_orderdate_not_null",
                bad(F.col("o_orderdate").isNull()),
                n,
            ),
            check(
                "o_orderpriority_in_domain",
                bad(
                    ~F.col("o_orderpriority").isin(
                        "1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW",
                    )
                ),
                n,
            ),
        ).alias("cks")
    )
    fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.array(
                check(
                    "o_custkey_fk_customer", bad(F.col("c_custkey").isNull()), n
                )
            ).alias("cks")
        )
    )
    uniq = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.array(
                check("o_orderkey_unique", bad(F.col("c") > 1), n)
            ).alias("cks")
        )
    )
    all_checks = row_local.unionByName(fk).unionByName(uniq)
    return (
        all_checks.select(F.explode("cks").alias("ck"))
        .select("ck.*")
        .withColumn("passed", F.col("n_violations") == 0)
    )


@register(
    "psi_price_drift",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    tagged AS (
      SELECT o_totalprice,
             epoch_us(o_orderdate) * 2 <= epoch_us(lo) + epoch_us(hi)
               AS is_base
      FROM orders CROSS JOIN bounds
    ),
    edges AS (
      SELECT quantile_cont(o_totalprice,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
      FROM tagged WHERE is_base
    ),
    binned AS (
      SELECT is_base,
             1 + len(list_filter(e, x -> x < o_totalprice)) AS bin
      FROM tagged CROSS JOIN edges
    ),
    counts AS (
      SELECT bin,
             count(*) FILTER (WHERE is_base)     AS nb,
             count(*) FILTER (WHERE NOT is_base) AS nc
      FROM binned GROUP BY 1
    ),
    tot AS (
      SELECT sum(nb) AS tb, sum(nc) AS tc FROM counts
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(nb AS BIGINT) AS n_base,
           CAST(nc AS BIGINT) AS n_current,
           round(((nc * 1.0 / tc) - (nb * 1.0 / tb))
                 * ln((nc * 1.0 / tc) / (nb * 1.0 / tb)), 6) AS psi_term
    FROM counts CROSS JOIN tot
    WHERE nb > 0 AND nc > 0
    """,
)
def psi_price_drift(spark, sf_dir):
    """Population Stability Index of order prices between the first and
    second half of the date range — the drift monitor run between a
    model's training snapshot and live data (PSI > 0.25 is the classic
    retrain alarm; total PSI = sum of the emitted per-bin terms). Bin
    edges are the BASELINE's exact deciles (one percentile aggregate,
    broadcast as a 1-row relation); binning is a JVM list_filter count
    against the broadcast edges, so the fact relation is scanned once
    and shuffles once into decile-bounded counts. Exact-integer bin
    counts make the rounded PSI terms cross-engine stable."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    # midpoint compare in exact integer micros (2*ts <= lo+hi): no
    # interval/rounding semantics to disagree about between engines
    tagged = orders.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice",
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 2
            <= F.unix_micros(F.col("lo").cast("timestamp"))
            + F.unix_micros(F.col("hi").cast("timestamp"))
        ).alias("is_base"),
    )
    qs = [i / 10.0 for i in range(1, 10)]
    edges = tagged.where("is_base").agg(
        F.expr(
            "percentile(o_totalprice, array({}))".format(
                ", ".join(str(q) for q in qs)
            )
        ).alias("e")
    )
    binned = tagged.crossJoin(F.broadcast(edges)).select(
        "is_base",
        (
            1
            + F.size(
                F.filter(F.col("e"), lambda x: x < F.col("o_totalprice"))
            )
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("is_base"), 1)).alias("nb"),
        F.count(F.when(~F.col("is_base"), 1)).alias("nc"),
    )
    tot = counts.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    pb = F.col("nb") * 1.0 / F.col("tb")
    pc = F.col("nc") * 1.0 / F.col("tc")
    return (
        counts.crossJoin(F.broadcast(tot))
        .where((F.col("nb") > 0) & (F.col("nc") > 0))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.col("nb").cast("bigint").alias("n_base"),
            F.col("nc").cast("bigint").alias("n_current"),
            F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
        )
    )
