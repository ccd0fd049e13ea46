"""Aggregations (SURVEY.md §2.4 A1-A8 + declared extensions).

Double-typed sums/averages are rounded identically on both engine sides:
partial-aggregation order differs between Spark and DuckDB at the last ulp,
so un-rounded doubles would hash-mismatch.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.queries import register


# --- A1/A2: max watermark (old_source_op.py:129-137, dag:142-150) ---------
@register(
    "max_shipdate_watermark",
    oracle="SELECT max(l_shipdate) AS max_shipdate FROM lineitem",
)
def max_shipdate_watermark(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(
        F.max("l_shipdate").alias("max_shipdate")
    )


# --- A3: argmax row (S3 LastModified argmax, dag_aggregates_etl.py:86-95) -
@register(
    "argmax_order_by_price",
    oracle="""
    SELECT arg_max(o_orderkey, o_totalprice) AS top_orderkey,
           max(o_totalprice)                 AS top_price
    FROM orders
    """,
)
def argmax_order_by_price(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


# --- A4: multi-max (commented SQL, dag_aggregates_etl.py:182-190) ---------
@register(
    "multi_max_lineitem",
    oracle="""
    SELECT max(l_shipdate) AS max_shipdate,
           min(l_shipdate) AS min_shipdate,
           max(l_orderkey) AS max_orderkey
    FROM lineitem
    """,
)
def multi_max_lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_orderkey").alias("max_orderkey"),
    )


# --- A5: min / first date with data (old_source_op.py:118-125) ------------
@register(
    "min_orderdate",
    oracle="SELECT min(o_orderdate) AS first_orderdate FROM orders",
)
def min_orderdate(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").agg(
        F.min("o_orderdate").alias("first_orderdate")
    )


# --- A6: count (len(df) / resultsCount) -----------------------------------
@register("count_lineitem", oracle="SELECT count(*) AS n_rows FROM lineitem")
def count_lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


# --- A8: grouped aggregation — TPC-H Q1 shape -----------------------------
@register(
    "pricing_summary",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                   AS sum_qty,
           round(sum(l_extendedprice), 4)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           round(sum(l_quantity), 4) / count(*)                        AS avg_qty,
           round(sum(l_extendedprice), 4) / count(*)                   AS avg_price,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """The canonical grouped-agg shape (per-ticker × per-bucket in the
    reference's domain — SURVEY §2.4 A8). Partial+final hash aggregate:
    one shuffle on a low-cardinality key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            # Averages as round(sum)/count — "stabilize then exact-op":
            # the rounded sum is the same double in both engines (2-decimal
            # inputs put true sums far from any rounding boundary), and
            # IEEE-754 division of identical doubles is bit-identical.
            # Rounding an avg directly risks exact round-half ties (dyadic
            # group counts), where engines' tie-breaking differs.
            (F.round(F.sum("l_quantity"), 4) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 4) / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- extension: ROLLUP (declared in SURVEY §2.4 as engine capability) -----
@register(
    "rollup_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_status(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- extension: exact distinct-count per group ----------------------------
@register(
    "count_distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def count_distinct_parts_per_flag(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n_parts"))
    )


@register(
    "salted_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)          AS sum_qty,
           round(sum(l_extendedprice), 2)     AS sum_base_price,
           count(*)                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def salted_pricing_summary(spark, sf_dir):
    """The hot-key scale path for A8, certified against the SAME answer as
    the plain aggregate: two-phase salted aggregation (groupBy key+salt →
    groupBy key). The price sum is rounded at 2 — its true value is an
    exact multiple of 0.01, 0.005 from any round-2 boundary, while the
    reordered accumulation error at ~1e9 magnitude reaches ~1e-4 and DOES
    flip round-4 (observed at sf0.1); the quantity sum's magnitude keeps
    round-4 safe."""
    from polygon_algotrading_env_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz")
    )
    return salted_aggregate(
        li,
        keys=["l_returnflag", "l_linestatus"],
        partial_aggs={
            "q": F.sum("l_quantity"),
            "p": F.sum("l_extendedprice"),
            "n": F.count(F.lit(1)),
        },
        final_aggs={
            "sum_qty": F.round(F.sum("q"), 4),
            "sum_base_price": F.round(F.sum("p"), 2),
            "count_order": F.sum("n"),
        },
    ).select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order"
    )


# --- equi-width histogram (explicit arithmetic, engine-portable) ----------
@register(
    "price_histogram_20bins",
    oracle="""
    WITH rng AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - r.lo) * 20 / (r.hi - r.lo)),
                      19) + 1 AS INT)  AS bin,
           count(*)                    AS n_orders,
           round(min(o_totalprice), 2) AS lo_price,
           round(max(o_totalprice), 2) AS hi_price
    FROM orders CROSS JOIN rng r
    GROUP BY bin
    """,
)
def price_histogram_20bins(spark, sf_dir):
    """Equi-width 20-bin histogram of order prices — the distribution
    profile behind data validation and skew diagnosis. Bin edges come
    from a (min, max) scalar subquery broadcast back over the fact; the
    bin index is explicit IEEE arithmetic (identical bit results on both
    engines, so boundary assignment cannot diverge — width_bucket is not
    portable to the oracle), with the single x == max row clamped into
    the top bin. One scan + one tiny aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    rng = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bin_col = (
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * 20
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(19),
        )
        + 1
    ).cast("int")
    return (
        orders.crossJoin(F.broadcast(rng))
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
    )


# --- mergeable HLL distinct sketches (rows-only: Spark DataSketches) ------
@register("hll_distinct_users_by_type", oracle=None)
def hll_distinct_users_by_type(spark, sf_dir):
    """Per-segment distinct-user estimates from mergeable HLL sketches,
    plus the UNION-of-segments estimate from merging those same sketches
    (operators/sketches.py). THE scale pattern for distinct counts: a
    KB-sized sketch per segment is built map-side once, and any segment
    combination folds in sketch space with no rescan and no key shuffle.
    Rows-only: DuckDB's approx_count_distinct is a different HLL; the
    estimates' determinism, merge-equals-direct property, and accuracy
    bounds are pinned in tests/test_sketches.py."""
    from polygon_algotrading_env_spark.operators.sketches import (
        hll_estimate,
        hll_group_sketches,
        hll_union_estimate,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sketches = hll_group_sketches(ev, "user_id", ["event_type"])
    per_seg = hll_estimate(sketches).select("event_type", "distinct_est")
    total = hll_union_estimate(sketches).select(
        F.lit("__all__").alias("event_type"), "distinct_est"
    )
    return per_seg.unionByName(total)


# --- quantile feature binning (discretization) ----------------------------
@register(
    "quartile_binned_prices",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.50) AS q2,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(CASE WHEN l.l_extendedprice > q.q3 THEN 4
                     WHEN l.l_extendedprice > q.q2 THEN 3
                     WHEN l.l_extendedprice > q.q1 THEN 2
                     ELSE 1 END AS INT)  AS price_bucket,
           count(*)                      AS n_items,
           round(sum(l.l_quantity), 2)   AS total_qty
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY 1, 2
    """,
)
def quartile_binned_prices(spark, sf_dir):
    """Quantile discretization — the feature-binning transform: per-group
    exact quartile boundaries (one pass, group-count-sized model)
    broadcast back over the fact, rows assigned by threshold CASE, stats
    per bin. Spark's percentile() and DuckDB's quantile_cont share the
    same linear-interpolation definition (already certified by
    exact_percentiles_per_flag), and boundary comparisons use the raw
    interpolated doubles on both sides — bit-identical, so bucket edges
    cannot disagree."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("q2"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q3"),
    )
    bucket = (
        F.when(F.col("l_extendedprice") > F.col("q3"), 4)
        .when(F.col("l_extendedprice") > F.col("q2"), 3)
        .when(F.col("l_extendedprice") > F.col("q1"), 2)
        .otherwise(1)
        .cast("int")
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag", bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


# --- certified heavy hitters: MG candidates + exact recount ---------------
@register(
    "heavy_hitter_parts",
    headline=True,
    oracle="""
    SELECT l_partkey, count(*) AS cnt, TRUE AS certified
    FROM lineitem
    GROUP BY 1
    ORDER BY cnt DESC, l_partkey
    LIMIT 20
    """,
)
def heavy_hitter_parts(spark, sf_dir):
    """Top-20 most-shipped parts via the certified heavy-hitter pattern:
    per-partition Misra-Gries summaries generate a bounded candidate set
    map-side, an exact recount runs only over candidates (broadcast
    semi-join — the groupBy domain is candidates, not the full partkey
    domain), and an integer-arithmetic certificate proves the result
    equals the full-shuffle top-k (operators/sketches.py). The oracle IS
    the full-shuffle formulation, so the certificate itself is what's
    being cross-engine verified: `certified` must come out TRUE and the
    rows must hash-match the naive plan. Capacity 16384 clears the
    certificate bound N/(cap+1) < kth-count through sf0.1 (600k rows,
    kth ≈ 49) — the fixture's near-uniform part distribution is the
    heavy-hitter worst case, so capacity must scale with N/kth there;
    on Zipfian reality a small constant capacity certifies at any N
    (eviction mechanics pinned in tests on skewed data)."""
    from polygon_algotrading_env_spark.operators.sketches import mg_heavy_hitters

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    return mg_heavy_hitters(li, "l_partkey", k=20, capacity=16384).select(
        "l_partkey", "cnt", "certified"
    )


@register(
    "bottomk_sketch_quantiles",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             md5(CAST(event_id AS VARCHAR)) AS pr,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)),
                        CAST(event_id AS VARCHAR)
             ) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    samp AS (SELECT * FROM ranked WHERE rn <= 128),
    ordered AS (
      SELECT event_type, value, n,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS vr,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM samp
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_rows,
           round(max(CASE WHEN vr = CAST(floor(0.5 * (m - 1)) AS BIGINT) + 1
                          THEN value END), 4) AS est_p50,
           round(max(CASE WHEN vr = CAST(floor(0.9 * (m - 1)) AS BIGINT) + 1
                          THEN value END), 4) AS est_p90
    FROM ordered GROUP BY 1
    """,
)
def bottomk_sketch_quantiles(spark, sf_dir):
    """Quantile estimates from the mergeable bottom-k priority sample
    (operators/sketches.py: bottomk_sketch): per-symbol p50/p90 read off
    a deterministic 128-row sample whose selection is a pure function of
    event_id's md5 — so the 'random' sample is identical across runs,
    partitionings, and ENGINES, which is what makes this sketch
    cross-engine certifiable where HLL (implementation-defined) is not.
    The sketch's two-phase build bounds every aggregation buffer at one
    input partition's worth and ships at most partitions×k rows per key;
    per-segment sketches merge EXACTLY (pinned in tests), so union
    quantile queries never rescan the base data. The oracle replays the
    same selection with rank windows."""
    from polygon_algotrading_env_spark.operators.sketches import (
        bottomk_quantile,
        bottomk_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    sk = bottomk_sketch(ev, "value", "event_id", ["event_type"], k=128)
    return sk.select(
        "event_type",
        "n_rows",
        F.round(bottomk_quantile(F.col("sketch"), 0.5), 4).alias("est_p50"),
        F.round(bottomk_quantile(F.col("sketch"), 0.9), 4).alias("est_p90"),
    )


@register(
    "kmv_audience_overlap",
    oracle="""
    WITH pri AS (
      SELECT DISTINCT event_type,
             md5(CAST(user_id AS VARCHAR)) AS pr
      FROM events
    ),
    ranked AS (
      SELECT event_type, pr,
             row_number() OVER (PARTITION BY event_type ORDER BY pr) AS rn
      FROM pri
    ),
    sk AS (
      SELECT event_type, list(pr ORDER BY pr) AS kmv
      FROM ranked WHERE rn <= 128 GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             list_sort(list_distinct(a.kmv || b.kmv))[1:128] AS union_k,
             a.kmv AS ka, b.kmv AS kb
      FROM sk a JOIN sk b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b,
           CAST(len(list_intersect(list_intersect(union_k, ka), kb))
                AS INT)                         AS overlap_in_k,
           CAST(len(union_k) AS INT)            AS union_k_size,
           round(len(list_intersect(list_intersect(union_k, ka), kb))
                 * 1.0 / len(union_k), 6)       AS jaccard_est
    FROM pairs
    """,
)
def kmv_audience_overlap(spark, sf_dir):
    """Audience-overlap matrix from KMV sketches (operators/sketches.py):
    estimated Jaccard of the distinct-user sets for every event-type
    pair, computed from the 128-hash sketches ALONE — the set-algebra
    question HLL sketches cannot answer (union-only) without rescanning
    the fact data. The overlap and union-k counts are exact integers of
    a deterministic md5 selection, so the whole estimate is cross-engine
    hashable; the pair join touches only segment-count x k hashes. At
    scale the sketches live in a silver table and ANY pair/segment
    combination folds in sketch space."""
    from polygon_algotrading_env_spark.operators.sketches import (
        kmv_distinct_sketch,
        kmv_overlap,
    )

    ev = load_table(spark, sf_dir, "events")
    k = 128
    sk = kmv_distinct_sketch(ev, "user_id", ["event_type"], k=k)
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("kmv").alias("ka")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("kmv").alias("kb")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    ov, uk = kmv_overlap(F.col("ka"), F.col("kb"), k)
    return pairs.select(
        "type_a",
        "type_b",
        ov.cast("int").alias("overlap_in_k"),
        uk.cast("int").alias("union_k_size"),
        F.round(ov.cast("double") / uk, 6).alias("jaccard_est"),
    )


def _qdigest_oracle(
    k: int = 256,
    bits: int = 24,
    idx_sql: str = "CAST(round(l_extendedprice * 100) AS BIGINT)",
    est_col: str = "est_cents",
    est_map: str = "{hi}",
) -> str:
    """Replay the canonical level-synchronous q-digest as chained CTEs
    (the PageRank/Bellman-Ford fixed-round recipe): one CTE trio per
    level — parent sums, frozen heavy children, promoted light parents —
    then the post-order (hi, lvl) running count and the per-quantile
    first crossing. Both engines run the full fixed ``bits`` rounds —
    neither side early-exits — with empty levels propagating as no-ops
    (empty CTEs here, empty per-level frames in the Spark loop), so the
    two ladders stay bit-for-bit aligned round by round.

    ``idx_sql`` is the integer domain transform (defaults to the exact
    cents grid); ``est_map`` post-maps the estimated index back to a
    reported value (``{hi}`` is the raw crossing index) under output
    column ``est_col`` — the log-domain variant plugs in here."""
    rounds = []
    for l in range(bits):
        rounds.append(f"""
    p{l} AS MATERIALIZED (SELECT idx // 2 AS pidx, sum(cnt) AS s FROM a{l} GROUP BY 1),
    k{l} AS MATERIALIZED (
      SELECT c.idx, c.cnt FROM a{l} c
      JOIN p{l} p ON c.idx // 2 = p.pidx
      CROSS JOIN th WHERE p.s > th.t
    ),
    a{l + 1} AS MATERIALIZED (
      SELECT p.pidx AS idx, p.s AS cnt FROM p{l} p
      CROSS JOIN th WHERE p.s <= th.t
    )""")
    frozen = "\n      UNION ALL ".join(
        f"SELECT {l} AS lvl, idx, cnt FROM k{l}" for l in range(bits)
    )
    qvals = ", ".join(f"({q})" for q in (2500, 5000, 7500, 9000, 9900))
    est_sql = est_map.format(
        hi="(SELECT min(hi) FROM ranked WHERE cum >= t.target_rank)"
    )
    return f"""
    WITH a0 AS MATERIALIZED (
      SELECT {idx_sql} AS idx,
             count(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
    th AS (SELECT n // {k} AS t FROM tot),
    {",".join(rounds)},
    nodes AS (
      {frozen}
      UNION ALL SELECT {bits} AS lvl, idx, cnt FROM a{bits}
    ),
    ranked AS (
      SELECT lvl, cnt,
             (idx + 1) * CAST(power(2, lvl) AS BIGINT) - 1 AS hi,
             sum(cnt) OVER (
               ORDER BY (idx + 1) * CAST(power(2, lvl) AS BIGINT) - 1, lvl
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM nodes
    ),
    t AS (
      SELECT q_bp, (tot.n * q_bp + 9999) // 10000 AS target_rank, tot.n
      FROM (VALUES {qvals}) AS q(q_bp) CROSS JOIN tot
    )
    SELECT CAST(t.q_bp AS BIGINT) AS q_bp,
           CAST(t.target_rank AS BIGINT) AS target_rank,
           CAST({est_sql} AS BIGINT) AS {est_col},
           CAST(t.n AS BIGINT) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes
    FROM t
    """


@register("qdigest_quantiles_price", oracle=_qdigest_oracle())
def qdigest_quantiles_price(spark, sf_dir):
    """Quantile estimates of lineitem extended price (exact cents grid)
    from a canonical q-digest (operators/sketches.py: qdigest_build —
    Shrivastava et al. 2004), the deterministic MERGEABLE quantile
    sketch: per-segment digests persist in a silver table and any
    union-of-segments quantile question is answered by merging sketches
    with no rescan — the HLL economics, for ranks — where t-digest/KLL
    would inject RNG or merge-order dependence and lose the cross-engine
    oracle. One corpus-sized histogram aggregation; every compression
    round runs on the grid-bounded (and shrinking) node relation, cost
    independent of row count. The level-SYNCHRONOUS canonical rule pins
    the one deterministic result both engines can replay; the oracle
    runs the same {bits} fixed rounds as chained CTEs. Output is all
    BIGINT (quantiles as basis points, estimates in cents): exact hash
    equality, with n_nodes certifying the compression actually fired
    (~600 nodes for 600k rows at sf0.1)."""
    from polygon_algotrading_env_spark.operators.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        )
    )
    nodes, n = qdigest_build(li, "cents", k=256, domain_bits=24)
    return qdigest_quantiles(nodes, n)


_CMS_ORACLE = """
    WITH r AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(row)),
    vals AS (SELECT CAST(l_partkey AS VARCHAR) AS v FROM lineitem),
    cms AS MATERIALIZED (
      SELECT row,
             ('0x' || substring(md5(CAST(row AS VARCHAR) || '|' || v),
                                1, 8))::BIGINT % 1024 AS bucket,
             count(*) AS cnt
      FROM vals CROSS JOIN r GROUP BY 1, 2
    ),
    tc AS (SELECT l_partkey, count(*) AS true_cnt FROM lineitem GROUP BY 1),
    top AS (
      SELECT l_partkey, true_cnt FROM tc
      ORDER BY true_cnt DESC, l_partkey LIMIT 32
    ),
    probes AS (
      SELECT t.l_partkey, r.row,
             ('0x' || substring(md5(CAST(r.row AS VARCHAR) || '|' ||
                 CAST(t.l_partkey AS VARCHAR)), 1, 8))::BIGINT % 1024
               AS bucket
      FROM top t CROSS JOIN r
    ),
    est AS (
      SELECT p.l_partkey, min(c.cnt) AS est_cnt
      FROM probes p JOIN cms c ON c.row = p.row AND c.bucket = p.bucket
      GROUP BY 1
    )
    SELECT t.l_partkey,
           CAST(t.true_cnt AS BIGINT)             AS true_cnt,
           CAST(e.est_cnt AS BIGINT)              AS est_cnt,
           CAST(e.est_cnt - t.true_cnt AS BIGINT) AS overshoot
    FROM top t JOIN est e ON e.l_partkey = t.l_partkey
    """


@register("cms_partkey_freq_topk", oracle=_CMS_ORACLE)
def cms_partkey_freq_topk(spark, sf_dir):
    """Count-Min Sketch frequency estimates (Cormode & Muthukrishnan
    2005) for the 32 heaviest part keys in lineitem, next to their
    exact counts (operators/sketches.py: cms_build — 4 md5-salted hash
    rows x 1024 counters; estimate = min across rows, which OVERCOUNTS
    or matches, never undercounts). The r15 registration completing the
    mergeable-sketch tier: unlike q-digest/HLL, CMS merges by EXACT
    counter addition, so per-segment sketches in a silver table sum
    into any union-of-segments sketch bit-for-bit — frequency answers
    with no rescan. Scale shape: the depth-x explode collapses under
    map-side partial aggregation to a GRID-bounded shuffle
    (depth x width x tasks, independent of row count) and the probe
    join broadcasts the <=4096-row counter relation. Output all-BIGINT
    (key, true_cnt, est_cnt, overshoot); the oracle replays the same
    md5 buckets, making the sketch itself — not a tolerance band —
    the certified artifact. Probe keys are picked by the total order
    (true_cnt DESC, l_partkey) so both engines choose the same set."""
    from polygon_algotrading_env_spark.operators.sketches import (
        cms_build,
        cms_point_estimates,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    cms = cms_build(li, "l_partkey", depth=4, width=1024)
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "l_partkey")
        .limit(32)
    )
    est = cms_point_estimates(cms, top, "l_partkey", depth=4, width=1024)
    return top.join(est, "l_partkey").select(
        "l_partkey",
        F.col("true_cnt").cast("bigint").alias("true_cnt"),
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("bigint").alias(
            "overshoot"
        ),
    )


@register("cms_merged_halves_freq", oracle=_CMS_ORACLE)
def cms_merged_halves_freq(spark, sf_dir):
    """The CMS MERGE path certified against the SAME answer as the
    single build (the salted_pricing_summary precedent: an alternate
    physical plan pinned to an identical result): lineitem splits into
    even/odd order-key halves, each half's counter relation comes out
    of ONE grouped scan (half-parity joins the (row, bucket) group key
    — the per-half counters are bit-identical to independent cms_build
    calls, the identity the merge law test proves), the two merge by
    counter addition, and the merged sketch answers the same top-32
    point queries as cms_partkey_freq_topk. Counters are linear, so
    the merged sketch is BIT-IDENTICAL to one build over everything
    — the oracle (a single whole-table CMS replay) passing against THIS
    plan is the cross-engine proof of that linearity, which is the
    property the silver-table economics rest on: per-segment sketches
    persisted per day/partition sum into any union-of-segments answer
    with no rescan and no approximation drift. (A first cut scanned
    lineitem once per half — the ams_merged_halves_f2 lesson applied
    back.)"""
    from polygon_algotrading_env_spark.operators.sketches import (
        _cms_bucket,
        cms_merge,
        cms_point_estimates,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    rows = F.explode(F.array(*[F.lit(r) for r in range(4)])).alias("row")
    halved = (
        li.select(
            (F.col("l_orderkey") % 2).alias("half"),
            F.col("l_partkey").cast("string").alias("__v"),
        )
        .select("half", rows, "__v")
        .select(
            "half",
            "row",
            _cms_bucket(F.col("__v"), F.col("row"), 1024).alias("bucket"),
        )
        .groupBy("half", "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = cms_merge(
        halved.where(F.col("half") == 0).drop("half"),
        halved.where(F.col("half") == 1).drop("half"),
    )
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "l_partkey")
        .limit(32)
    )
    est = cms_point_estimates(merged, top, "l_partkey", depth=4, width=1024)
    return top.join(est, "l_partkey").select(
        "l_partkey",
        F.col("true_cnt").cast("bigint").alias("true_cnt"),
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("bigint").alias(
            "overshoot"
        ),
    )


_AMS_ORACLE = """
    WITH r AS (SELECT unnest(range(32)) AS row),
    vals AS (SELECT md5(CAST(l_partkey AS VARCHAR)) AS d FROM lineitem),
    sk AS MATERIALIZED (
      SELECT row,
             SUM(1 - 2 * (('0x' || substring(d, row + 1, 1))::BIGINT % 2))
               AS signed_sum
      FROM vals CROSS JOIN r GROUP BY 1
    ),
    g AS (
      SELECT row // 8 AS grp, SUM(signed_sum * signed_sum) AS gsum
      FROM sk GROUP BY 1
    ),
    rk AS (
      SELECT gsum, row_number() OVER (ORDER BY gsum, grp) AS rk FROM g
    ),
    est AS (
      SELECT CAST(SUM(gsum) AS DOUBLE) / 16.0 AS est_f2
      FROM rk WHERE rk IN (2, 3)
    ),
    ex AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2
      FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_partkey)
    )
    SELECT ex.exact_f2,
           est.est_f2,
           ROUND(est.est_f2 / ex.exact_f2, 6) AS est_ratio
    FROM ex, est
    """


@register("ams_f2_partkey", oracle=_AMS_ORACLE)
def ams_f2_partkey(spark, sf_dir):
    """AMS tug-of-war estimate (Alon, Matias & Szegedy 1996) of
    lineitem's second frequency moment over part keys — F2 = Σ count(k)²,
    the SELF-JOIN SIZE, the quantity a planner needs to size an equi-join
    or detect key skew without paying the exact per-key aggregate
    (operators/sketches.py: ams_build — 32 md5-salted ±1 sign rows,
    median-of-4-means of the squared sums). Completes the mergeable-
    sketch tier's linear wing next to CMS: signed sums are LINEAR, so
    per-segment sketches in a silver table sum into any union-of-segments
    F2 answer bit-for-bit, from 32 bigints of state. Scale shape: the
    32x explode collapses under map-side partial aggregation to a
    grid-bounded exchange (32 x tasks, independent of row count); the
    estimator is integer-exact until ONE final division by 16 (a power
    of two), so both engines produce the identical double — the sketch
    itself, not a tolerance band, is the certified artifact. Exact F2
    rides along: est_ratio pins the estimator's accuracy in the record
    (median-of-means typical error ~sqrt(2/8) ≈ 50%)."""
    from polygon_algotrading_env_spark.operators.sketches import (
        ams_build,
        ams_f2_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    est = ams_f2_estimate(ams_build(li, "l_partkey", rows=32))
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias(
                "exact_f2"
            )
        )
    )
    return exact.crossJoin(est).select(
        "exact_f2",
        "est_f2",
        F.round(F.col("est_f2") / F.col("exact_f2"), 6).alias("est_ratio"),
    )


@register("ams_merged_halves_f2", oracle=_AMS_ORACLE)
def ams_merged_halves_f2(spark, sf_dir):
    """The AMS MERGE path certified against the SAME answer as the
    single build (the cms_merged_halves_freq precedent): lineitem splits
    into even/odd order-key halves, each half's 32-row sketch comes out
    of ONE grouped scan (groupBy half-parity — the per-half wide sums
    are bit-identical to independent ams_build calls, the identity the
    law test proves), the two merge by signed-sum addition, and the
    merged sketch feeds the same median-of-means estimator. Signed sums
    are linear in the input multiset, so the merged sketch is
    BIT-IDENTICAL to one build over everything — the oracle (a single
    whole-table replay) passing against THIS plan is the cross-engine
    proof of the linearity the silver-table economics rest on. Unlike
    CMS (counters only ever add) the AMS merge exercises genuine
    cancellation: opposite-sign contributions from the two halves must
    net exactly. (A first cut scanned lineitem once per half — two
    full scans for a 2-group aggregate; the grouped build halves the
    probe's 100x wall.)"""
    from polygon_algotrading_env_spark.operators.sketches import (
        _ams_sign,
        ams_f2_estimate,
        ams_merge,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    wide = (
        li.select(
            (F.col("l_orderkey") % 2).alias("half"),
            F.md5(F.col("l_partkey").cast("string")).alias("__d"),
        )
        .groupBy("half")
        .agg(
            *[
                F.coalesce(F.sum(_ams_sign(F.col("__d"), r)), F.lit(0))
                .cast("bigint")
                .alias(f"s{r}")
                for r in range(32)
            ]
        )
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), F.col(f"s{r}").alias("signed_sum")
            )
            for r in range(32)
        ]
    )
    sketches = wide.select("half", F.explode(pairs).alias("p")).select(
        "half",
        F.col("p.row").alias("row"),
        F.col("p.signed_sum").alias("signed_sum"),
    )
    merged = ams_merge(
        sketches.where(F.col("half") == 0).drop("half"),
        sketches.where(F.col("half") == 1).drop("half"),
    )
    est = ams_f2_estimate(merged)
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias(
                "exact_f2"
            )
        )
    )
    return exact.crossJoin(est).select(
        "exact_f2",
        "est_f2",
        F.round(F.col("est_f2") / F.col("exact_f2"), 6).alias("est_ratio"),
    )


@register(
    "cms_join_size_events_orders",
    oracle="""
    WITH r AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(row)),
    cms_e AS MATERIALIZED (
      SELECT row,
             ('0x' || substring(md5(CAST(row AS VARCHAR) || '|' ||
                 CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bucket,
             count(*) AS cnt
      FROM events CROSS JOIN r GROUP BY 1, 2
    ),
    cms_o AS MATERIALIZED (
      SELECT row,
             ('0x' || substring(md5(CAST(row AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 1024 AS bucket,
             count(*) AS cnt
      FROM orders CROSS JOIN r GROUP BY 1, 2
    ),
    per_row AS (
      SELECT a.row, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ip
      FROM cms_e a JOIN cms_o b ON a.row = b.row AND a.bucket = b.bucket
      GROUP BY 1
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM per_row),
    ex AS (
      SELECT CAST(SUM(e.cnt * o.cnt) AS BIGINT) AS exact_join_size
      FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1) e
      JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) o
        ON e.user_id = o.o_custkey
    )
    SELECT ex.exact_join_size,
           est.est_join_size,
           CAST(est.est_join_size - ex.exact_join_size AS BIGINT)
             AS overshoot
    FROM ex, est
    """,
)
def cms_join_size_events_orders(spark, sf_dir):
    """Equi-join size of events ⋈ orders on (user_id = o_custkey),
    estimated from two Count-Min sketches via the CMS inner product
    (operators/sketches.py: cms_inner_product — Cormode & Muthukrishnan
    §4.2): per hash row Σ_bucket cntE·cntO, MIN across the 4 rows. The
    cross-relation companion of the AMS self-join size and the other
    half of the sketch-based planner-statistics story: each relation is
    sketched in ONE scan with no key shuffle (grid-bounded partial
    aggregation), sketches persist/merge by counter addition, and any
    fact⋈fact join between sketched relations is sized from 2×4×1024
    bigints. The estimate NEVER undercounts (matching keys share
    buckets; collision terms are non-negative — law-tested), so it is
    a safe upper bound for broadcast/shuffle planning. Exact join size
    rides along (a per-key count join — the computation the sketch
    avoids at scale) to pin the overshoot in the certified record;
    every output is exact BIGINT."""
    from polygon_algotrading_env_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    od = load_table(spark, sf_dir, "orders").select("o_custkey")
    est = cms_inner_product(
        cms_build(ev, "user_id", depth=4, width=1024),
        cms_build(od, "o_custkey", depth=4, width=1024),
    )
    ce = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt_e"))
    co = od.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt_o"))
    exact = (
        ce.join(co, ce["user_id"] == co["o_custkey"])
        .agg(
            F.sum(F.col("cnt_e") * F.col("cnt_o"))
            .cast("bigint")
            .alias("exact_join_size")
        )
    )
    return exact.crossJoin(est).select(
        "exact_join_size",
        "est_join_size",
        (F.col("est_join_size") - F.col("exact_join_size"))
        .cast("bigint")
        .alias("overshoot"),
    )


#: exact integer log-bucket transform: 16 sub-buckets per octave above 32
#: (5 mantissa bits), identity below — monotone, all-integer, so both
#: engines bucket identically and the bucket width bounds RELATIVE value
#: error by 1/16.
_LOGB_SQL = (
    "CASE WHEN cents < 32 THEN cents "
    "ELSE 32 + (length(bin(cents)) - 5) * 16 "
    "+ (cents DIV CAST(power(2, length(bin(cents)) - 5) AS BIGINT) - 16) "
    "END"
)
_LOGB_DUCK = _LOGB_SQL.replace("cents DIV", "cents // ").replace(
    "cents", "CAST(round(l_extendedprice * 100) AS BIGINT)"
)
#: bucket -> lower-bound cents (the reported representative): identity
#: below 32, m·2^octave above.
_LOGB_LO = (
    "CASE WHEN {b} < 32 THEN {b} "
    "ELSE CAST((16 + ({b} - 32) % 16) "
    "* power(2, ({b} - 32) DIV 16) AS BIGINT) END"
)


@register(
    "qdigest_relative_quantiles_price",
    oracle=_qdigest_oracle(
        k=64,
        bits=9,
        idx_sql=_LOGB_DUCK,
        est_col="est_lo_cents",
        est_map=_LOGB_LO.format(b="({hi})").replace("DIV", "//"),
    ),
)
def qdigest_relative_quantiles_price(spark, sf_dir):
    """VALUE-RELATIVE-error quantiles — the complement of
    qdigest_quantiles_price's uniform cents grid (where a $9 item and a
    $90,000 item get the same absolute resolution): prices map onto an
    exact integer log grid (identity below 32 cents, then 16 sub-buckets
    per octave = 5 mantissa bits — the transform is all-integer and
    monotone, so both engines bucket identically and every bucket's
    width is ≤ 1/16 of its value), and the SAME canonical q-digest
    machinery runs over the 9-bit bucket domain (k=64). Estimates map
    back to the bucket's exact lower-bound cents: the answer is wrong by
    at most the digest's rank error PLUS 6.25% of the VALUE, at any
    price magnitude, from a ~hundreds-of-buckets mergeable sketch —
    where KLL/REQ would buy similar guarantees with RNG and lose the
    cross-engine oracle. Same silver-table economics: log-domain
    digests merge exactly like cents-domain ones."""
    from polygon_algotrading_env_spark.operators.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents")
    )
    logb = li.selectExpr(f"{_LOGB_SQL} AS logb")
    nodes, n = qdigest_build(logb, "logb", k=64, domain_bits=9)
    q = qdigest_quantiles(nodes, n).withColumnRenamed(
        "est_cents", "est_bucket"
    )
    return q.selectExpr(
        "q_bp",
        "target_rank",
        f"CAST({_LOGB_LO.format(b='est_bucket')} AS BIGINT) AS est_lo_cents",
        "n_rows",
        "n_nodes",
    )
