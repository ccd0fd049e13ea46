"""Plan-shape regression tests (SURVEY.md §4): the properties that decide
whether a query survives a 100× scale-up, pinned at the physical plan.
"""

from __future__ import annotations

import re

import pytest

from polygon_algotrading_env_spark.plans import plan_stats, plan_string
from polygon_algotrading_env_spark.queries import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def test_filter_pushdown_reaches_parquet(spark, sf_dir, q):
    st = plan_stats(q["filter_mktsegment"](spark, sf_dir))
    assert any("EqualTo(c_mktsegment,BUILDING)" in f for f in st.pushed_filters)


def test_column_pruning_projection(spark, sf_dir, q):
    st = plan_stats(q["project_customer"](spark, sf_dir))
    assert st.read_schemas and all(
        set(rs.split(",")[0].split(":")[0:1])  # sanity: parseable
        for rs in st.read_schemas
    )
    # Only the two projected columns are read — not the 5-column table.
    assert "c_custkey" in st.read_schemas[0]
    assert "c_acctbal" not in st.read_schemas[0]


def test_bars_scan_prunes_unused_columns(spark, sf_dir, q):
    st = plan_stats(q["ohlcv_bars_5m"](spark, sf_dir))
    joined = ",".join(st.read_schemas)
    assert "props" not in joined and "user_id" not in joined
    assert st.shuffle_exchanges == 1  # one partial+final hash aggregate


def test_topk_avoids_global_sort(spark, sf_dir, q):
    st = plan_stats(q["topk_orders_by_price"](spark, sf_dir))
    assert st.take_ordered == 1
    assert st.shuffle_exchanges == 0


def test_star_join_broadcasts_all_dims(spark, sf_dir, q):
    st = plan_stats(q["star_join_revenue_by_region"](spark, sf_dir))
    assert st.broadcast_joins == 3
    assert st.sort_merge_joins == 0
    # The only shuffle is the final small-key aggregate.
    assert st.shuffle_exchanges == 1


def test_broadcast_dim_join(spark, sf_dir, q):
    st = plan_stats(q["join_lineitem_part_broadcast"](spark, sf_dir))
    assert st.broadcast_joins == 1 and st.sort_merge_joins == 0


def test_asof_join_is_single_shuffle(spark, sf_dir, q):
    """The union+LOCF as-of plan must cost ONE shuffle of |L|+|R| — a
    range-join rewrite or row explosion would show up here."""
    st = plan_stats(q["asof_latest_order_before_event"](spark, sf_dir))
    assert st.shuffle_exchanges == 1
    assert st.sort_merge_joins == 0 and st.broadcast_joins == 0


def test_codegen_covers_scans(spark, sf_dir, q):
    st = plan_stats(q["pricing_summary"](spark, sf_dir), execute=True)
    assert st.codegen_spans >= 1


def test_backtest_shares_one_partitioning(spark, sf_dir, q):
    # bars agg shuffles once; ALL backtest window passes (SMA frames, lag,
    # signal->position) then share the per-symbol partitioning — no
    # re-shuffle between stages (the ARCHITECTURE.md claim).
    st = plan_stats(q["sma_crossover_backtest_5m"](spark, sf_dir))
    assert st.shuffle_exchanges <= 2  # bars hash-agg + one window partitioning


def test_curation_window_ops_single_shuffle(spark, sf_dir, q):
    st = plan_stats(q["balanced_downsample_per_lang"](spark, sf_dir))
    assert st.shuffle_exchanges == 1  # partitionBy(lang) only
    st = plan_stats(q["context_window_packing"](spark, sf_dir))
    assert st.shuffle_exchanges == 1
    # hash_split is a pure projection — zero shuffles
    st = plan_stats(q["train_val_test_split"](spark, sf_dir))
    assert st.shuffle_exchanges == 0


def test_bm25_probe_is_topk_not_sort(spark, sf_dir, q):
    """BM25's probe: term-filtered postings only reach the shuffle, the
    df/stats sides broadcast, and top-k is TakeOrderedAndProject."""
    st = plan_stats(q["bm25_topk_docs"](spark, sf_dir))
    assert st.take_ordered == 1
    assert st.sort_merge_joins == 0
    assert st.shuffle_exchanges <= 5


def test_decorrelated_scalar_subquery_broadcasts(spark, sf_dir, q):
    st = plan_stats(q["small_quantity_revenue"](spark, sf_dir))
    assert st.broadcast_joins == 1 and st.sort_merge_joins == 0


def test_promo_share_single_pass(spark, sf_dir, q):
    """CASE-gated numerator/denominator in ONE aggregate: one broadcast
    join, one shuffle (the final 1-row agg), shipdate filter pushed."""
    st = plan_stats(q["promo_revenue_share"](spark, sf_dir))
    assert st.broadcast_joins == 1
    assert st.shuffle_exchanges == 1
    assert any("l_shipdate" in f for f in st.pushed_filters)


def test_outer_histogram_reuses_join_partitioning(spark, sf_dir, q):
    """groupBy(c_custkey) must reuse the join's hash partitioning — only
    the join exchanges and the tiny c_count histogram agg shuffle."""
    st = plan_stats(q["left_outer_order_count_histogram"](spark, sf_dir))
    assert st.shuffle_exchanges <= 3


def test_global_ordinals_single_data_shuffle(spark, sf_dir, q):
    """The zipWithIndex plan shuffles the FULL relation exactly once: one
    range exchange, reused by the stats branch (ReusedExchange). The only
    other shuffles are over the partitions-sized stats relation (hash agg
    + SinglePartition prefix-sum window), and the pid→base map comes back
    as a broadcast — no Window.partitionBy(pid) hash exchange of the data.
    """
    p = plan_string(q["global_ordinals_orders"](spark, sf_dir), execute=True)
    # AQE's toString appends the pre-adaptive "Initial Plan"; judge the
    # Final Plan section only.
    p = p.split("== Initial Plan ==")[0]
    range_exchanges = [
        ln
        for ln in p.splitlines()
        if "Exchange rangepartitioning" in ln and "ReusedExchange" not in ln
    ]
    assert len(range_exchanges) == 1, range_exchanges
    assert "ReusedExchange" in p
    # No full-data hash repartition: every hashpartitioning exchange in
    # the plan sits above the tiny per-partition stats aggregate.
    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+)", p):
        assert m.group(1).startswith("__pid"), m.group(0)


def test_big_ticket_topk_and_broadcast(spark, sf_dir, q):
    """Q18 shape: the HAVING-gated agg joins back through orders with the
    customer dim broadcast, and the top-100 is TakeOrderedAndProject —
    never a global sort."""
    st = plan_stats(q["big_ticket_customers"](spark, sf_dir))
    assert st.take_ordered == 1
    assert st.broadcast_joins >= 1


def test_vocab_coverage_windows_after_topk(spark, sf_dir, q):
    """The rank/cumsum windows must run on the 64-row top-k result, not
    the vocab: TakeOrderedAndProject present, and no rangepartitioning
    exchange (a global-sort window over the vocab would add one)."""
    p = plan_string(q["vocab_coverage_top64"](spark, sf_dir), execute=True)
    p = p.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_funnel_no_window_over_raw_stream(spark, sf_dir, q):
    """Funnel stages are min-ts aggregates chained by user_id equi-joins:
    no Window over the event stream, no sort-merge join at driver SF."""
    p = plan_string(q["view_click_purchase_funnel"](spark, sf_dir))
    assert "Window" not in p


def test_gopher_filters_share_token_shuffle(spark, sf_dir, q):
    """Unigram counts, bigram lead-window, and the per-doc rollup ride
    three shuffles total — no token self-join."""
    st = plan_stats(q["gopher_repetition_filters"](spark, sf_dir))
    assert st.shuffle_exchanges <= 3
    assert st.sort_merge_joins == 0


def test_q6_scan_filter_aggregate_only(spark, sf_dir, q):
    """Q6 shape: every predicate reaches the parquet scan, the projection
    is two columns, and the only exchange is the scalar-agg gather."""
    df = q["discount_band_revenue"](spark, sf_dir)
    p = plan_string(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)" in p
    st = plan_stats(df)
    assert st.shuffle_exchanges == 1 and st.broadcast_joins == 0
    assert "l_quantity" in st.read_schemas[0] and "l_orderkey" not in st.read_schemas[0]


def test_q19_disjunctive_brackets_stay_broadcast(spark, sf_dir, q):
    """Q19 shape: the OR'd brackets must not defeat per-side pushdown or
    force a sort-merge join — part stays broadcast, the fact's quantity
    envelope reaches its scan as an Or() pushed filter."""
    df = q["bracketed_quantity_revenue"](spark, sf_dir)
    st = plan_stats(df)
    assert st.broadcast_joins == 1 and st.sort_merge_joins == 0
    p = plan_string(df)
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in p


def test_q5_all_dims_broadcast(spark, sf_dir, q):
    """Q5 shape: five broadcast joins (orders/customer/supplier/nation/
    region chains), zero sort-merge — the fact shuffles once, for the
    nation rollup."""
    st = plan_stats(q["local_supplier_volume_asia"](spark, sf_dir))
    assert st.broadcast_joins == 5
    assert st.sort_merge_joins == 0
    assert st.shuffle_exchanges == 1


def test_q21_no_fact_self_joins(spark, sf_dir, q):
    """Q21 shape: the EXISTS/NOT-EXISTS pair must come from ONE per-order
    aggregate — no sort-merge self-joins of lineitem; top-k without a
    global sort."""
    st = plan_stats(q["sole_blame_suppliers"](spark, sf_dir))
    assert st.sort_merge_joins == 0
    assert st.take_ordered == 1
    assert st.shuffle_exchanges <= 3


def test_mg_heavy_hitters_single_recount(spark, sf_dir, q):
    """The certificate must come from a window over the k-row top-k, not
    a second execution of the recount subtree: exactly ONE
    TakeOrderedAndProject in the plan."""
    st = plan_stats(q["heavy_hitter_parts"](spark, sf_dir))
    assert st.take_ordered == 1
    assert st.sort_merge_joins == 0


def test_triple_barrier_no_forward_self_join(spark, sf_dir, q):
    """The forward path must be a window-collected array, never a
    self-join of the bars against their own future (no SortMergeJoin,
    no BroadcastHashJoin on the bar relation)."""
    st = plan_stats(q["triple_barrier_labels_5m"](spark, sf_dir))
    assert st.sort_merge_joins == 0
    assert st.broadcast_joins == 0


def test_dollar_bars_single_partitioning(spark, sf_dir, q):
    """Threshold bars: the cumulative bucketing window and the OHLC
    reduction share one per-symbol exchange family (≤ 2 shuffles: the
    window partitioning and the (key, bar_id) aggregate)."""
    st = plan_stats(q["dollar_bars_events"](spark, sf_dir))
    assert st.sort_merge_joins == 0 and st.broadcast_joins == 0
    assert st.shuffle_exchanges <= 2


def test_vpin_no_joins(spark, sf_dir, q):
    """VPIN composes bucketing + classification as pure windows and
    aggregates — zero joins of any kind in the plan."""
    st = plan_stats(q["vpin_volume_buckets"](spark, sf_dir))
    assert st.sort_merge_joins == 0 and st.broadcast_joins == 0


@pytest.mark.parametrize("mode", ["zoned", "global"])
def test_ema_closed_form_zoned_plan_shape(spark, sf_dir, q, mode, monkeypatch):
    """The closed-form EMA is pure window algebra with a bounded block
    relation; since round 11 the row-numbering shape is ADAPTIVE
    (zonedroll.zoning_mode): zone-decomposed above the row threshold,
    the plain per-key window below it — both pinned here via the
    SPARK_GRAFT_ZONING override. Shared invariants: the carry join is
    BROADCAST (never SMJ), no cartesian/BNLJ, exchange count bounded.
    In zoned mode, the law the zoning buys: no Window node partitions on
    the group keys alone. In global mode the bare-key numbering window
    IS the intended small-input plan, and the zoning scaffolding
    (range exchange, zone relation) must be absent."""
    monkeypatch.setenv("SPARK_GRAFT_ZONING", mode)
    df = q["ema_20_per_event_type"](spark, sf_dir)
    st = plan_stats(df)
    assert st.sort_merge_joins == 0
    assert st.cartesian_products == 0 and st.bnl_joins == 0
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if mode == "zoned":
        assert st.broadcast_joins >= 2, st  # zone bases + block carry
        assert st.shuffle_exchanges <= 9, st
        for line in plan.splitlines():
            s = line.strip().lstrip("+-: ")
            if s.startswith("Window "):
                assert "__" in s, s  # zone/block scaffold, never bare keys
    else:
        assert st.broadcast_joins >= 1, st  # block carry
        assert st.shuffle_exchanges <= 3, st
        assert "__zone" not in plan and "__tzone" not in plan, plan[:500]


def test_dsir_corpus_pass_runs_once(spark, sf_dir, q):
    """DSIR derives its raw/target bucket models AND the per-doc scores
    from one per-(doc, is_target, bucket) aggregate. The r14 rewrite
    keeps the model branch's copy of that subplan byte-identical to the
    scoring branch's (explicit isnotnull(__b); __is_target as a group
    KEY so pruning can't strip it from one side), so AQE stage reuse
    materializes the corpus tokenize+hash pass ONCE — previously it ran
    twice per query. Pinned: the final adaptive plan replays the
    per-doc shuffle via ReusedExchange, and the bigrams ride the r15
    explode(sequence)+element_at path — pure codegen index arithmetic,
    NO (doc, pos) window exchange, no per-doc sort, and no interpreted
    HOF lambdas (the zip_with variant measured 2.7x slower at 100x;
    the r14 posexplode+lead() shape paid one extra corpus-sized
    exchange + sort — see the operator comment)."""
    df = q["dsir_weights_for_target"](spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final[:2000]
    st = plan_stats(df)
    assert st.sort_merge_joins == 0 and st.cartesian_products == 0
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "zip_with" not in opt
    assert "lead(" not in opt  # the (doc, pos) window shape is gone
    assert "element_at" in opt and "sequence(2" in opt
    # No Window node may remain over the corpus relation: the only
    # Window left is the trivial single-partition model-totals one.
    # Count Window NODES (stripped line prefix), not the raw substring —
    # a node name merely containing "Window" (e.g. WindowGroupLimit from
    # a top-k window optimization) must not inflate the count.
    n_windows = sum(
        1
        for line in final.splitlines()
        if line.strip().lstrip("*+-: ()0123456789").startswith("Window ")
    )
    assert n_windows <= 1, final[:2000]


def test_qdigest_ladder_is_exchange_free(spark, sf_dir, q):
    """The q-digest compression ladder plans with ZERO shuffle
    exchanges: the only exchange in the query's lifetime is inside the
    eagerly-checkpointed leaf histogram (already materialized by the
    time this plan exists), and the coalesce(1)'d ladder satisfies
    every window's clustering requirement via SinglePartition — 24
    rounds fuse into sorts within one stage. Regressing this (e.g.
    dropping the coalesce) re-inserts ~24 per-round exchanges."""
    df = q["qdigest_quantiles_price"](spark, sf_dir)
    st = plan_stats(df)
    assert st.shuffle_exchanges == 0, st
    assert st.sort_merge_joins == 0 and st.cartesian_products == 0
