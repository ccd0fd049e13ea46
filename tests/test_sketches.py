"""HLL sketch operators: accuracy vs exact, merge associativity, and
order/partitioning independence (the properties that make the
sketch-per-segment pattern sound at scale)."""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.sketches import (
    hll_estimate,
    hll_group_sketches,
    hll_union_estimate,
)


def _events(spark, sf_dir):
    from polygon_algotrading_env_spark.catalog import load_table

    return load_table(spark, sf_dir, "events").select("event_type", "user_id")


def test_group_estimates_within_error_bound(spark, sf_dir):
    ev = _events(spark, sf_dir)
    est = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimate(
            hll_group_sketches(ev, "user_id", ["event_type"])
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        # lgk=12 → ~1.6% relative standard error; 4 sigma bound
        assert abs(e - exact[k]) <= max(1, 0.065 * exact[k]), (k, e, exact[k])


def test_union_of_sketches_equals_direct_global_sketch(spark, sf_dir):
    """Merging per-segment sketches must give the SAME estimate as one
    sketch over the whole relation — the property that lets segment
    sketches answer global questions without rescanning."""
    ev = _events(spark, sf_dir)
    merged = hll_union_estimate(
        hll_group_sketches(ev, "user_id", ["event_type"])
    ).first()["distinct_est"]
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("e")
    ).first()["e"]
    assert merged == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(1, 0.065 * exact)


def test_sketch_is_partitioning_independent(spark, sf_dir):
    """Same input set, different physical layout → identical estimates
    (the sketch is an order-independent function of the SET)."""
    ev = _events(spark, sf_dir)
    a = hll_union_estimate(
        hll_group_sketches(ev, "user_id", ["event_type"])
    ).first()["distinct_est"]
    b = hll_union_estimate(
        hll_group_sketches(
            ev.repartition(7, "user_id"), "user_id", ["event_type"]
        )
    ).first()["distinct_est"]
    assert a == b


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile (Greenwald-Khanna, accuracy=10000) must land
    within its rank-error bound of the exact percentiles — the cheap
    single-pass alternative when exact per-group sorts are too dear."""
    from polygon_algotrading_env_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = [0.25, 0.5, 0.9, 0.99]
    approx = li.select(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.9, 0.99),"
            " 10000)"
        ).alias("a")
    ).first()["a"]
    n = li.count()
    exact_sorted = [
        r["l_extendedprice"]
        for r in li.orderBy("l_extendedprice").collect()
    ]
    for q, a in zip(qs, approx):
        # rank error <= n / accuracy
        target = int(q * (n - 1))
        tol = max(2, n // 10000 + 1)
        lo = exact_sorted[max(0, target - tol)]
        hi = exact_sorted[min(n - 1, target + tol)]
        assert lo <= a <= hi, (q, a, lo, hi)


# --- Misra-Gries heavy hitters --------------------------------------------

def _zipf_df(spark):
    """Deterministic skewed stream: 5 heavy keys + a long uniform tail,
    larger than any reasonable MG capacity so trims actually happen."""
    head = [(k,) for k, reps in [(1, 5000), (2, 2500), (3, 1200), (4, 600), (5, 300)]
            for _ in range(reps)]
    tail = [(100 + i,) for i in range(8000)]
    return spark.createDataFrame(head + tail, ["k"]).repartition(6)


def test_mg_heavy_hitters_exact_under_eviction(spark):
    """capacity 128 << 8005 distinct keys forces per-partition trims; the
    recount must still return the EXACT top-5 with exact counts and a
    true certificate (kth=300, threshold N/129 ≈ 135)."""
    from polygon_algotrading_env_spark.operators.sketches import mg_heavy_hitters

    out = mg_heavy_hitters(_zipf_df(spark), "k", k=5, capacity=128).collect()
    assert [(r["k"], r["cnt"]) for r in out] == [
        (1, 5000), (2, 2500), (3, 1200), (4, 600), (5, 300)
    ]
    assert all(r["certified"] for r in out)


def test_mg_heavy_hitters_uniform_is_uncertified(spark):
    """On near-uniform data the MG bound cannot clear the k-th count, and
    the operator must SAY so rather than return a silently-approximate
    set; on PERFECTLY uniform data every summary trims to empty and the
    result is the (self-evidently uncertified) empty set."""
    from polygon_algotrading_env_spark.operators.sketches import mg_heavy_hitters

    near = spark.createDataFrame(
        [(i % 500,) for i in range(5000)] + [(j,) for j in range(5) for _ in range(3)],
        ["k"],
    ).repartition(4)
    out = mg_heavy_hitters(near, "k", k=5, capacity=16).collect()
    assert 0 < len(out) <= 5
    assert not any(r["certified"] for r in out)

    flat = spark.createDataFrame(
        [(i % 500,) for i in range(5000)], ["k"]
    ).repartition(4)
    assert mg_heavy_hitters(flat, "k", k=5, capacity=16).collect() == []


def test_mg_candidates_complete_above_threshold(spark):
    """Completeness, the fact the certificate rests on: every key with
    global count > N/(capacity+1) appears in the candidate union."""
    from polygon_algotrading_env_spark.operators.sketches import (
        mg_partition_candidates,
    )

    df = _zipf_df(spark)
    n = df.count()
    capacity = 64
    cands = {
        r["k"] for r in mg_partition_candidates(df, "k", capacity).collect()
    }
    truth = df.groupBy("k").count().collect()
    for r in truth:
        if r["count"] > n / (capacity + 1):
            assert r["k"] in cands, (r["k"], r["count"])


def test_mg_heavy_hitters_short_result_is_uncertified(spark):
    """Fewer candidates than k: the returned prefix may be exact but it is
    NOT the full top-k, so completeness is folded into the flag — every
    row must read certified=false (r4 ADVICE: a short certified result
    must be impossible to misread as a complete top-k certificate)."""
    from polygon_algotrading_env_spark.operators.sketches import mg_heavy_hitters

    # 3 distinct keys, heavily skewed: candidates < k=5, bound holds for
    # the rows that DO come back — but the flag must still be false.
    df = spark.createDataFrame(
        [(1,)] * 900 + [(2,)] * 90 + [(3,)] * 10, ["k"]
    ).repartition(4)
    out = mg_heavy_hitters(df, "k", k=5, capacity=64).collect()
    assert 0 < len(out) < 5
    assert not any(r["certified"] for r in out)
    # with k == |domain| (and capacity clearing kth·(cap+1) > N:
    # 10·129 > 1000) the same data certifies fully
    full = mg_heavy_hitters(df, "k", k=3, capacity=128).collect()
    assert [(r["k"], r["cnt"]) for r in full] == [(1, 900), (2, 90), (3, 10)]
    assert all(r["certified"] for r in full)


def test_bottomk_sketch_laws(spark):
    """The three sketch laws: partitioning invariance, EXACT mergeability
    (sketch(A∪B) == merge(sketch(A), sketch(B))), and quantile-estimate
    accuracy on a known distribution."""
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.sketches import (
        bottomk_quantile,
        bottomk_sketch,
        merge_bottomk,
    )

    rows = [("g", i, float((i * 7919) % 1000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "key string, id long, v double")
    k = 256

    s1 = bottomk_sketch(df.repartition(1), "v", "id", ["key"], k=k).collect()[0]
    s7 = bottomk_sketch(df.repartition(7), "v", "id", ["key"], k=k).collect()[0]
    assert [tuple(x) for x in s1["sketch"]] == [tuple(x) for x in s7["sketch"]]
    assert s1["n_rows"] == 5000 and len(s1["sketch"]) == k

    a = df.where("id < 2000")
    b = df.where("id >= 2000")
    sa = bottomk_sketch(a, "v", "id", ["key"], k=k)
    sb = bottomk_sketch(b, "v", "id", ["key"], k=k)
    merged = (
        sa.select("key", F.col("sketch").alias("ska"))
        .join(sb.select("key", F.col("sketch").alias("skb")), "key")
        .select("key", merge_bottomk(F.col("ska"), F.col("skb"), k).alias("sketch"))
        .collect()[0]
    )
    assert [tuple(x) for x in merged["sketch"]] == [
        tuple(x) for x in s1["sketch"]
    ]

    est = (
        bottomk_sketch(df, "v", "id", ["key"], k=k)
        .select(bottomk_quantile(F.col("sketch"), 0.5).alias("med"))
        .collect()[0]["med"]
    )
    # true median of (i*7919) % 1000 over 5000 rows ~ 500; k=256 sample
    # keeps the estimate within a few tens
    assert abs(est - 500.0) < 80.0


def test_kmv_sketch_estimates_and_set_algebra(spark):
    """KMV laws: partitioning invariance, distinct estimate within
    sampling error, and the Jaccard/intersection estimate from sketches
    alone lands near truth on sets with known overlap."""
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.sketches import (
        kmv_distinct_sketch,
        kmv_estimate_distinct,
        kmv_overlap,
    )

    # A = 0..5999, B = 3000..8999 → |A∩B| = 3000, |A∪B| = 9000, J = 1/3
    rows = [("A", i) for i in range(6000)] + [
        ("B", i) for i in range(3000, 9000)
    ]
    df = spark.createDataFrame(rows, "seg string, user_id long")
    k = 512
    sk = kmv_distinct_sketch(df, "user_id", ["seg"], k=k)
    a = {r["seg"]: r for r in sk.collect()}
    b = {
        r["seg"]: r
        for r in kmv_distinct_sketch(
            df.repartition(7), "user_id", ["seg"], k=k
        ).collect()
    }
    assert list(a["A"]["kmv"]) == list(b["A"]["kmv"])
    assert a["A"]["n_exact"] == 6000

    est = sk.select(
        "seg", kmv_estimate_distinct(F.col("kmv"), k).alias("e")
    ).collect()
    for r in est:
        assert abs(r["e"] - 6000) / 6000 < 0.15, r

    wide = (
        sk.where("seg = 'A'")
        .select(F.col("kmv").alias("ka"))
        .crossJoin(sk.where("seg = 'B'").select(F.col("kmv").alias("kb")))
    )
    ov, uk = kmv_overlap(F.col("ka"), F.col("kb"), k)
    got = wide.select(
        (ov.cast("double") / uk).alias("jaccard"),
    ).collect()[0]
    assert abs(got["jaccard"] - 1 / 3) < 0.07, got


def test_qdigest_exact_when_uncompressed(spark):
    """n ≤ k ⇒ threshold 0 ⇒ no family merges ⇒ the sketch IS the exact
    histogram and every quantile estimate equals the exact ceil-rank
    order statistic."""
    import random

    from polygon_algotrading_env_spark.operators.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    rnd = random.Random(1)
    vals = [rnd.randint(0, 1000) for _ in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    nodes, n = qdigest_build(df, "v", k=256, domain_bits=12)
    assert n == 100
    svals = sorted(vals)
    for r in qdigest_quantiles(nodes, n).collect():
        assert r["est_cents"] == svals[r["target_rank"] - 1], r


def test_qdigest_rank_error_bound_and_compression(spark):
    """The q-digest guarantee on compressed data: for every reported
    quantile, the estimate's true rank covers the target and overshoots
    by at most n·domain_bits/k; and the sketch is materially smaller
    than the distinct-value histogram (the point of the structure)."""
    import bisect
    import random

    from polygon_algotrading_env_spark.operators.sketches import (
        qdigest_build,
        qdigest_quantiles,
    )

    rnd = random.Random(7)
    vals = [rnd.randint(0, 4000) for _ in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    nodes, n = qdigest_build(df, "v", k=64, domain_bits=12)
    n_nodes = nodes.count()
    assert n_nodes < len(set(vals)) // 10
    sv = sorted(vals)
    bound = n * 12 / 64
    for r in qdigest_quantiles(nodes, n).collect():
        rank_of_est = bisect.bisect_right(sv, r["est_cents"])
        assert rank_of_est >= r["target_rank"], r
        assert rank_of_est - r["target_rank"] <= bound, r


def test_qdigest_partitioning_invariance(spark):
    """The canonical level-synchronous rule is a pure function of the
    value multiset: node sets are identical across input partitionings
    (the determinism that buys the cross-engine oracle)."""
    import random

    from polygon_algotrading_env_spark.operators.sketches import (
        qdigest_build,
    )

    rnd = random.Random(3)
    vals = [rnd.randint(0, 4000) for _ in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    n1 = {
        (r["lvl"], r["idx"], r["cnt"])
        for r in qdigest_build(df.repartition(1), "v", k=64, domain_bits=12)[
            0
        ].collect()
    }
    n7 = {
        (r["lvl"], r["idx"], r["cnt"])
        for r in qdigest_build(df.repartition(7), "v", k=64, domain_bits=12)[
            0
        ].collect()
    }
    assert n1 == n7 and n1


def test_qdigest_merge_preserves_bound(spark):
    """The silver-table pattern: per-segment digests merge (sum matching
    nodes, recompress at the combined threshold) into a digest whose
    rank error on the COMBINED data still honors n_total·bits/k, with
    the size staying sketch-bounded — union quantile questions never
    rescan the segments."""
    import bisect
    import random

    from polygon_algotrading_env_spark.operators.sketches import (
        qdigest_build,
        qdigest_merge,
        qdigest_quantiles,
    )

    rnd = random.Random(11)
    va = [rnd.randint(0, 2000) for _ in range(12000)]
    vb = [rnd.randint(1500, 4000) for _ in range(8000)]
    da = spark.createDataFrame([(v,) for v in va], "v long")
    db = spark.createDataFrame([(v,) for v in vb], "v long")
    na_nodes, na = qdigest_build(da, "v", k=64, domain_bits=12)
    nb_nodes, nb = qdigest_build(db, "v", k=64, domain_bits=12)
    merged = qdigest_merge(na_nodes, nb_nodes, na + nb, k=64, domain_bits=12)
    n_nodes = merged.count()
    sv = sorted(va + vb)
    assert n_nodes < len(set(sv)) // 5
    bound = (na + nb) * 12 / 64
    for r in qdigest_quantiles(merged, na + nb).collect():
        rank_of_est = bisect.bisect_right(sv, r["est_cents"])
        assert rank_of_est >= r["target_rank"], r
        assert rank_of_est - r["target_rank"] <= bound, r


# --- Count-Min Sketch laws --------------------------------------------------


def _cms_fixture_vals():
    import random

    rnd = random.Random(11)
    # Zipf-ish: a few heavy keys, a long tail — the regime CMS is for.
    vals = []
    for k in range(1, 40):
        vals += [k] * (2000 // k)
    vals += [rnd.randint(100, 5000) for _ in range(5000)]
    rnd.shuffle(vals)
    return vals


def test_cms_never_undercounts_and_rows_partition_n(spark):
    """The CMS guarantee, deterministically: est >= true for EVERY
    distinct key (collisions only add), and each hash row's counters
    sum to exactly n (each row partitions the input)."""
    from collections import Counter

    from polygon_algotrading_env_spark.operators.sketches import (
        cms_build,
        cms_point_estimates,
    )

    vals = _cms_fixture_vals()
    true = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cms = cms_build(df, "v", depth=4, width=256)
    per_row = {
        r["row"]: r["s"]
        for r in cms.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {0: len(vals), 1: len(vals), 2: len(vals), 3: len(vals)}
    keys = spark.createDataFrame([(k,) for k in true], "v long")
    est = {
        r["v"]: r["est_cnt"]
        for r in cms_point_estimates(cms, keys, "v", depth=4, width=256)
        .collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_cms_absent_key_estimate_is_collision_mass_only(spark):
    """A key never inserted reads the pure collision mass of its
    buckets — possibly 0 via the left-join's exact-zero path — and a
    key whose buckets are all empty reads exactly 0."""
    from polygon_algotrading_env_spark.operators.sketches import (
        cms_build,
        cms_point_estimates,
    )

    df = spark.createDataFrame([(v,) for v in [1, 1, 2]], "v long")
    # Wide grid: 3 rows can't fill 1024 buckets, so SOME absent key
    # reads 0; every absent estimate is >= 0 and bounded by n.
    cms = cms_build(df, "v", depth=4, width=1024)
    probes = spark.createDataFrame(
        [(k,) for k in range(1000, 1200)], "v long"
    )
    ests = [
        r["est_cnt"]
        for r in cms_point_estimates(cms, probes, "v", depth=4, width=1024)
        .collect()
    ]
    assert len(ests) == 200
    assert all(0 <= e <= 3 for e in ests)
    assert any(e == 0 for e in ests)


def test_cms_merge_is_exact_counter_addition(spark):
    """cms_merge(build(A), build(B)) is BIT-IDENTICAL to build(A ++ B):
    counters are linear, so merging loses nothing — the property that
    makes per-segment CMS silver tables exact, where q-digest/HLL
    merges are only bound-preserving."""
    from polygon_algotrading_env_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    vals = _cms_fixture_vals()
    half = len(vals) // 2
    a = spark.createDataFrame([(v,) for v in vals[:half]], "v long")
    b = spark.createDataFrame([(v,) for v in vals[half:]], "v long")
    both = spark.createDataFrame([(v,) for v in vals], "v long")
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_build(a, "v", depth=4, width=256),
            cms_build(b, "v", depth=4, width=256),
        ).collect()
    }
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(both, "v", depth=4, width=256).collect()
    }
    assert merged == direct


def test_cms_partitioning_invariance(spark):
    """The sketch is a pure function of the value multiset: counter
    relations are identical across input partitionings (the determinism
    that buys the cross-engine oracle)."""
    from polygon_algotrading_env_spark.operators.sketches import cms_build

    vals = _cms_fixture_vals()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    one = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(df.coalesce(1), "v", depth=4, width=256).collect()
    }
    many = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(
            df.repartition(13, "v"), "v", depth=4, width=256
        ).collect()
    }
    assert one == many


# --- AMS F2 / tug-of-war laws ----------------------------------------------


def test_ams_merge_is_exact_and_cancels(spark):
    """ams_merge(build(A), build(B)) is BIT-IDENTICAL to build(A ++ B).
    Unlike CMS counters (which only add), signed sums genuinely cancel:
    the law covers the negative-contribution path too."""
    from polygon_algotrading_env_spark.operators.sketches import (
        ams_build,
        ams_merge,
    )

    vals = _cms_fixture_vals()
    half = len(vals) // 2
    a = spark.createDataFrame([(v,) for v in vals[:half]], "v long")
    b = spark.createDataFrame([(v,) for v in vals[half:]], "v long")
    both = spark.createDataFrame([(v,) for v in vals], "v long")
    merged = {
        r["row"]: r["signed_sum"]
        for r in ams_merge(
            ams_build(a, "v", rows=16), ams_build(b, "v", rows=16)
        ).collect()
    }
    direct = {
        r["row"]: r["signed_sum"]
        for r in ams_build(both, "v", rows=16).collect()
    }
    assert merged == direct
    assert len(direct) == 16


def test_ams_partitioning_invariance_and_estimate_quality(spark):
    """The sketch is a pure function of the value multiset (identical
    across partitionings — the determinism that buys the cross-engine
    oracle), and the median-of-means estimate lands within the
    analytic band around exact F2 on a Zipf-ish fixture."""
    from polygon_algotrading_env_spark.operators.sketches import (
        ams_build,
        ams_f2_estimate,
    )

    vals = _cms_fixture_vals()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    one = {
        r["row"]: r["signed_sum"]
        for r in ams_build(df.coalesce(1), "v").collect()
    }
    many = {
        r["row"]: r["signed_sum"]
        for r in ams_build(df.repartition(13), "v").collect()
    }
    assert one == many

    from collections import Counter

    exact = sum(c * c for c in Counter(vals).values())
    est = ams_f2_estimate(ams_build(df, "v")).collect()[0]["est_f2"]
    # median-of-4-means over 8 rows: typical rel. error sqrt(2/8)=0.5;
    # the fixture is fixed and hash signs are deterministic, so this is
    # a stable pin, not a flaky statistical assertion.
    assert 0.5 * exact <= est <= 1.5 * exact


def test_ams_sign_sums_bounded_and_rows_validated(spark):
    """Each |signed_sum| <= n (signs are ±1), and rows not divisible by
    groups is rejected up front."""
    import pytest as _pytest

    from polygon_algotrading_env_spark.operators.sketches import (
        ams_build,
        ams_f2_estimate,
    )

    vals = _cms_fixture_vals()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = ams_build(df, "v", rows=8)
    for r in sk.collect():
        assert abs(r["signed_sum"]) <= len(vals)
    with _pytest.raises(ValueError):
        ams_f2_estimate(sk, rows=8, groups=3)


def test_cms_inner_product_never_undercounts_join_size(spark):
    """CMS inner product >= the true equi-join size (matching keys share
    buckets on every row; collision cross-terms are non-negative), and
    with a collision-free width it is EXACT."""
    from collections import Counter

    from polygon_algotrading_env_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )

    vals = _cms_fixture_vals()
    a_vals = vals[: len(vals) // 2]
    b_vals = vals[len(vals) // 3 :]
    ca, cb = Counter(a_vals), Counter(b_vals)
    true_join = sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())
    a = spark.createDataFrame([(v,) for v in a_vals], "v long")
    b = spark.createDataFrame([(v,) for v in b_vals], "v long")
    est = cms_inner_product(
        cms_build(a, "v", depth=4, width=256),
        cms_build(b, "v", depth=4, width=256),
    ).collect()[0]["est_join_size"]
    assert est >= true_join
    # generous width -> few collisions -> estimate close; exactness is
    # not guaranteed at any finite width, the bound is.
    assert est <= 2 * true_join


def test_grouped_half_builds_equal_independent_builds(spark):
    """The merged-halves queries derive both halves' sketches from ONE
    grouped scan; this pins the identity their docstrings cite: the
    per-half grouped relations equal independent cms_build/ams_build
    calls on the filtered halves, bit for bit."""
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.operators.sketches import (
        _ams_sign,
        _cms_bucket,
        ams_build,
        cms_build,
    )

    vals = _cms_fixture_vals()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    # CMS: half joins the (row, bucket) key
    rows = F.explode(F.array(*[F.lit(r) for r in range(4)])).alias("row")
    halved = (
        df.select((F.col("k") % 2).alias("half"), F.col("v").cast("string").alias("__v"))
        .select("half", rows, "__v")
        .select("half", "row", _cms_bucket(F.col("__v"), F.col("row"), 256).alias("bucket"))
        .groupBy("half", "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    for h in (0, 1):
        got = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in halved.where(F.col("half") == h).collect()
        }
        want = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_build(
                df.where(F.col("k") % 2 == h), "v", depth=4, width=256
            ).collect()
        }
        assert got == want, f"cms half {h}"
    # AMS: half joins the wide-aggregate group key
    wide = (
        df.select((F.col("k") % 2).alias("half"), F.md5(F.col("v").cast("string")).alias("__d"))
        .groupBy("half")
        .agg(
            *[
                F.coalesce(F.sum(_ams_sign(F.col("__d"), r)), F.lit(0))
                .cast("bigint")
                .alias(f"s{r}")
                for r in range(16)
            ]
        )
    )
    for h in (0, 1):
        row = wide.where(F.col("half") == h).collect()[0]
        got = {r: row[f"s{r}"] for r in range(16)}
        want = {
            r["row"]: r["signed_sum"]
            for r in ams_build(
                df.where(F.col("k") % 2 == h), "v", rows=16
            ).collect()
        }
        assert got == want, f"ams half {h}"


def test_log_bucket_transform_monotone_and_relative_bound(spark):
    """The relative-quantile query's integer log grid: bucket(v) is
    monotone non-decreasing in v, the bucket's lower bound lo satisfies
    lo <= v, and the bucket width is <= lo/16 for v >= 32 (the <=6.25%
    relative-error claim) and 0 below 32 (identity region)."""
    import pyspark.sql.functions as F

    from polygon_algotrading_env_spark.queries.aggregates import (
        _LOGB_LO,
        _LOGB_SQL,
    )

    import random

    rnd = random.Random(7)
    vals = sorted(
        set(
            list(range(1, 70))
            + [rnd.randint(1, 10**8) for _ in range(3000)]
            + [2**k for k in range(1, 27)]
            + [2**k - 1 for k in range(2, 27)]
        )
    )
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    out = (
        df.selectExpr("cents", f"{_LOGB_SQL} AS b")
        .selectExpr(
            "cents",
            "b",
            f"CAST({_LOGB_LO.format(b='b')} AS BIGINT) AS lo",
        )
        .orderBy("cents")
        .collect()
    )
    prev_b = -1
    for r in out:
        assert r["b"] >= prev_b, (r["cents"], r["b"], prev_b)
        prev_b = r["b"]
        assert r["lo"] <= r["cents"], (r["cents"], r["b"], r["lo"])
        if r["cents"] < 32:
            assert r["lo"] == r["cents"]
        else:
            # next bucket's lo bounds this bucket's width
            assert r["cents"] < r["lo"] + max(1, r["lo"] // 16) + 1, (
                r["cents"],
                r["lo"],
            )
