"""Property-based tests (SURVEY.md §5.4): operator laws checked against
brute-force reference implementations on randomized inputs.

Spark round-trips are slow, so examples are few but structurally rich
(duplicate timestamps, empty sides, singleton groups).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_algotrading_env_spark.operators.asof import asof_join
from polygon_algotrading_env_spark.operators.bars import ohlcv_bars, resample_bars
from polygon_algotrading_env_spark.operators.dedup import exact_dedup

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

key_st = st.sampled_from(["A", "B"])
ts_st = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(key_st, ts_st), min_size=0, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(key_st, ts_st), min_size=0, max_size=12, unique=True)
    )
    return left, right


def _brute_asof(left, right, inclusive=True):
    out = {}
    for k, t in left:
        cands = [
            rt for rk, rt in right if rk == k and (rt <= t if inclusive else rt < t)
        ]
        out[(k, t)] = max(cands) if cands else None
    return out


@SLOW
@given(asof_case())
def test_asof_matches_bruteforce(spark, case):
    left, right = case
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [("Z", -1)], "k string, t long"
    )
    rdf = spark.createDataFrame(
        [(k, t, f"r{t}") for k, t in right] or [("Z", -2, "r")],
        "k string, t long, rv string",
    )
    got = {
        (r["k"], r["t"]): r["t_r"]
        for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t").collect()
    }
    expected = _brute_asof(left or [("Z", -1)], right or [("Z", -2)])
    assert got == expected


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3599),                      # second within the hour
            st.floats(1.0, 100.0, allow_nan=False),    # price
        ),
        min_size=1,
        max_size=40,
    )
)
def test_resample_ladder_property(spark, ticks):
    base = datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        ("X", base + timedelta(seconds=s), round(p, 2), float(i))
        for i, (s, p) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows, "ticker string, ts timestamp_ntz, price double, seq double"
    )
    one = ohlcv_bars(df, "ts", "price", "1 minute", ("ticker",), order_col="seq")
    via = resample_bars(
        resample_bars(one, "5 minutes", ("ticker",)), "1 hour", ("ticker",)
    )
    direct = ohlcv_bars(df, "ts", "price", "1 hour", ("ticker",), order_col="seq")
    cols = ["bucket_start", "open", "high", "low", "close", "volume", "n_trades"]
    assert {tuple(r[c] for c in cols) for r in via.collect()} == {
        tuple(r[c] for c in cols) for r in direct.collect()
    }


@SLOW
@given(
    st.text(alphabet="abcdefgh ", min_size=40, max_size=80),
    st.text(alphabet="qrstuvwx ", min_size=40, max_size=80),
    st.text(alphabet="ijklmnop ", min_size=30, max_size=50),
)
def test_winnowing_guarantee(spark, pre_a, pre_b, shared):
    """The winnowing guarantee: any shared substring of length ≥
    window+k-1 produces at least one shared fingerprint (min_shared=1),
    regardless of surrounding content."""
    from polygon_algotrading_env_spark.operators.dedup import winnow_candidate_pairs

    k, window = 8, 12
    assert len(shared) >= window + k - 1
    docs = spark.createDataFrame(
        [(0, pre_a + shared), (1, pre_b + shared)], "doc_id long, text string"
    )
    pairs = winnow_candidate_pairs(docs, k=k, window=window, min_shared=1).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 1) for r in pairs)


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["x", "y", "z"])),
        min_size=0,
        max_size=30,
    )
)
def test_dedup_idempotent_and_set_semantics(spark, rows):
    df = spark.createDataFrame(rows or [(99, "w")], "a int, b string")
    once = exact_dedup(df)
    assert once.count() == len(set(rows or [(99, "w")]))
    assert exact_dedup(once).count() == once.count()
    # Dedup of df ∪ df equals dedup of df (the page-overlap law).
    assert exact_dedup(df.unionByName(df)).count() == once.count()


# --- z-order: exact Morton round trip on grid data ------------------------
@SLOW
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15), st.integers(0, 15)),
        min_size=2,
        max_size=20,
        unique=True,
    )
)
def test_zorder_deinterleaves_exactly(spark, pts):
    """On data spanning the full [0, 2^bits) grid, min/max scaling is the
    identity and the Morton key must de-interleave back to the inputs."""
    from polygon_algotrading_env_spark.operators.layout import zorder_value

    # Pin the corners so bounds are exactly [0, 15] per dimension.
    rows = sorted(set(pts) | {(0, 0, 0), (15, 15, 15)})
    df = spark.createDataFrame(rows, "x int, y int, z int")
    got = df.withColumn("m", zorder_value(df, ["x", "y", "z"], bits=4)).collect()

    def deinterleave(m, j, bits=4, n=3):
        return sum(((m >> (i * n + j)) & 1) << i for i in range(bits))

    for r in got:
        assert (
            deinterleave(r["m"], 0),
            deinterleave(r["m"], 1),
            deinterleave(r["m"], 2),
        ) == (r["x"], r["y"], r["z"])
        assert 0 <= r["m"] < (1 << 12)


# --- band join ≡ brute force under random bands ---------------------------
@SLOW
@given(
    lvals=st.lists(st.integers(0, 60), min_size=0, max_size=10),
    rvals=st.lists(st.integers(0, 60), min_size=0, max_size=10),
    band=st.tuples(st.integers(-15, 15), st.integers(0, 20)),
    width=st.sampled_from([1.0, 3.0, 8.0, None]),
)
def test_band_join_law(spark, lvals, rvals, band, width):
    from polygon_algotrading_env_spark.operators.rangejoin import band_join

    low, span = band
    high = low + span
    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(lvals)], "lid int, lv long"
    )
    right = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rvals)], "rid int, rv long"
    )
    got = {
        (r["lid"], r["rid"])
        for r in band_join(
            left, right, "lv", "rv", low=low, high=high, bucket_width=width
        ).collect()
    }
    expect = {
        (li, ri)
        for li, lv in enumerate(lvals)
        for ri, rv in enumerate(rvals)
        if lv + low <= rv <= lv + high
    }
    assert got == expect


# --- indicator laws over random bar series --------------------------------
@SLOW
@given(
    st.lists(
        st.tuples(
            st.floats(1.0, 100.0, allow_nan=False),  # low offset base
            st.floats(0.0, 20.0, allow_nan=False),   # bar range
            st.floats(0.0, 1.0, allow_nan=False),    # close position in range
        ),
        min_size=1,
        max_size=25,
    )
)
def test_indicator_laws(spark, bars):
    """ATR/TR, Donchian, and stochastic laws on random valid bars:
    TR >= high-low >= 0 and ATR >= 0; the Donchian channel brackets every
    close in its window; %K is in [0, 100] or NULL exactly when the
    window range is flat."""
    from polygon_algotrading_env_spark.operators.indicators import (
        with_atr,
        with_donchian,
        with_stochastic,
    )

    rows = []
    for i, (lo, rng, cpos) in enumerate(bars):
        low, high = round(lo, 2), round(lo + rng, 2)
        close = round(low + (high - low) * cpos, 2)
        rows.append(("X", i, high, low, close))
    df = spark.createDataFrame(
        rows, "ticker string, seq long, high double, low double, close double"
    )
    atr = with_atr(df, 5, ["ticker"], ["seq"]).collect()
    for r in atr:
        hl = r["high"] - r["low"]
        assert r["true_range"] >= hl - 1e-9 and r["true_range"] >= -1e-12
        assert r["atr_5"] >= -1e-12
    dc = with_donchian(df, 5, ["ticker"], ["seq"]).collect()
    for r in dc:
        assert r["dc_lower"] - 1e-9 <= r["close"] <= r["dc_upper"] + 1e-9
        assert abs(r["dc_mid"] - (r["dc_upper"] + r["dc_lower"]) / 2) < 1e-12
    stoch = with_stochastic(df, 5, 3, ["ticker"], ["seq"]).collect()
    for r in stoch:
        if r["stoch_k_5"] is None:
            continue
        assert -1e-9 <= r["stoch_k_5"] <= 100.0 + 1e-9


@SLOW
@given(
    st.lists(
        st.tuples(
            st.floats(1.0, 50.0, allow_nan=False),   # close
            st.floats(0.0, 10.0, allow_nan=False),   # volume
        ),
        min_size=1,
        max_size=25,
    )
)
def test_obv_telescoping_bound(spark, bars):
    """|OBV| can never exceed the total traded volume after the first
    bar, and OBV is exactly 0 whenever closes are monotone flat."""
    from polygon_algotrading_env_spark.operators.indicators import with_obv

    rows = [
        ("X", i, round(c, 2), round(v, 4)) for i, (c, v) in enumerate(bars)
    ]
    df = spark.createDataFrame(
        rows, "ticker string, seq long, close double, volume double"
    )
    out = sorted(
        with_obv(df, ["ticker"], ["seq"]).collect(), key=lambda r: r["seq"]
    )
    total_after_first = sum(r["volume"] for r in out[1:])
    for r in out:
        assert abs(r["obv"]) <= total_after_first + 1e-6


@SLOW
@given(st.integers(1, 137))
def test_decile_sizes_partition_ntile(spark, n):
    """order_price_deciles' closed-form bucket law on arbitrary n: bucket
    sizes partition n with the remainder front-loaded (first n%10 buckets
    one larger), exactly like ntile(10)."""
    import pyspark.sql.functions as F

    df = spark.range(1, n + 1).select(F.col("id").alias("ordinal"))
    got = df.selectExpr(
        f"""CAST(IF(ordinal <= ({n} % 10) * ({n} DIV 10 + 1),
                    (ordinal - 1) DIV ({n} DIV 10 + 1) + 1,
                    ({n} % 10) + (ordinal - 1 - ({n} % 10) * ({n} DIV 10 + 1))
                        DIV ({n} DIV 10) + 1)
                AS INT) AS decile"""
    ).groupBy("decile").count().collect()
    sizes = {r["decile"]: r["count"] for r in got}
    q, r = divmod(n, 10)
    expected = {
        b: (q + 1 if b <= r else q)
        for b in range(1, min(n, 10) + 1)
        if (q + 1 if b <= r else q) > 0
    }
    assert sizes == expected


# --- Misra-Gries laws -----------------------------------------------------

@SLOW
@given(
    rows=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=120),
    capacity=st.integers(min_value=2, max_value=8),
)
def test_mg_completeness_and_undercount_law(spark, rows, capacity):
    """For ANY input and capacity: every key with count > N/(capacity+1)
    survives in the candidate union, and surviving mg_counts never
    exceed true counts."""
    from collections import Counter

    from polygon_algotrading_env_spark.operators.sketches import (
        mg_partition_candidates,
    )

    df = spark.createDataFrame([(k,) for k in rows], ["k"]).repartition(3)
    got = {
        r["k"]: r["mg_count"]
        for r in mg_partition_candidates(df, "k", capacity).collect()
    }
    true = Counter(rows)
    n = len(rows)
    for k, cnt in true.items():
        if cnt > n / (capacity + 1):
            assert k in got, (k, cnt, n, capacity)
    for k, mg in got.items():
        assert mg <= true[k], (k, mg, true[k])


# --- CUSUM closed form ≡ recursion ---------------------------------------

@SLOW
@given(
    devs=st.lists(
        st.floats(min_value=-3, max_value=3, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_prefix_identity_law(spark, devs):
    """The prefix-sum closed form equals the sequential recursion
    S_t = max(0, S_{t-1} + a_t) for arbitrary deviation sequences."""
    from pyspark.sql import Window

    rows = [(i, float(a)) for i, a in enumerate(devs)]
    df = spark.createDataFrame(rows, ["t", "a"])
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        df.withColumn("pref", F.sum("a").over(w))
        .withColumn("pmin", F.least(F.min(F.col("pref")).over(w), F.lit(0.0)))
        .select("t", (F.col("pref") - F.col("pmin")).alias("s"))
        .collect()
    )
    got = {r["t"]: r["s"] for r in out}
    s = 0.0
    for i, a in enumerate(devs):
        s = max(0.0, s + float(a))
        assert abs(got[i] - s) < 1e-9, (i, got[i], s)


# --- mixture resample law -------------------------------------------------

@SLOW
@given(
    counts=st.tuples(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=40),
    ),
    weights=st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
)
def test_mixture_resample_quota_law(spark, counts, weights):
    """Quotas are floor(w·min(N_g/w_g)): the binding group keeps
    ~everything, none oversample, and realized counts match the formula
    exactly."""
    import math

    from polygon_algotrading_env_spark.operators.sampling import (
        mixture_resample,
    )

    total = sum(weights)
    wmap = {g: w / total for g, w in zip("abc", weights)}
    rows = [
        (g_i * 1000 + i, g)
        for g_i, (g, n) in enumerate(zip("abc", counts))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = mixture_resample(df, "grp", wmap).groupBy("grp").count().collect()
    got = {r["grp"]: r["count"] for r in out}
    c = min(n / wmap[g] for g, n in zip("abc", counts))
    for g, n in zip("abc", counts):
        expect = math.floor(wmap[g] * c)
        assert got.get(g, 0) == expect, (g, got, expect)
        assert got.get(g, 0) <= n


# --- resize laws ----------------------------------------------------------

@SLOW
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_resize_identity_and_palette_law(spark, h, w, seed):
    """Resizing to the same shape is the identity, and nearest-neighbor
    never invents pixel values (output palette ⊆ input palette)."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        resize_nearest,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (resize_nearest(img, h, w) == img).all()
    out = resize_nearest(img, max(1, h // 2 + 1), w * 2)
    in_pal = {tuple(p) for p in img.reshape(-1, 3)}
    out_pal = {tuple(p) for p in out.reshape(-1, 3)}
    assert out_pal <= in_pal


# --- threshold (dollar/volume) bars law ------------------------------------

@SLOW
@given(
    vals=st.lists(
        st.floats(min_value=0.5, max_value=50, allow_nan=False, width=32),
        min_size=1,
        max_size=60,
    ),
    threshold=st.floats(min_value=5, max_value=100, allow_nan=False),
)
def test_threshold_bars_measure_law(spark, vals, threshold):
    """Bar assignment equals the brute-force pre-sum reference exactly
    (identical sequential arithmetic), ids strictly increase in time,
    tick counts and measure are conserved — for arbitrary positive
    streams and thresholds, including single ticks that overshoot
    several threshold multiples (which legitimately SKIP bar ids)."""
    from collections import defaultdict
    from datetime import datetime, timedelta

    from polygon_algotrading_env_spark.operators.bars import threshold_bars

    t0 = datetime(2024, 1, 1)
    rows = [
        ("K", t0 + timedelta(seconds=i), float(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, value double")
    out = threshold_bars(
        df, measure_col="value", threshold=float(threshold), keys=("sym",),
        ts_col="ts", price_col="value",
    ).orderBy("bar_id").collect()
    ref = defaultdict(lambda: [0, 0.0])  # bar_id -> [n_ticks, measure]
    pre = 0.0
    for v in vals:
        b = int(pre // float(threshold))
        ref[b][0] += 1
        ref[b][1] += float(v)
        pre += float(v)
    assert {r["bar_id"] for r in out} == set(ref)
    ids = [r["bar_id"] for r in out]
    assert ids == sorted(ids)
    assert sum(r["n_ticks"] for r in out) == len(vals)
    assert abs(sum(r["measure"] for r in out) - sum(vals)) < 1e-6
    for r in out:
        assert r["n_ticks"] == ref[r["bar_id"]][0]
        assert abs(r["measure"] - ref[r["bar_id"]][1]) < 1e-9


# --- triple-barrier vs brute force -----------------------------------------

@SLOW
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    pt=st.floats(min_value=0.01, max_value=0.2, allow_nan=False),
)
def test_triple_barrier_matches_bruteforce(spark, seed, pt):
    """Labels and first-touch indexes equal a straight scan of the
    forward path for random walks and any barrier width."""
    from datetime import datetime, timedelta

    import numpy as np

    from polygon_algotrading_env_spark.operators.backtest import (
        triple_barrier_labels,
    )

    rng = np.random.default_rng(seed)
    prices = 100.0 * np.cumprod(1 + rng.normal(0, 0.03, 40))
    horizon = 6
    t0 = datetime(2024, 1, 1)
    rows = [
        ("S", t0 + timedelta(minutes=5 * i), float(p))
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, bucket_start timestamp, close double"
    )
    got = {
        r["bucket_start"]: (r["label"], r["bars_to_hit"])
        for r in triple_barrier_labels(
            df, horizon=horizon, profit_take=float(pt), stop_loss=float(pt)
        ).collect()
    }
    n = len(prices)
    assert len(got) == max(0, n - horizon)
    for i in range(n - horizon):
        entry = prices[i]
        up, dn = entry * (1 + pt), entry * (1 - pt)
        hit_up = hit_dn = None
        for k in range(1, horizon + 1):
            p = prices[i + k]
            if hit_up is None and p >= up:
                hit_up = k
            if hit_dn is None and p <= dn:
                hit_dn = k
        if hit_up is not None and (hit_dn is None or hit_up < hit_dn):
            ref = (1, hit_up)
        elif hit_dn is not None:
            ref = (-1, hit_dn)
        else:
            ref = (0, None)
        ts = t0 + timedelta(minutes=5 * i)
        assert got[ts] == ref, (i, got[ts], ref)


# --- MG certificate soundness ----------------------------------------------

@SLOW
@given(
    head=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=20, max_value=80),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
    tail_n=st.integers(min_value=0, max_value=150),
    capacity=st.integers(min_value=4, max_value=32),
    k=st.integers(min_value=1, max_value=4),
)
def test_mg_certificate_soundness(spark, head, tail_n, capacity, k):
    """Whenever the certificate comes back TRUE, the returned rows equal
    the exact full-shuffle top-k (same keys, same counts, same order) —
    for arbitrary skews, capacities, and k. An uncertified answer makes
    no claim and is not checked."""
    from collections import Counter

    from polygon_algotrading_env_spark.operators.sketches import mg_heavy_hitters

    rows = [(key,) for key, reps in head for _ in range(reps)]
    rows += [(1000 + i,) for i in range(tail_n)]
    df = spark.createDataFrame(rows, ["key"]).repartition(3)
    out = mg_heavy_hitters(df, "key", k=k, capacity=capacity).collect()
    if not out or not out[0]["certified"]:
        return
    true = Counter(key for (key,) in rows)
    expect = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[: len(out)]
    got = [(r["key"], r["cnt"]) for r in out]
    assert got == expect, (got, expect)


# --- KMV / bottom-k sketch laws --------------------------------------------

@SLOW
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    cut=st.integers(min_value=0, max_value=60),
    k=st.sampled_from([4, 8, 16]),
)
def test_kmv_merge_law_exact(spark, ids, cut, k):
    """KMV bottom-k by fixed md5 priority merges EXACTLY: the union's
    sketch equals the k smallest of the two sides' sketches combined —
    for arbitrary value sets, arbitrary split points, and arbitrary k,
    matching the brute-force reference selection."""
    import hashlib

    from polygon_algotrading_env_spark.operators.sketches import (
        kmv_distinct_sketch,
    )

    cut = min(cut, len(ids))
    a_ids, b_ids = ids[:cut], ids[cut:]
    df = spark.createDataFrame(
        [("a", i) for i in a_ids] + [("b", i) for i in b_ids],
        "seg string, v long",
    )
    union_df = df.select(F.lit("u").alias("seg"), "v")
    sk = {
        r["seg"]: list(r["kmv"])
        for r in kmv_distinct_sketch(df, "v", ["seg"], k=k).collect()
    }
    got_union = kmv_distinct_sketch(union_df, "v", ["seg"], k=k).collect()[0]
    merged = sorted(set(sk.get("a", []) + sk.get("b", [])))[:k]
    assert list(got_union["kmv"]) == merged
    # and both equal the brute-force md5 selection over the raw ids
    ref = sorted(hashlib.md5(str(i).encode()).hexdigest() for i in ids)[:k]
    assert merged == ref


@SLOW
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    ),
    parts=st.sampled_from([1, 3, 7]),
    k=st.sampled_from([4, 16]),
)
def test_bottomk_sketch_matches_reference_selection(spark, vals, parts, k):
    """The bottom-k quantile sample equals the brute-force md5-priority
    selection for any data, any partitioning, any k — the determinism
    the cross-engine oracle relies on."""
    import hashlib

    from polygon_algotrading_env_spark.operators.sketches import bottomk_sketch

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in vals], "key string, id long, v double"
    ).repartition(parts)
    got = bottomk_sketch(df, "v", "id", ["key"], k=k).collect()[0]
    ref = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), str(i), float(np32(v)))
        for i, v in vals
    )[:k]
    assert [(x["pr"], x["id"]) for x in got["sketch"]] == [
        (pr, i) for pr, i, _ in ref
    ]
    assert got["n_rows"] == len(vals)


def np32(v):
    import numpy as np

    return np.float32(v)


# --- codec round-trip laws (no Spark needed: pure codec properties) --------

@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    nc=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_law(h, w, nc, interlace, seed):
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
    img = palette[rng.integers(0, nc, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    sub=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_constant_blocks_law(h, w, sub, seed):
    """Flat-color images survive baseline JPEG to within ±1 per channel
    at flat quant (DC-only blocks, no AC loss, any dimensions via edge
    padding; the ±1 is the YCbCr↔RGB double-rounding inherent to
    JPEG — ~20% of flat colors land one LSB off), and flat GRAY images
    survive exactly (Cb=Cr=128, Y=gray: no chroma rounding)."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), rng.integers(0, 256, 3, dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, quant=4, subsample=sub))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    g = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(g, quant=4, subsample=sub)), g)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 4000),
    bps=st.sampled_from([8, 16]),
    blocksize=st.sampled_from([256, 1024, 4096]),
    stereo=st.sampled_from([None, "independent", "left_side", "mid_side"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_lossless_law(n, bps, blocksize, stereo, seed):
    """FLAC is LOSSLESS for arbitrary quantized PCM at any block/bit
    configuration and stereo decorrelation — the defining codec law."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.flac import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(seed)
    scale = float(1 << (bps - 1))

    def q(x):
        return np.clip(np.round(np.clip(x, -1, 1) * scale), -scale, scale - 1) / scale

    if stereo is None:
        sig = rng.uniform(-1, 1, n)
        back, _ = decode_flac(
            encode_flac(sig, 8000, bps=bps, blocksize=blocksize)
        )
        assert np.array_equal(back, q(sig))
    else:
        st2 = rng.uniform(-1, 1, (2, n))
        back, _ = decode_flac(
            encode_flac(st2, 8000, bps=bps, blocksize=blocksize, stereo_mode=stereo)
        )
        assert np.array_equal(back, (q(st2[0]) + q(st2[1])) / 2)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    levels=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_qoi_roundtrip_law(h, w, levels, seed):
    """QOI is lossless for ANY uint8 RGB image; `levels` sweeps entropy
    from constant (pure RUN coding) to full-range (RGB/LUMA heavy)."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.default_rng(seed)
    img = (
        rng.integers(0, levels, (h, w, 3)) * (255 // max(levels - 1, 1))
    ).astype(np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_law(h, w, seed):
    """BMP 24-bit BI_RGB is lossless for any uint8 RGB image — width
    sweeps all four row-padding residues."""
    import numpy as np

    from polygon_algotrading_env_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
