"""Reference checks for the round-10 analytics additions: the rank tests
(Mann-Whitney U, Kruskal-Wallis H) against hand-computed textbook values,
and the inequality/concentration measures (Theil T / MLD, Herfindahl)
against closed-form degenerate and two-point cases. These pin SEMANTICS;
the cross-engine DuckDB oracles pin distributed execution.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.rankstats import cumulate_grid


def _mw_stats(spark, vals_a, vals_b):
    rows = [(float(v), 1) for v in vals_a] + [(float(v), 0) for v in vals_b]
    df = spark.createDataFrame(rows, "x double, g1 int")
    grid = df.groupBy("x").agg(
        F.count(F.lit(1)).alias("t"), F.sum("g1").cast("bigint").alias("t1")
    )
    stats = cumulate_grid(grid, [], "x", "t")
    two_avgrank = F.col("cum_lt") + F.col("cum_le") + 1
    r = stats.agg(
        F.sum(F.col("t1") * two_avgrank).alias("two_r1"),
        F.sum("t1").alias("n1"),
        F.max("n_g").alias("n"),
    ).collect()[0]
    return r["two_r1"], r["n1"], r["n"]


def test_mann_whitney_u_matches_textbook(spark):
    # A = [1, 4, 5], B = [2, 3, 6]: ranks of A are 1, 4, 5 -> R1 = 10,
    # U1 = 10 - 3*4/2 = 4 (n1 = n2 = 3, no ties)
    two_r1, n1, n = _mw_stats(spark, [1, 4, 5], [2, 3, 6])
    assert (two_r1, n1, n) == (20, 3, 6)
    assert (two_r1 - n1 * (n1 + 1)) // 2 == 4  # U1


def test_mann_whitney_ties_use_average_ranks(spark):
    # A = [1, 2], B = [2, 3]: tied 2s share rank 2.5 -> R1 = 3.5, U1 = 0.5
    two_r1, n1, n = _mw_stats(spark, [1, 2], [2, 3])
    assert (two_r1, n1, n) == (7, 2, 4)  # 2*R1 = 7
    assert two_r1 - n1 * (n1 + 1) == 1  # 2*U1 = 1


def test_kruskal_wallis_matches_manual(spark):
    # three groups, no ties: ranks 1..6; H = 12/(n(n+1)) * sum n_g (rbar -
    # (n+1)/2)^2 with n = 6
    groups = {"a": [1.0, 2.0], "b": [3.0, 4.0], "c": [5.0, 6.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")
    g2 = df.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    pooled = g2.groupBy("x").agg(F.sum("c").alias("t"))
    cum = cumulate_grid(pooled, [], "x", "t")
    tar = (F.col("cum_lt") + F.col("cum_le") + 1).alias("__tar")
    perg = (
        g2.join(cum.select("x", tar), "x")
        .groupBy("g")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(F.col("c") * F.col("__tar")).alias("two_r_g"),
        )
        .collect()
    )
    n = 6
    ss = sum(
        r["n_g"] * (r["two_r_g"] / (2 * r["n_g"]) - (n + 1) / 2) ** 2
        for r in perg
    )
    h = 12.0 / (n * (n + 1)) * ss
    # manual: rbars are 1.5, 3.5, 5.5 -> ss = 2*(4 + 0 + 4) = 16, H = 32/7
    assert abs(h - 32.0 / 7.0) < 1e-12


def test_theil_zero_for_equal_values_and_known_two_point(spark, sf_dir):
    # Semantics probe on the registered query's formula shape: equal
    # values => T = MLD = 0; the two-point case matches the closed form.
    from polygon_algotrading_env_spark.queries.advanced import (
        theil_index_by_priority,  # noqa: F401  (import proves registration)
    )

    def theil(vals):
        n = len(vals)
        mu = sum(vals) / n
        t = sum((v / mu) * math.log(v / mu) for v in vals) / n
        l_ = sum(math.log(mu / v) for v in vals) / n
        return t, l_

    t0, l0 = theil([5.0, 5.0, 5.0])
    assert abs(t0) < 1e-15 and abs(l0) < 1e-15
    t1, l1 = theil([1.0, 3.0])
    # closed form: mu=2, T = (0.5*ln0.5 + 1.5*ln1.5)/2
    assert abs(t1 - (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2) < 1e-15
    assert abs(l1 - (math.log(2.0) + math.log(2.0 / 3.0)) / 2) < 1e-15


def test_herfindahl_degenerate_cases(spark):
    # one supplier owning a brand => HHI = top_share = 1; two equal
    # suppliers => HHI = 0.5
    rows = [("B1", 1, 100.0), ("B2", 1, 50.0), ("B2", 2, 50.0)]
    rev = spark.createDataFrame(rows, "brand string, supp int, r double")
    b = rev.groupBy("brand").agg(
        F.sum("r").alias("total"),
        F.sum(F.col("r") * F.col("r")).alias("ss"),
        F.max("r").alias("top_r"),
    )
    got = {
        r["brand"]: (
            r["ss"] / (r["total"] * r["total"]),
            r["top_r"] / r["total"],
        )
        for r in b.collect()
    }
    assert got["B1"] == (1.0, 1.0)
    assert got["B2"] == (0.5, 0.5)


def test_rank_test_plans_keep_the_zone_law(spark, sf_dir):
    """Both rank-test queries run their pooled cumulation on the zoned
    grid — no Window node in their plans may lack the zone id."""
    from polygon_algotrading_env_spark.queries import REGISTRY

    for name in (
        "mann_whitney_u_price_urgency",
        "kruskal_wallis_price_by_priority",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            s = line.strip().lstrip("+-: ")
            if s.startswith("Window "):
                assert "__zone" in s, (name, s)


def test_kendall_tau_matches_bruteforce(spark):
    """The grid-sweep tau-b (two window prefix sweeps over the dense
    grid) must equal the O(n^2) brute-force pair count, ties included."""
    import itertools
    import random

    from pyspark.sql import Window

    rnd = random.Random(11)
    xs = [rnd.randint(1, 6) for _ in range(80)]
    ys = [rnd.randint(1, 4) for _ in range(80)]
    # brute force
    c_bf = d_bf = 0
    for (x1, y1), (x2, y2) in itertools.combinations(zip(xs, ys), 2):
        s = (x1 - x2) * (y1 - y2)
        c_bf += s > 0
        d_bf += s < 0
    n = len(xs)
    tx = sum(
        t * (t - 1) // 2
        for t in __import__("collections").Counter(xs).values()
    )
    ty = sum(
        t * (t - 1) // 2
        for t in __import__("collections").Counter(ys).values()
    )
    n0 = n * (n - 1) / 2
    tau_bf = (c_bf - d_bf) / math.sqrt((n0 - tx) * (n0 - ty))

    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x int, y int"
    )
    cells = df.groupBy("g", "x", "y").agg(F.count(F.lit(1)).alias("c"))
    dense = (
        df.select("g", "x").distinct()
        .join(df.select("g", "y").distinct(), "g")
        .join(cells, ["g", "x", "y"], "left")
        .select("g", "x", "y", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_h = (
        Window.partitionBy("g", "y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_a = (
        Window.partitionBy("g")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sweep = dense.select(
        "g", "x", "y", "c",
        F.coalesce(F.sum("c").over(w_h), F.lit(0)).alias("h"),
        F.coalesce(F.sum("c").over(w_a), F.lit(0)).alias("a"),
    )
    w_d = (
        Window.partitionBy("g", "x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = sweep.withColumn(
        "dlt", F.coalesce(F.sum("h").over(w_d), F.lit(0))
    )
    r = dom.groupBy("g").agg(
        F.sum(F.col("c") * F.col("dlt")).alias("cp"),
        F.sum(
            F.col("c") * (F.col("a") - F.col("dlt") - F.col("h"))
        ).alias("dp"),
    ).collect()[0]
    assert (r["cp"], r["dp"]) == (c_bf, d_bf)
    tau = (r["cp"] - r["dp"]) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(tau - tau_bf) < 1e-15


def test_jarque_bera_moment_recipe_matches_python(spark):
    """The raw→central moment recipe (the exact expression both engines
    evaluate) must match a plain Python reference on a fixed sample."""
    import random

    rnd = random.Random(3)
    vals = [rnd.gauss(0.0, 1.0) for _ in range(500)]
    n = len(vals)
    s1 = sum(vals)
    s2 = sum(v * v for v in vals)
    s3 = sum(v**3 for v in vals)
    s4 = sum(v**4 for v in vals)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu**3
    m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) - 3.0 * mu**4
    skew_ref = m3 / (m2 * math.sqrt(m2))
    kurt_ref = m4 / (m2 * m2)
    jb_ref = n / 6.0 * (skew_ref**2 + (kurt_ref - 3.0) ** 2 / 4.0)

    df = spark.createDataFrame([(v,) for v in vals], "r double")
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("s1"),
        F.sum(F.col("r") * F.col("r")).alias("s2"),
        F.sum(F.col("r") * F.col("r") * F.col("r")).alias("s3"),
        F.sum(F.col("r") * F.col("r") * F.col("r") * F.col("r")).alias("s4"),
    ).collect()[0]
    nd = float(m["n"])
    mu_s = m["s1"] / nd
    m2_s = m["s2"] / nd - mu_s * mu_s
    m3_s = m["s3"] / nd - 3.0 * mu_s * (m["s2"] / nd) + 2.0 * mu_s**3
    m4_s = (
        m["s4"] / nd
        - 4.0 * mu_s * (m["s3"] / nd)
        + 6.0 * mu_s * mu_s * (m["s2"] / nd)
        - 3.0 * mu_s**4
    )
    skew = m3_s / (m2_s * math.sqrt(m2_s))
    kurt = m4_s / (m2_s * m2_s)
    jb = nd / 6.0 * (skew**2 + (kurt - 3.0) ** 2 / 4.0)
    assert abs(skew - skew_ref) < 1e-9
    assert abs(kurt - kurt_ref) < 1e-9
    assert abs(jb - jb_ref) < 1e-7
    # a Gaussian-ish sample should not be wildly non-normal
    assert abs(skew) < 0.5 and 2.0 < kurt < 4.0


def test_hill_topk_from_grid_matches_sorted_reference(spark):
    """Top-k multiset selection from the rank grid (contribution =
    min(c, k - #strictly-greater)) must equal a plain sorted top-k,
    ties included, and the threshold cell must be the (k+1)-th largest."""
    import random

    from polygon_algotrading_env_spark.operators.rankstats import (
        grid_rank_stats,
    )

    rnd = random.Random(5)
    vals = [rnd.randint(1, 40) for _ in range(300)]  # heavy ties
    k = 20
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x int")
    stats = grid_rank_stats(df, "x", ["g"])
    above = F.col("n_g") - F.col("cum_le")
    contrib = F.when(above < k, F.least(F.col("c"), k - above)).otherwise(0)
    thr = F.max(
        F.when((above < k + 1) & (above + F.col("c") >= k + 1), F.col("x"))
    )
    row = (
        stats.groupBy("g")
        .agg(
            F.sum(contrib * F.col("x")).alias("top_sum"),
            F.sum(contrib).alias("top_n"),
            thr.alias("thr"),
        )
        .collect()[0]
    )
    s = sorted(vals, reverse=True)
    assert row["top_n"] == k
    assert row["top_sum"] == sum(s[:k])
    assert row["thr"] == s[k]  # (k+1)-th largest


def test_runs_count_matches_python(spark):
    """R (number of runs) computed by the sign-change window must match a
    direct Python scan, with zeros dropped first."""
    from pyspark.sql import Window

    seq = [1, 1, -1, 1, 0, -1, -1, 1, 0, 0, -1, 1, 1, 1, -1]
    signs = [s for s in seq if s != 0]
    r_ref = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    n1_ref = sum(s == 1 for s in signs)
    n2_ref = len(signs) - n1_ref

    df = spark.createDataFrame(
        [("g", i, s) for i, s in enumerate(seq)], "g string, t int, s int"
    ).where("s != 0")
    w = Window.partitionBy("g").orderBy("t")
    prev = F.lag("s").over(w)
    runs = df.select(
        "g", "s",
        F.when(prev.isNull() | (prev != F.col("s")), 1).otherwise(0).alias("nr"),
    )
    row = runs.groupBy("g").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n2"),
        F.sum("nr").alias("r"),
    ).collect()[0]
    assert (row["n1"], row["n2"], row["r"]) == (n1_ref, n2_ref, r_ref)


def test_ljung_box_recipe_matches_python(spark):
    """The one-pass lagged autocovariance recipe must equal the textbook
    Q = n(n+2) sum rho_k^2/(n-k) computed sequentially in Python."""
    import random

    rnd = random.Random(9)
    xs = [rnd.gauss(0, 1) for _ in range(200)]
    m = sum(xs) / len(xs)
    x = [v - m for v in xs]
    n = len(x)
    s0 = sum(v * v for v in x)
    q_ref = 0.0
    for k in range(1, 6):
        sk = sum(x[t] * x[t - k] for t in range(k, n))
        q_ref += (sk / s0) ** 2 / (n - k)
    q_ref *= n * (n + 2)

    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(x)], "g string, t int, x double"
    )
    w = Window.partitionBy("g").orderBy("t")
    lagged = df.select(
        "g", "x", *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, 6)]
    )
    aggs = [F.sum(F.col("x") * F.col("x")).alias("s0")]
    for k in range(1, 6):
        aggs.append(
            F.sum(F.col("x") * F.coalesce(F.col(f"x{k}"), F.lit(0.0))).alias(f"s{k}")
        )
    row = lagged.groupBy("g").agg(*aggs).collect()[0]
    q = n * (n + 2) * sum((row[f"s{k}"] / row["s0"]) ** 2 / (n - k) for k in range(1, 6))
    assert abs(q - q_ref) < 1e-8


def test_atkinson_closed_form_vs_mld(spark):
    """A(1) = 1 - exp(-MLD): the Atkinson index at epsilon 1 must equal
    the closed-form transform of the mean-log-deviation on any sample."""
    vals = [1.0, 3.0, 7.0, 7.0, 2.0]
    n = len(vals)
    mu = sum(vals) / n
    mld = sum(math.log(mu / v) for v in vals) / n
    gm = math.exp(sum(math.log(v) for v in vals) / n)
    atkinson = 1.0 - gm / mu
    assert abs(atkinson - (1.0 - math.exp(-mld))) < 1e-15


def test_mcleod_li_detects_planted_arch_effects(spark):
    """Semantics of the McLeod-Li variant: a series with volatility
    clustering but no linear autocorrelation must light up Q(r^2) while
    Q(r) stays small — the exact separation the ARCH diagnostic exists
    for. Built on the shared _ljung_box_q5 helper the certified queries
    use."""
    import random

    from polygon_algotrading_env_spark.queries.timeseries import (
        _ljung_box_q5,
    )

    rnd = random.Random(17)
    rs = []
    for block in range(40):               # 40 blocks of 25 bars
        sigma = 0.02 if block % 2 == 0 else 0.35   # clustered volatility
        for _ in range(25):
            rs.append(rnd.gauss(0, sigma))  # signs i.i.d. -> no linear AC
    rows = [("g", i, v) for i, v in enumerate(rs)]
    plain = spark.createDataFrame(
        rows, "event_type string, bucket_start int, r double"
    )
    squared = plain.select(
        "event_type", "bucket_start", (F.col("r") * F.col("r")).alias("r")
    )
    q_plain = _ljung_box_q5(plain, "q").collect()[0]["q"]
    q_sq = _ljung_box_q5(squared, "q").collect()[0]["q"]
    # chi2(5) critical value at 1% is 15.09: squares reject hard,
    # plain returns don't come near
    assert q_sq > 100.0, q_sq
    assert q_plain < 15.0, q_plain


def test_documents_fixture_min_shingle_contract():
    """Fixture-contract pin for minhash_recall_report (queries/text.py):
    the shingle-index ground truth and the oracle's raw Jaccard test
    only agree when every document carries >=1 five-char shingle — an
    empty-vs-empty pair satisfies 10*|A∩B| >= 3*|A∪B| (0 >= 0) but can
    never appear in a posting-list join. Assert text length >= 5 at
    every committed SF so a fixture refresh that breaks the
    precondition fails here, not as a silent oracle mismatch."""
    import os

    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        (shortest,) = duckdb.sql(
            f"SELECT min(length(text)) FROM read_parquet('{path}')"
        ).fetchone()
        assert shortest >= 5, (sf, shortest)
