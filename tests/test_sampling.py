"""Deterministic curation ops — operators/sampling.py, cluster_survivors."""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.sampling import (
    hash_split,
    pack_by_token_budget,
    per_group_downsample,
)


def test_hash_split_stable_and_roughly_80_10_10(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    out = hash_split(df, "k")
    frac = {
        r["split"]: r["n"] / 5000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert 0.77 < frac["train"] < 0.83
    assert 0.07 < frac["val"] < 0.13
    assert 0.07 < frac["test"] < 0.13
    # same assignment on re-evaluation and independent of cohort membership
    again = {r.k: r.split for r in hash_split(df, "k").collect()}
    subset = spark.range(100).withColumnRenamed("id", "k")
    sub = {r.k: r.split for r in hash_split(subset, "k").collect()}
    assert all(again[k] == v for k, v in sub.items())


def test_per_group_downsample_caps_each_group(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = per_group_downsample(df, ["g"], "k", 40)
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 40, "b": 40}
    # deterministic selection
    assert sorted(r.k for r in out.collect()) == sorted(
        r.k for r in per_group_downsample(df, ["g"], "k", 40).collect()
    )


def test_pack_by_token_budget_matches_prefix_rule(spark):
    rows = [(i, "g", 100 + (i * 37) % 900) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, g string, toks long")
    out = pack_by_token_budget(df, "toks", 1000, group_cols=["g"], order_col="doc_id")
    got = {r.doc_id: r.context_window for r in out.collect()}
    cum = 0
    for i, _, t in rows:  # rows already in doc_id order
        assert got[i] == cum // 1000
        cum += t
    # windows are contiguous starting at 0
    wins = sorted(set(got.values()))
    assert wins == list(range(len(wins)))


def test_cluster_survivors_picks_longest_then_lowest_id(spark):
    from polygon_algotrading_env_spark.operators.graph import cluster_survivors

    docs = spark.createDataFrame(
        [(0, "aa"), (1, "aaaa"), (2, "aaaa"), (3, "zz")],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "id long, component long"
    )
    out = {
        r.cluster: (r.survivor_doc_id, r.n_members)
        for r in cluster_survivors(
            docs.withColumn("q", F.length("text")), labels, quality_col="q"
        ).collect()
    }
    assert out == {0: (1, 3), 3: (3, 1)}


def test_column_profile_exact_and_approx(spark):
    from polygon_algotrading_env_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else f"v{i % 7}") for i in range(100)],
        "k long, v string",
    )
    prof = {r.col_name: r for r in column_profile(df, ["k", "v"]).collect()}
    assert prof["k"].n_rows == 100 and prof["k"].n_nonnull == 100
    assert prof["k"].n_distinct == 100
    assert prof["v"].n_nonnull == 80 and prof["v"].n_distinct == 7
    approx = {r.col_name: r for r in column_profile(df, ["v"], exact=False).collect()}
    assert abs(approx["v"].n_distinct - 7) <= 1


def test_quality_cap_keeps_best(spark):
    from polygon_algotrading_env_spark.operators.sampling import (
        quality_cap_per_group,
    )

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id int, q double",
    )
    out = quality_cap_per_group(df, ["g"], "q", cap=2, tie_col="id")
    got = {(r["g"], r["id"]) for r in out.collect()}
    assert got == {("a", 2), ("a", 3), ("b", 4)}  # a keeps its top-2 by q


def test_curriculum_buckets_monotone_and_balanced(spark):
    from polygon_algotrading_env_spark.operators.sampling import (
        curriculum_buckets,
    )

    df = spark.createDataFrame(
        [("g", i, i * 10) for i in range(12)], "g string, id int, size int"
    )
    out = curriculum_buckets(df, ["size", "id"], n_stages=4, group_cols=["g"])
    rows = sorted((r["size"], r["stage"]) for r in out.collect())
    stages = [s for _, s in rows]
    assert stages == sorted(stages)  # stage is monotone in the order col
    from collections import Counter

    assert set(Counter(stages).values()) == {3}  # 12 rows -> 4 equal stages


def test_weighted_sample_favors_heavy_weights_and_is_deterministic(spark):
    import pyspark.sql.functions as F
    import pytest

    from polygon_algotrading_env_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    # 200 light rows (w=1) + 10 heavy rows (w=1000): heavy rows should
    # dominate a k=10 sample by the ES guarantee.
    rows = [(i, "g", 1.0) for i in range(200)] + [
        (1000 + i, "g", 1000.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    got = weighted_sample_per_group(
        df, "w", k=10, group_cols=("grp",), key_col="doc_id"
    )
    ids = sorted(r["doc_id"] for r in got.collect())
    assert len(ids) == 10
    assert sum(1 for i in ids if i >= 1000) >= 8  # heavies dominate
    # deterministic: identical on rerun and under repartitioning
    again = weighted_sample_per_group(
        df.repartition(13), "w", k=10, group_cols=("grp",), key_col="doc_id"
    )
    assert sorted(r["doc_id"] for r in again.collect()) == ids

    bad = spark.createDataFrame([(1, "g", 0.0)], "doc_id long, grp string, w double")
    with pytest.raises(Exception):
        weighted_sample_per_group(bad, "w", k=1, key_col="doc_id").collect()


def test_mixture_resample_quotas_and_determinism(spark):
    from polygon_algotrading_env_spark.operators.sampling import (
        mixture_resample,
    )

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(50)]
        + [(2000 + i, "c") for i in range(30)]
        + [(9000 + i, "junk") for i in range(7)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    # targets: a 50%, b 20%, c 30% → c binds (30/0.3=100); quotas 50/20/30
    out = mixture_resample(
        df, "grp", {"a": 0.5, "b": 0.2, "c": 0.3}, key_col="doc_id"
    )
    got = {r["grp"]: r["cnt"] for r in
           out.groupBy("grp").agg(__import__("pyspark").sql.functions.count(
               "*").alias("cnt")).collect()}
    assert got == {"a": 50, "b": 20, "c": 30}  # unweighted 'junk' dropped
    # deterministic under physical layout
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_resample(
            df.repartition(7), "grp", {"a": 0.5, "b": 0.2, "c": 0.3}
        ).collect()
    )
    assert ids1 == ids2


def test_mixture_resample_validates_weights(spark):
    import pytest as _pytest
    from polygon_algotrading_env_spark.operators.sampling import (
        mixture_resample,
    )

    df = spark.createDataFrame([(1, "a")], ["doc_id", "grp"])
    with _pytest.raises(ValueError):
        mixture_resample(df, "grp", {})
    with _pytest.raises(ValueError):
        mixture_resample(df, "grp", {"a": 0.0})


def test_mixture_resample_missing_weight_group_raises(spark):
    """A declared target group with ZERO rows would drive c = min(n/w) to 0
    and silently break the realized mixture; the operator must refuse
    loudly instead (r4 ADVICE)."""
    import pytest as _pytest
    from polygon_algotrading_env_spark.operators.sampling import (
        mixture_resample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(20)], ["doc_id", "grp"]
    )
    with _pytest.raises(ValueError, match="absent from data.*de"):
        mixture_resample(df, "grp", {"en": 0.5, "fr": 0.3, "de": 0.2})
