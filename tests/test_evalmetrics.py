"""Model-evaluation metric operators vs pure-Python references on crafted
fixtures — ties, degenerate groups, and zero-hit edge cases included."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.operators.evalmetrics import (
    auc_rank_sum,
    cohens_kappa,
    confusion_at_threshold,
    contingency_assoc,
    decile_lift,
    label_topk_eval,
    spearman_by_group,
)


# --- pure-Python references -----------------------------------------------
def ref_auc2(pairs):
    """2·U by literal pair enumeration: 2 per win, 1 per tie."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    num2 = 0
    for a in pos:
        for b in neg:
            if a > b:
                num2 += 2
            elif a == b:
                num2 += 1
    return num2, len(pos), len(neg)


def ref_avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def ref_spearman(xs, ys):
    rx, ry = ref_avg_ranks(xs), ref_avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return num / den


# --- AUC -------------------------------------------------------------------
def test_auc_matches_pair_enumeration_with_ties(spark):
    pairs = [
        (1.0, True), (1.0, False), (2.0, True), (0.5, False), (2.0, False),
        (3.0, True), (0.5, True), (1.5, False), (2.0, True), (0.25, False),
    ]
    df = spark.createDataFrame(
        [(s, "g", p) for s, p in pairs], "score double, g string, pos boolean"
    )
    row = auc_rank_sum(df, "score", F.col("pos"), keys=["g"]).collect()[0]
    num2, npos, nneg = ref_auc2(pairs)
    assert (row["auc_num2"], row["n_pos"], row["n_neg"]) == (num2, npos, nneg)
    assert row["auc"] == round(num2 / (2.0 * npos * nneg), 6)


def test_auc_perfect_and_inverted_separator(spark):
    rows = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    assert auc_rank_sum(df, "score", F.col("pos")).collect()[0]["auc"] == 1.0
    inv = auc_rank_sum(df, "score", ~F.col("pos")).collect()[0]
    assert inv["auc"] == 0.0


def test_auc_all_ties_is_half(spark):
    df = spark.createDataFrame(
        [(1.0, True), (1.0, False), (1.0, True), (1.0, False)],
        "score double, pos boolean",
    )
    assert auc_rank_sum(df, "score", F.col("pos")).collect()[0]["auc"] == 0.5


# --- retrieval eval --------------------------------------------------------
def test_label_topk_eval_hand_computed(spark):
    # corpus: 6 candidates on an axis; query 0 at origin with label 7.
    # cosine to [1,0]: ids 1..6 have vectors along +x with varying y.
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [1.0, 0.0], 7),    # cos=1.0   rel
        (2, [1.0, 0.1], 9),    # cos≈0.995 non-rel
        (3, [1.0, 0.3], 7),    # cos≈0.958 rel
        (4, [0.0, 1.0], 9),    # cos=0     non-rel
        (5, [1.0, 0.2], 9),    # cos≈0.981 non-rel
        (6, [-1.0, 0.0], 7),   # cos=-1    rel (ranked last)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = label_topk_eval(
        emb, [(0, [1.0, 0.0], 7)], k=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    # top-3 by cosine: 1 (rel), 2, 5 → hits=1, first hit at rank 1
    assert r["hits"] == 1
    assert r["p_at_k"] == round(1 / 3, 6)
    assert r["mrr"] == 1.0
    assert r["dcg"] == 1.0  # rel at rank 1, discount 1/log2(2)=1
    # standard NDCG: 3 corpus-relevant candidates (ids 1, 3, 6), so the
    # ideal ranking fills all k=3 slots — DCG 1.0 is penalized against
    # idcg_prefix(3)[min(3,3)-1], not graded 1.0 for packing one hit first
    assert r["total_rel"] == 3
    import math

    ideal = 1.0 + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert r["ndcg"] == round(1.0 / ideal, 6)


def test_label_topk_eval_zero_hits(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.0], 2),
        (2, [0.9, 0.1], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = label_topk_eval(emb, [(0, [1.0, 0.0], 1)], k=2).collect()[0]
    assert r["hits"] == 0 and r["ndcg"] == 0.0 and r["mrr"] == 0.0
    assert r["total_rel"] == 0  # no corpus candidate shares the label


# --- contingency -----------------------------------------------------------
def test_contingency_chi2_and_mi_reference(spark):
    data = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(data, "u string, v string")
    out = {
        (r["u"], r["v"]): r
        for r in contingency_assoc(df, "u", "v", with_mi=True).collect()
    }
    n = 80
    for (u, v), o, rr, cc in [
        (("a", "x"), 30, 40, 40),
        (("a", "y"), 10, 40, 40),
        (("b", "x"), 10, 40, 40),
        (("b", "y"), 30, 40, 40),
    ]:
        r = out[(u, v)]
        d = n * o - rr * cc
        assert (r["o"], r["r"], r["c"], r["n"], r["d"]) == (o, rr, cc, n, d)
        assert r["chi2_term"] == round(d * d / (n * rr * cc), 6)
        assert r["mi_term"] == round(
            (o / n) * math.log2(n * o / (rr * cc)), 6
        )


def test_contingency_independent_columns_zero_d(spark):
    data = [(a, b) for a in "pq" for b in "st" for _ in range(5)]
    df = spark.createDataFrame(data, "u string, v string")
    for r in contingency_assoc(df, "u", "v").collect():
        assert r["d"] == 0 and r["chi2_term"] == 0.0


# --- decile lift -----------------------------------------------------------
def test_decile_lift_top_bucket_concentration(spark):
    # positives live in the top 10% of scores → bucket 10 has lift 10.
    rows = [(float(i), i >= 90) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = {r["bucket"]: r for r in decile_lift(df, "score", F.col("pos")).collect()}
    assert set(out) == set(range(1, 11))
    assert out[10]["n_pos"] == 10 and out[10]["capture"] == 1.0
    assert out[10]["lift"] == 10.0
    assert all(out[b]["n_pos"] == 0 for b in range(1, 10))
    assert sum(r["n"] for r in out.values()) == 100


# --- confusion -------------------------------------------------------------
def test_confusion_counts_and_f1(spark):
    # 6 rows, median 2.5: preds = score > 2.5 → {3,4,5} predicted pos
    rows = [
        (0.0, False), (1.0, False), (2.0, True),
        (3.0, True), (4.0, False), (5.0, True),
    ]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    r = confusion_at_threshold(df, "score", F.col("pos")).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 2)
    prec, rec = 2 / 3, 2 / 3
    assert r["precision"] == round(prec, 6)
    assert r["recall"] == round(rec, 6)
    assert r["f1"] == round(2 * prec * rec / (prec + rec), 6)
    assert r["accuracy"] == round(4 / 6, 6)


# --- kappa -----------------------------------------------------------------
def test_cohens_kappa_textbook(spark):
    # classic 2x2: n11=20, n10=5, n01=10, n00=15
    rows = (
        [(True, True)] * 20 + [(True, False)] * 5
        + [(False, True)] * 10 + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (20, 5, 10, 15)
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    assert r["po"] == round(po, 6)
    assert r["pe"] == round(pe, 6)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)


def test_cohens_kappa_perfect_agreement(spark):
    rows = [(True, True)] * 7 + [(False, False)] * 3
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    assert cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]["kappa"] == 1.0


# --- spearman --------------------------------------------------------------
def test_spearman_matches_reference_with_ties(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 6.0, 6.0]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    r = spearman_by_group(df, "x", "y", keys=["g"]).collect()[0]
    assert r["n"] == len(xs)
    # exact moment check: 2·avgrank integers
    rx = [int(2 * v) for v in ref_avg_ranks(xs)]
    ry = [int(2 * v) for v in ref_avg_ranks(ys)]
    assert r["sx"] == sum(rx) and r["sy"] == sum(ry)
    assert r["sxy"] == sum(a * b for a, b in zip(rx, ry))
    assert r["rho"] == round(ref_spearman(xs, ys), 6)


def test_spearman_monotone_and_reversed(spark):
    xs = list(range(10))
    rows = [("m", float(x), float(x * x)) for x in xs] + [
        ("r", float(x), float(-x)) for x in xs
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in spearman_by_group(df, "x", "y", keys=["g"]).collect()}
    assert out["m"]["rho"] == 1.0
    assert out["r"]["rho"] == -1.0


# --- fairness gaps ---------------------------------------------------------
def test_fairness_gaps_hand_computed(spark):
    from polygon_algotrading_env_spark.operators.evalmetrics import (
        fairness_gaps,
    )

    # threshold = exact median of 1..8 = 4.5 → pred := score > 4.5
    # seg A: scores 1,2,5,6 labels F,T,T,F → tp=1 fp=1 fn=1 tn=1
    # seg B: scores 3,4,7,8 labels F,F,T,T → tp=2 fp=0 fn=0 tn=2
    rows = [
        ("A", 1.0, False), ("A", 2.0, True), ("A", 5.0, True), ("A", 6.0, False),
        ("B", 3.0, False), ("B", 4.0, False), ("B", 7.0, True), ("B", 8.0, True),
    ]
    df = spark.createDataFrame(rows, "seg string, score double, y boolean")
    out = {
        r["seg"]: r
        for r in fairness_gaps(df, "score", F.col("y"), "seg").collect()
    }
    a, b = out["A"], out["B"]
    assert (a["tp"], a["fp"], a["fn"], a["tn"]) == (1, 1, 1, 1)
    assert (b["tp"], b["fp"], b["fn"], b["tn"]) == (2, 0, 0, 2)
    assert a["ppr"] == 0.5 and b["ppr"] == 0.5
    # overall ppr = 4/8 → zero demographic-parity gaps
    assert a["dp_gap"] == 0.0 and b["dp_gap"] == 0.0
    assert a["tpr"] == 0.5 and b["tpr"] == 1.0
    assert a["fpr"] == 0.5 and b["fpr"] == 0.0
    # overall tpr = 3/4, fpr = 1/4
    assert a["tpr_gap"] == round(0.5 - 0.75, 6)
    assert b["tpr_gap"] == round(1.0 - 0.75, 6)
    assert a["fpr_gap"] == round(0.5 - 0.25, 6)
    assert b["fpr_gap"] == round(0.0 - 0.25, 6)


def test_fairness_gaps_single_segment_zero_gaps(spark):
    from polygon_algotrading_env_spark.operators.evalmetrics import (
        fairness_gaps,
    )

    rows = [("s", float(i), i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "seg string, score double, y boolean")
    r = fairness_gaps(df, "score", F.col("y"), "seg").collect()[0]
    assert r["dp_gap"] == 0.0 and r["tpr_gap"] == 0.0 and r["fpr_gap"] == 0.0
